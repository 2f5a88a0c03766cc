package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-history protocol: format round-trip, key exact-match,
  * old-format tolerance, and the r14 contention receipt — a same-code
  * run under induced load (medians inflated, minima stable) produces
  * drift {} under the min-based comparison where the old median-based
  * one false-flagged a regression.
  */
class BenchHistorySpec extends AnyFunSuite {

  private def tmpFile(): String = {
    val f = java.io.File.createTempFile("bench_hist", ".jsonl")
    f.deleteOnExit(); f.getAbsolutePath
  }

  test("append/read round-trip: medians and mins come back per key") {
    val f = tmpFile()
    BenchHistory.append("sfA", Seq("q1" -> 1.5, "q2" -> 0.3),
      Seq("q1" -> 1.2, "q2" -> 0.25), f)
    BenchHistory.append("sfB", Seq("q1" -> 9.0), Seq("q1" -> 8.0), f)
    assert(BenchHistory.lastFor("sfA", f) == Map("q1" -> 1.5, "q2" -> 0.3))
    assert(BenchHistory.lastMinsFor("sfA", f) == Map("q1" -> 1.2, "q2" -> 0.25))
    assert(BenchHistory.lastMinsFor("sfB", f) == Map("q1" -> 8.0))
    // LAST entry wins
    BenchHistory.append("sfA", Seq("q1" -> 2.0), Seq("q1" -> 1.9), f)
    assert(BenchHistory.lastMinsFor("sfA", f) == Map("q1" -> 1.9))
  }

  test("key match is exact: sf0.1 never reads sf0.1x") {
    val f = tmpFile()
    BenchHistory.append("sf0.1x", Seq("q" -> 5.0), Seq("q" -> 5.0), f)
    assert(BenchHistory.lastMinsFor("sf0.1", f).isEmpty)
  }

  test("pre-mins-format lines mute drift for one run instead of mixing statistics") {
    val f = tmpFile()
    val w = new java.io.FileWriter(f, true)
    try w.write("""{"sf":"sfOld","medians":{"q1":1.0,"q2":2.0}}""" + "\n")
    finally w.close()
    assert(BenchHistory.lastFor("sfOld", f) == Map("q1" -> 1.0, "q2" -> 2.0))
    assert(BenchHistory.lastMinsFor("sfOld", f).isEmpty)
    assert(BenchHistory.driftVs(BenchHistory.lastMinsFor("sfOld", f),
      Map("q1" -> 10.0)).isEmpty)
  }

  test("contention receipt: min-based drift stays empty where median-based false-flags") {
    // round N (quiet host): reps of q = (1.0, 1.05, 1.1) -> min 1.0, med 1.05
    // round N+1 (contended, SAME code): reps = (1.02, 3.1, 3.4) -> min 1.02,
    // med 3.1 — the r14 shape: co-tenant load inflates most samples, but at
    // least one rep lands in a quiet window
    val quietMins = Map("q" -> 1.0, "r" -> 0.4)
    val quietMeds = Map("q" -> 1.05, "r" -> 0.42)
    val loadedMins = Map("q" -> 1.02, "r" -> 0.44)
    val loadedMeds = Map("q" -> 3.1, "r" -> 1.3)
    // the OLD comparison (medians) cries regression
    assert(BenchHistory.driftVs(quietMeds, loadedMeds).nonEmpty)
    // the min comparison sees the same code cost
    assert(BenchHistory.driftVs(quietMins, loadedMins).isEmpty)
    // and a REAL regression still fires on mins
    assert(BenchHistory.driftVs(quietMins, Map("q" -> 2.5, "r" -> 0.44)) ==
      Map("q" -> 2.5))
  }

  test("drift floor: sub-50ms queries never flag") {
    assert(BenchHistory.driftVs(Map("q" -> 0.01), Map("q" -> 0.04)).isEmpty)
  }
}
