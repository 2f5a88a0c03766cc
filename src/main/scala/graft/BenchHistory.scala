package graft

/** The bench-history protocol, single-sourced: one definition of the
  * jsonl line format, the last-entry-for-key read, and the cross-round
  * drift predicate — shared by [[Bench]] (the per-round sf0.1 medians)
  * and [[FullScaleBench]] (the standing 10× cadence), so a schema or
  * threshold change can never desynchronize the two consumers of the
  * same file.
  *
  * Line format (exactly what [[append]] writes — the regex pair-scan in
  * [[lastFor]] is a full parse of it):
  * `{"sf":"<key>","medians":{"<query>":<sec>,…}}`. Keys are exact-match
  * including the closing quote, so `sf0.1` can never read `sf0.1x`'s
  * entries.
  */
object BenchHistory {

  def path: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_HIST",
    "/root/repo/bench_history.jsonl")

  private val Pair = "\"([A-Za-z0-9_]+)\":([0-9.eE+-]+)".r

  /** The LAST appended medians map under `key`; empty when absent or
    * unreadable (history is advisory — it must never fail a bench run).
    */
  def lastFor(key: String): Map[String, Double] = try {
    val f = new java.io.File(path)
    if (!f.exists()) Map.empty
    else {
      val lines = scala.io.Source.fromFile(f)
      val last = try lines.getLines()
        .filter(_.contains(s""""sf":"$key""""))
        .foldLeft("")((_, l) => l) finally lines.close()
      Pair.findAllMatchIn(last)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
  } catch { case _: Throwable => Map.empty }

  /** Cross-round drift: per-query moves >2× either way, above a 50 ms
    * floor so sub-noise blips don't spam. Ratios rounded to 2 dp.
    */
  def driftVs(prev: Map[String, Double],
              now: Map[String, Double]): Map[String, Double] =
    for {
      (name, n) <- now
      before <- prev.get(name)
      if math.max(n, before) > 0.05 && before > 0 &&
        (n / before > 2.0 || n / before < 0.5)
    } yield name -> BigDecimal(n / before)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Append one run's medians under `key`; write failures are swallowed
    * (same advisory contract as [[lastFor]]).
    */
  def append(key: String, medians: Seq[(String, Double)]): Unit = try {
    val med = medians.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val w = new java.io.FileWriter(path, true)
    try w.write(s"""{"sf":"$key","medians":$med}""" + "\n") finally w.close()
  } catch { case _: Throwable => () }
}
