package graft

/** The bench-history protocol, single-sourced: one definition of the
  * jsonl line format, the last-entry-for-key read, and the cross-round
  * drift predicate — shared by [[Bench]] (the per-round sf0.1 stats)
  * and [[FullScaleBench]] (the standing 10× cadence), so a schema or
  * threshold change can never desynchronize the two consumers of the
  * same file.
  *
  * Line format (exactly what [[append]] writes):
  * `{"sf":"<key>","medians":{"<query>":<sec>,…},"mins":{…}}`. Keys are
  * exact-match including the closing quote, so `sf0.1` can never read
  * `sf0.1x`'s entries.
  *
  * DRIFT COMPARES MINS, NOT MEDIANS (r14 lesson): host contention
  * inflates medians and rarely minima — a contended round once read as a
  * 1.21× "regression" on code untouched since the prior round. The min
  * of N reps is the engine's actual cost; medians still ride along for
  * spread context. Lines written before the mins field yield an empty
  * [[lastMinsFor]], muting drift for exactly one transition run rather
  * than comparing across mismatched statistics.
  */
object BenchHistory {

  def path: String = sys.env.getOrElse("SPARK_GRAFT_BENCH_HIST",
    "/root/repo/bench_history.jsonl")

  private val Pair = "\"([A-Za-z0-9_]+)\":([0-9.eE+-]+)".r

  private def lastLine(key: String, file: String): String = try {
    val f = new java.io.File(file)
    if (!f.exists()) ""
    else {
      val lines = scala.io.Source.fromFile(f)
      try lines.getLines()
        .filter(_.contains(s""""sf":"$key""""))
        .foldLeft("")((_, l) => l) finally lines.close()
    }
  } catch { case _: Throwable => "" }

  /** The named map object of one history line; empty when the field is
    * absent (old-format line) or the line is unreadable — history is
    * advisory and must never fail a bench run.
    */
  private def mapField(line: String, field: String): Map[String, Double] =
    ("\"" + field + "\":\\{([^}]*)\\}").r.findFirstMatchIn(line)
      .map(m => Pair.findAllMatchIn(m.group(1))
        .map(mm => mm.group(1) -> mm.group(2).toDouble).toMap)
      .getOrElse(Map.empty)

  /** The LAST appended medians map under `key`. */
  def lastFor(key: String, file: String = path): Map[String, Double] =
    mapField(lastLine(key, file), "medians")

  /** The LAST appended mins map under `key` — the drift baseline. Empty
    * for pre-mins-format entries (drift mutes for that one run).
    */
  def lastMinsFor(key: String, file: String = path): Map[String, Double] =
    mapField(lastLine(key, file), "mins")

  /** Cross-round drift: per-query moves >2× either way, above a 50 ms
    * floor so sub-noise blips don't spam. Ratios rounded to 2 dp.
    * Feed it MINS ([[lastMinsFor]] vs the run's min-of-reps).
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

  /** Append one run's medians + mins under `key`; write failures are
    * swallowed (same advisory contract as the reads).
    */
  def append(key: String, medians: Seq[(String, Double)],
             mins: Seq[(String, Double)], file: String = path): Unit = try {
    def obj(xs: Seq[(String, Double)]) =
      xs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val w = new java.io.FileWriter(file, true)
    try w.write(s"""{"sf":"$key","medians":${obj(medians)},"mins":${obj(mins)}}""" + "\n")
    finally w.close()
  } catch { case _: Throwable => () }
}
