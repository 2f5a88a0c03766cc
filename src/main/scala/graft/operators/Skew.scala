package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew toolkit (SURVEY §4): salting for hot join keys.
  *
  * When one join key holds a disproportionate share of rows (a viral doc, a
  * null-ish default user), the hash shuffle puts the whole key on one
  * reducer. Salting splits the hot side into `salt` sub-keys
  * (deterministically, from a hash of the full row — no rand(), so plans
  * stay reproducible) and replicates the small side across all sub-keys:
  * the hot key's rows now spread over `salt` reducers.
  *
  * Complements AQE's skew-join (which splits oversized partitions at
  * runtime); explicit salting is for when the skew is in a single key, which
  * partition-splitting alone can't fix for aggregations.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `keys`, spreading each of big's keys over
    * `salt` sub-partitions. `small` is replicated `salt`× (keep it the
    * dimension side).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String], salt: Int): DataFrame = {
    require(salt > 0)
    // the row hash alone would put IDENTICAL rows of a hot key into one
    // sub-key (the duplicate-heavy case salting exists for); mixing in the
    // per-row id spreads exact duplicates too. Salt only affects placement,
    // never results, so the nondeterministic id is safe here.
    val b = big.withColumn("__salt",
      pmod(hash((big.columns.map(col) :+ monotonically_increasing_id()): _*), lit(salt)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase skew-safe aggregation: partial-aggregate on (keys, salt),
    * then final-aggregate on keys. For algebraic aggregates (sum/count) this
    * is exactly what map-side combine does; the explicit form exists for
    * cases where the partial state must be bounded per reducer.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     salt: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salt)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"), sum(col("__pcnt")).as("n_rows"))
  }
}
