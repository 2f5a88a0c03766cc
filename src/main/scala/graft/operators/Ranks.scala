package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * `row_number() OVER (ORDER BY score DESC, id)` with no PARTITION BY moves
  * the whole input through one task — the classic scale cliff (WindowExec
  * even warns about it). But ranking over a ROUNDED score admits a
  * decomposition whose only global step is over the DISTINCT score values
  * (≤ 2·10⁴+1 of them at 4 decimal places, regardless of corpus size):
  *
  *   rank(x) = #rows with score strictly greater than x.score   (prefix sum
  *             over the per-score counts, tiny frame)
  *           + row_number among x's score peers ordered by id   (window
  *             PARTITIONED by score — distributed)
  *
  * Equal to the single-window formulation row for row, so DuckDB oracles
  * keep using plain `row_number() OVER (ORDER BY ...)`.
  *
  * Skew note: a hot score value (e.g. 0.0 for most of the corpus) funnels
  * its peer group through one task for the tiebreak window. If exact ranks
  * inside cold scores don't matter downstream, pre-filter; otherwise salt
  * the peer window per key range. The frames ranked here are score-bounded
  * candidate pools, so peer groups stay small.
  */
object Ranks {

  /** A constant-valued but NON-FOLDABLE partition key. `partitionBy(lit(0))`
    * gets constant-folded out of the window spec, silently reverting to the
    * unpartitioned (warning-emitting) form; `coalesce(anchor*0, 0)`
    * references a column so no rule folds it (x*0 is not 0 under null/NaN),
    * yet evaluates to 0 for every row. Use only on provably-small frames.
    */
  def onePartitionKey(anchor: Column): Column =
    // cast + nanvl: NaN*0 and Inf*0 are NaN, which coalesce would keep —
    // the key must be 0 for EVERY row or ranks silently split partitions
    coalesce(nanvl(anchor.cast("double") * lit(0.0), lit(0.0)), lit(0.0))

  /** Add `rankName` = global rank of each row under (score DESC, tie ASC),
    * computed without an unpartitioned window over `df`.
    * `score` must be discretized (rounded) — the distinct-score frame is
    * assumed broadcast-small. NULL scores rank last (Spark's default for
    * DESC ordering), matching the single-window formulation — the join is
    * null-safe so no row is dropped.
    */
  /** `materialize`: localCheckpoint `df` before ranking. The decomposition
    * reads `df` twice (per-score counts + the peer join) — if `df` is an
    * expensive scoring scan (tokenize/embed over full documents), that scan
    * runs twice unless the narrow `(tie..., score)` projection is
    * materialized first. The checkpoint is rows × ~16 bytes — at any corpus
    * size, far cheaper than a second scoring pass. LAZY (eager=false): no
    * job runs at construction time, the projection materializes inside the
    * first consuming action, and the pinned blocks are released by the
    * ContextCleaner when the frame is unreferenced. Caveat: lazy weakens the
    * guarantee — the two sibling stages that read the un-materialized RDD
    * (the per-score counts and the peer-tiebreak window) can be scheduled
    * concurrently within that first job and each transiently recompute the
    * projection before its blocks land in the block manager. Accepted
    * trade-off (no construction-time job vs a possible one-time double
    * scan); revert call sites to eager if a BENCH delta ever shows it.
    */
  def globalRankDesc(df: DataFrame, score: String, tie: Seq[String],
                     rankName: String, materialize: Boolean = false): DataFrame = {
    val in = if (materialize) df.localCheckpoint(false) else df
    globalRankDescOver(in, score, tie, rankName)
  }

  private def globalRankDescOver(df: DataFrame, score: String, tie: Seq[String],
                                 rankName: String): DataFrame = {
    val counts = df.groupBy(col(score).as("__score")).agg(count(lit(1)).as("__peer_n"))
    // constant partition key: this frame is provably small (distinct rounded
    // scores), single-partition is intended — not the corpus-wide cliff.
    // DESC default = NullsLast, same as the row_number formulation.
    val wScore = Window.partitionBy(onePartitionKey(col("__score"))).orderBy(col("__score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ahead = counts
      .withColumn("__ahead", coalesce(sum(col("__peer_n")).over(wScore), lit(0L)))
      .select(col("__score"), col("__ahead"))
    val wPeers = Window.partitionBy(col(score)).orderBy(tie.map(col(_).asc): _*)
    df.join(broadcast(ahead), col(score) <=> col("__score"))
      .withColumn(rankName, (col("__ahead") + row_number().over(wPeers)).cast("long"))
      // restore the input's column order (join fronts the key columns)
      .select((df.columns :+ rankName).map(col): _*)
  }
}
