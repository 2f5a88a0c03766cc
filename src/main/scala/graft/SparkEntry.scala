package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 has a `queries` entry; each
  * SQL-expressible one has a matching DuckDB `oracleSql` with identical
  * column names, value rounding, and row ordering.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A. reference-surface
    "chunk_docs" -> ((s, dir) => Chunker.chunkDocs(s, dir)),
    "index_build" -> ((s, dir) => Chunker.indexBuild(s, dir)),
    "index_status" -> ((s, dir) => Chunker.indexStatus(s, dir)),
    // E. analytics
    "q1_pricing" -> ((s, dir) => Analytics.q1Pricing(s, dir)),
    "q3_revenue" -> ((s, dir) => Analytics.q3Revenue(s, dir)),
    "q_window_topn" -> ((s, dir) => Analytics.windowTopN(s, dir)),
    "events_window" -> ((s, dir) => Analytics.eventsWindow(s, dir)),
    "events_sessionize" -> ((s, dir) => Analytics.eventsSessionize(s, dir)),
  )

  def oracleSql: Map[String, String] = Map(
    "chunk_docs" ->
      """SELECT doc_id, i AS chunk_idx,
        |       substring(text, CAST(i*80+1 AS INT), 100) AS chunk_text
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, CAST(floor((length(text)-1)/80.0) AS BIGINT)+1)) AS i
        |      FROM documents WHERE length(text) > 0) t
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "index_build" ->
      """SELECT doc_id, i AS chunk_idx,
        |       substring(text, CAST(i*80+1 AS INT), 100) AS chunk_text,
        |       n_chars AS file_size, token_count, lang
        |FROM (SELECT doc_id, text, lang, n_chars,
        |        CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS BIGINT) AS token_count,
        |        unnest(range(0, CAST(floor((length(text)-1)/80.0) AS BIGINT)+1)) AS i
        |      FROM documents WHERE length(text) > 0) t
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "index_status" ->
      """SELECT lang,
        |       count(*) AS files_discovered,
        |       CAST(sum(CAST(floor((length(text)-1)/80.0) AS BIGINT) + 1) AS BIGINT) AS chunks_total,
        |       CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity),2) AS sum_qty,
        |       round(sum(l_extendedprice),2) AS sum_base_price,
        |       round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
        |       round(avg(l_quantity),4) AS avg_qty,
        |       round(avg(l_discount),4) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_revenue" ->
      """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
        |       round(sum(l.l_extendedprice*(1-l.l_discount)),2) AS revenue
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY 1,2,3
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q_window_topn" ->
      """SELECT p_brand, rn, p_partkey, round(p_retailprice,2) AS p_retailprice FROM (
        |  SELECT p_brand, p_partkey, p_retailprice,
        |         row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
        |  FROM part) t
        |WHERE rn <= 3 ORDER BY p_brand, rn""".stripMargin,
    "events_window" ->
      """SELECT make_timestamp(CAST(floor(epoch_us(ts)/300000000)*300000000 AS BIGINT)) AS window_start,
        |       event_type, count(*) AS n_events, round(sum(value),2) AS sum_value
        |FROM events GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR epoch_us(ts)-epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_session FROM e),
        |t AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id FROM s)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, count(*) AS n_events,
        |       min(ts) AS session_start, max(ts) AS session_end, round(sum(value),2) AS sum_value
        |FROM t GROUP BY user_id, session_id ORDER BY user_id, session_id""".stripMargin,
  )
}
