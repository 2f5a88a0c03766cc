package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational analytics over the star schema — the bench headliners (SURVEY
  * §2 E). These exercise the engine's aggregate/join/window paths the way a
  * 100 TB training-data pipeline would (fact-table scans with partial
  * aggregation, broadcast dimensions, bounded windows).
  */
object Analytics {

  /** E1: TPC-H Q1-style pricing summary. Single scan, hash aggregate with
    * map-side partials; group key cardinality ~6 so the shuffle is trivial at
    * any scale. Money sums rounded to 2dp for oracle parity.
    */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")) + lit(1e-9), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")) + lit(1e-9), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) + lit(1e-9), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")) + lit(1e-9), 4).as("avg_qty"),
        round(avg(col("l_discount")) + lit(1e-9), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** E2: revenue top-10 — customer⋈orders⋈lineitem. NO forced broadcast on
    * `customer`: it scales linearly with the corpus (billions of rows at
    * 100 TB), so pinning a broadcast hint is a driver OOM at scale — AQE
    * converts the join to broadcast at runtime when the filtered segment
    * side is actually small, and keeps the shuffle join when it isn't.
    * orders⋈lineitem shuffles on the order key, which is also the aggregate
    * key, so AQE reuses the exchange. Top-10 runs as TakeOrderedAndProject
    * (per-partition partial top-k, single k-row merge), never a global sort.
    */
  def q3Revenue(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sfDir)
    val l = Tables.lineitem(spark, sfDir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))) + lit(1e-9), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** E3: top-3 parts per brand by retail price — bounded window (rank within
    * small per-brand groups). Window partition key = brand, so the shuffle is
    * by brand; ties broken by p_partkey for determinism.
    */
  def windowTopN(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey").asc)
    Tables.part(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("p_brand"), col("rn").cast("long").as("rn"), col("p_partkey"),
        round(col("p_retailprice") + lit(1e-9), 2).as("p_retailprice"))
      .orderBy("p_brand", "rn")
  }

  /** E4 (batch twin of the streaming job): 5-minute tumbling window per
    * event_type. Uses the same window semantics as Structured Streaming's
    * `window()`; at scale the (window, type) key is low-cardinality so
    * partial aggregation collapses almost everything map-side.
    */
  def eventsWindow(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")) + lit(1e-9), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")
  }

  /** E7: as-of join — for each `purchase` event, the most recent strictly
    * prior `click` by the same user. Composed from built-ins (the preferred
    * route per SURVEY §3): union the tagged streams, one window pass per
    * user ordered by (ts, event_id) carrying the last click forward — a
    * single shuffle on user_id, no custom SparkPlan needed. At scale this is
    * the standard sort-merge as-of shape: both sides co-partitioned by the
    * entity key, time-sorted within partitions.
    */
  def asofJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("last_click_id",
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_click_id"), col("last_click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
      .orderBy("purchase_id")
  }

  /** E8: exact order-statistics summary — median/p90 (linear interpolation,
    * matching DuckDB's quantile_cont) and exact distinct suppliers per
    * return flag. At 100 TB the exact percentile would switch to
    * approx_percentile (t-digest) — kept exact here for oracle parity, with
    * the approximate twin in scaladoc.
    */
  def orderStats(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)") + lit(1e-9), 4).as("median_price"),
        round(expr("percentile(l_extendedprice, 0.9)") + lit(1e-9), 4).as("p90_price"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** E10: sketch-based statistics — HyperLogLog++ distinct counts and
    * t-digest percentiles. These are the operators that actually run at
    * 100 TB where E8's exact forms don't fit; bounded-memory, mergeable
    * partial state. No SQL oracle (sketch implementations differ across
    * engines) — the driver's rows-check plus E8 spec-level agreement bounds
    * cover it (see AnalyticsSpec).
    */
  def approxStats(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_suppkey")).as("approx_suppliers"),
        round(element_at(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)), 1), 4).as("approx_median"),
        round(element_at(percentile_approx(col("l_extendedprice"),
          array(lit(0.5), lit(0.9)), lit(10000)), 2), 4).as("approx_p90"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** E9: semi-structured extraction — parse the JSON `props` column
    * (`get_json_object`, codegen'd Jackson path) and aggregate by the
    * extracted key modulo 10. At scale this is the schema-on-read pattern:
    * the JSON stays a string until the projection that needs it.
    */
  def jsonExtract(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("value"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy((col("k") % 10).as("k_mod"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")) + lit(1e-9), 2).as("sum_value"))
      .orderBy("k_mod", "event_type")
  }

  /** E11: interval (range) join — for each purchase, how many other events
    * fell within ±5 minutes. A naive range join is a broadcast-nested-loop
    * (O(n·m) compares); instead both sides are bucketed by
    * floor(ts / width) and the probe side expands to its 3 adjacent buckets,
    * so the range predicate becomes an equi-join on the bucket id plus a
    * residual filter — the shuffle key is explicit and candidates are
    * bounded by bucket occupancy. This is the standard scale shape for
    * time-window joins (same trick Flink interval joins / Spark streaming
    * stream-stream joins use internally).
    */
  def rangeJoin(spark: SparkSession, sfDir: String,
                widthUs: Long = 300000000L): DataFrame = {
    val e = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
    // integer `div`, not `/`: long / long is DOUBLE division in Spark, and a
    // 1-ulp misfloor at a bucket boundary could shift a candidate two buckets
    // from its probe — `div` keeps the bucket id exact
    val bucketOf = expr(s"us div $widthUs")
    val others = e.select(col("event_id").as("other_id"), col("us").as("other_us"),
      col("value").as("other_value"), bucketOf.as("bucket"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("us").as("p_us"),
        explode(array((-1 to 1).map(d => bucketOf + d): _*)).as("bucket"))
    val near = purchases.join(others, Seq("bucket"))
      .filter(abs(col("other_us") - col("p_us")) <= widthUs &&
        col("other_id") =!= col("purchase_id"))
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_nearby"),
        round(sum(col("other_value")) + lit(1e-9), 2).as("sum_nearby_value"))
    // keep zero-neighbor purchases: left join back onto the purchase set
    e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"))
      .join(near, Seq("purchase_id"), "left_outer")
      .select(col("purchase_id"),
        coalesce(col("n_nearby"), lit(0L)).as("n_nearby"),
        coalesce(col("sum_nearby_value"), lit(0.0)).as("sum_nearby_value"))
      .orderBy("purchase_id")
  }

  /** E12: skew-safe aggregation as a first-class query — `event_type` has
    * only 5 values (a textbook hot-key distribution: at 100 TB each key is
    * ~20 TB on one reducer if aggregated naively without combine). The
    * salted two-phase form (Skew.saltedSumCount) spreads each key over 8
    * sub-keys before the final 5-row merge; the oracle is the plain GROUP
    * BY, proving the decomposition is value-identical.
    */
  def skewAgg(spark: SparkSession, sfDir: String, salt: Int = 8): DataFrame = {
    val e = Tables.events(spark, sfDir).select(col("event_type"), col("value"))
    Skew.saltedSumCount(e, Seq("event_type"), "value", salt)
      .select(col("event_type"),
        round(col("sum_value") + lit(1e-9), 2).as("sum_value"), col("n_rows"))
      .orderBy("event_type")
  }

  /** E13: rollup — the multi-level aggregate (detail, per-flag subtotal,
    * grand total) in ONE pass: Spark expands grouping sets inside the
    * aggregate, so the fact table is scanned once with map-side partials,
    * not once per level. Subtotal rows label their collapsed key 'ALL'.
    */
  def rollupPricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")) + lit(1e-9), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** E15: GROUPING SETS (r12) — the asymmetric multi-granularity
    * aggregate neither rollup nor cube can express: (flag,status),
    * (status alone), and the grand total in ONE pass. Spark plans a
    * single Expand + aggregate — each input row fans to its grouping
    * combinations map-side, no re-scan per granularity, which is the
    * property that matters when the input is 100 TB and three report
    * granularities would otherwise mean three scans.
    */
  def groupingSetsPricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")) + lit(1e-9), 2).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
        col("n_rows"), col("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** E14: pivot — event counts per user bucket with event types as columns
    * (the wide-format export BI layers ask for). The pivot values are
    * declared, so Spark plans a single aggregate with one conditional
    * branch per value — no second pass to discover the domain.
    */
  def pivotEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = Tables.events(spark, sfDir)
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    p.select(col("user_bucket") +:
        types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
      .orderBy("user_bucket")
  }

  /** E5: gaps-and-islands sessionization — a new session starts when a user
    * is idle > 30 minutes. Two bounded windows over the same (user, ts)
    * partitioning (single shuffle, reused by both window specs).
    */
  def eventsSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")) + lit(1e-9), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** E16 (r13): FUNNEL analysis — per-user ordered step completion within
    * a window anchored at the user's FIRST step-1 event (the product-
    * analytics staple: view → click → purchase in 24 h, strictly ordered
    * timestamps). One row per step: users reaching it and conversion from
    * step 1.
    *
    * Scale shape: each step is one filtered scan aggregated per user
    * (map-side combine — state is one timestamp per QUALIFYING user per
    * step, never per event) left-joined back on user_id; every join and
    * aggregate shares the user_id hash partitioning, so the chain costs
    * k filtered scans + one reused exchange, not k shuffles of the event
    * stream. The final unpivot runs over a ONE-row aggregate. Fully
    * SQL-expressible → hash oracle.
    */
  def funnel(spark: SparkSession, sfDir: String,
             steps: Seq[String] = Seq("view", "click", "purchase"),
             windowSec: Long = 86400L): DataFrame = {
    require(steps.nonEmpty, "funnel: at least one step")
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    var cur = e.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    for (k <- 2 to steps.length) {
      val stepK = e.filter(col("event_type") === steps(k - 1))
        .join(cur.select(col("user_id"), col(s"t${k - 1}"), col("t1")), "user_id")
        .filter(unix_micros(col("ts")) > unix_micros(col(s"t${k - 1}")) &&
          unix_micros(col("ts")) <= unix_micros(col("t1")) + windowSec * 1000000L)
        .groupBy("user_id").agg(min(col("ts")).as(s"t$k"))
      cur = cur.join(stepK, Seq("user_id"), "left")
    }
    val cs = steps.indices.map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}"))
    val agg = cur.agg(cs.head, cs.tail: _*)
    agg.select(explode(array(steps.indices.map { i =>
        struct(lit((i + 1).toLong).as("step"),
          lit(steps(i)).as("step_name"),
          col(s"c${i + 1}").as("n_users"))
      }: _*)).as("s"), col("c1"))
      .select(col("s.step").as("step"), col("s.step_name").as("step_name"),
        col("s.n_users").as("n_users"),
        when(col("c1") > 0,
          round(col("s.n_users").cast("double") / col("c1") + lit(1e-9), 4))
          .otherwise(lit(0.0)).as("conversion"))
      .orderBy("step")
  }

  /** E17: cohort RETENTION — the classic growth-analytics companion to
    * funnel (E16) and sessionization (E5): users cohort by their
    * FIRST-activity week, and each (cohort, week-offset) cell counts the
    * distinct cohort members still active that many weeks later. Week
    * buckets are epoch-week numbers (`floor(epoch_µs / week_µs)`) — no
    * calendar week-start semantics to disagree on across engines, the
    * same portability rule every time-bucketed oracle here follows.
    *
    * Scale shape: the cohort table is ONE `groupBy(user_id).min` (the
    * only corpus-wide shuffle); the events→cohort join reuses the same
    * user_id hash partitioning so it co-locates rather than reshuffling;
    * the final aggregate's key (cohort_week, week_offset) is
    * low-cardinality with map-side partials. Fully SQL-expressible →
    * hash oracle.
    */
  def retention(spark: SparkSession, sfDir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"),
        floor(unix_micros(col("ts")) / weekUs).as("week"))
    val cohort = e.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
    e.join(cohort, "user_id")
      .groupBy(col("cohort_week"),
        (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }
}
