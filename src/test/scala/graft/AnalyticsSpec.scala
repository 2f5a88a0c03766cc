package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpecBase {

  test("q1_pricing groups are complete and counts add up") {
    val q1 = Analytics.q1Pricing(spark, sf)
    val total = q1.agg(sum("count_order")).head().getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("q3_revenue returns descending revenue top-10") {
    val rows = Analytics.q3Revenue(spark, sf).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("window_topn keeps at most 3 per brand, rank 1 is the max price") {
    val df = Analytics.windowTopN(spark, sf).cache()
    assert(df.groupBy("p_brand").count().agg(max("count")).head().getLong(0) <= 3)
    val r1 = df.filter(col("rn") === 1).select("p_brand", "p_retailprice")
    val mx = Tables.part(spark, sf).groupBy("p_brand")
      .agg(round(max("p_retailprice"), 2).as("mx"))
    assert(r1.join(mx, "p_brand").filter(col("p_retailprice") =!= col("mx")).count() == 0)
    df.unpersist()
  }

  test("approx sketches land near the exact order statistics") {
    val exact = Analytics.orderStats(spark, sf).select("l_returnflag", "median_price", "n_suppliers")
    val approx = Analytics.approxStats(spark, sf).select("l_returnflag", "approx_median", "approx_suppliers")
    val joined = exact.join(approx, "l_returnflag")
    val badMedian = joined.filter(
      abs(col("approx_median") - col("median_price")) / col("median_price") > 0.05).count()
    val badDistinct = joined.filter(
      abs(col("approx_suppliers") - col("n_suppliers")).cast("double") / col("n_suppliers") > 0.1).count()
    assert(badMedian == 0 && badDistinct == 0)
  }

  test("rollup levels are self-consistent; pivot cells cover every event") {
    val r = Analytics.rollupPricing(spark, sf).cache()
    val total = Tables.lineitem(spark, sf).count()
    assert(r.filter(col("l_returnflag") === "ALL" && col("l_linestatus") === "ALL")
      .head().getAs[Long]("n_rows") == total)
    // per-flag subtotals sum to the grand total
    assert(r.filter(col("l_returnflag") =!= "ALL" && col("l_linestatus") === "ALL")
      .agg(sum("n_rows")).head().getLong(0) == total)
    r.unpersist()
    val p = Analytics.pivotEvents(spark, sf)
    val cells = p.select(
      (col("click") + col("error") + col("purchase") + col("signup") + col("view")).as("s"))
      .agg(sum("s")).head().getLong(0)
    assert(cells == Tables.events(spark, sf).count())
  }

  test("grouping sets: asymmetric granularities agree with separate aggregates, one Expand") {
    // plan receipt BEFORE caching (a cached relation's displayed plan
    // nests initial+final plans and double-counts nodes): one Expand,
    // one scan — three granularities never re-read the input
    val plan = Analytics.groupingSetsPricing(spark, sf)
      .queryExecution.executedPlan.toString
    assert("Expand".r.findAllIn(plan).length == 1, plan)
    assert("Scan".r.findAllIn(plan).length <= 2, plan) // table scan (+reuse)
    val g = Analytics.groupingSetsPricing(spark, sf).cache()
    val li = Tables.lineitem(spark, sf)
    // grand total row
    assert(g.filter(col("l_returnflag") === "ALL" && col("l_linestatus") === "ALL")
      .head().getAs[Long]("n_rows") == li.count())
    // the (status)-only granularity equals a direct aggregate — the set
    // rollup cannot express (it would also emit per-flag subtotals)
    val direct = li.groupBy("l_linestatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    g.filter(col("l_returnflag") === "ALL" && col("l_linestatus") =!= "ALL")
      .collect().foreach(r =>
        assert(r.getAs[Long]("n_rows") == direct(r.getString(1)), r.toString))
    // and NO per-flag subtotal rows exist (the asymmetry is real)
    assert(g.filter(col("l_returnflag") =!= "ALL" && col("l_linestatus") === "ALL")
      .count() == 0)
    g.unpersist()
  }

  test("events_window counts add up to the event count") {
    val n = Analytics.eventsWindow(spark, sf).agg(sum("n_events")).head().getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("sessionize: session bounds ordered, counts add up") {
    val s = Analytics.eventsSessionize(spark, sf).cache()
    assert(s.filter(col("session_start") > col("session_end")).count() == 0)
    val n = s.agg(sum("n_events")).head().getLong(0)
    assert(n == Tables.events(spark, sf).count())
    s.unpersist()
  }
}
