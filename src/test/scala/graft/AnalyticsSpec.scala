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
