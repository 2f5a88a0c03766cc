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

  test("streaming funnel equals the batch rollup; late anchors handled across batches") {
    import graft.streaming.FunnelStream
    import spark.implicits._
    // corpus twin: streamed per-user reach rolls up to the batch rows
    val steps = Seq("view", "click", "purchase")
    val streamed = FunnelStream.runToCompletion(spark, sf).cache()
    val got = FunnelStream.rollup(streamed, steps)
      .collect().map(_.toSeq).toSeq
    val want = Analytics.funnel(spark, sf).collect().map(_.toSeq).toSeq
    assert(got == want, s"streamed rollup $got vs batch $want")
    streamed.unpersist()
    // cross-batch DISORDER: the anchor-moving case — file 2 delivers an
    // EARLIER step-1 event than file 1's, which must retroactively lower
    // u1's reach (the new anchor's window excludes the old chain) and the
    // latest-epoch collapse must drop the stale higher-reach emission
    def ev(id: Long, u: Long, t: String, sec: Long) =
      (id, new java.sql.Timestamp(sec * 1000L), u, t, 1.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_ooo").toString
    val batches = Seq(
      Seq(ev(1, 1, "view", 100000), ev(2, 1, "click", 100010), ev(3, 1, "purchase", 100020)),
      Seq(ev(4, 1, "view", 10))) // new anchor far in the past: its window excludes the chain
    for ((rows, i) <- batches.zipWithIndex) {
      // the repo's multi-file stream layout: part files land FLAT in the
      // watched dir with deterministic mtimes (a nested x.parquet dir is
      // invisible to the file stream source)
      val stage = s"$dir/stage_$i"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/in", f"part$i%02d.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val out = FunnelStream.runToCompletion(spark, s"$dir/in",
      windowSec = 3600L, maxFilesPerTrigger = Some(1), glob = None,
      queryName = "funnel_stream_ooo").collect()
    assert(out.length == 1)
    assert(out.head.getInt(1) == 1,
      s"late earlier anchor must lower reach to 1: ${out.toSeq}")
    assert(out.head.getLong(2) == 10L * 1000000L, "anchor must move to the earlier view")
  }

  test("retention: cohorts by first week, offsets count distinct survivors") {
    import spark.implicits._
    val wk = 604800L // epoch-week seconds
    // u1 cohort week 0, active weeks 0/1/3 (twice in week 1 — distinct!)
    // u2 cohort week 0, week 0 only; u3 cohort week 1, weeks 1 and 2
    val rows = Seq(
      (1L, 0L), (1L, wk + 5), (1L, wk + 6), (1L, 3 * wk + 5),
      (2L, 10L),
      (3L, wk + 20), (3L, 2 * wk + 20))
    val dir = java.nio.file.Files.createTempDirectory("graft_retention").toString
    rows.toDF("user_id", "sec")
      .select(monotonically_increasing_id().as("event_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"),
        col("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.parquet(dir + "/events.parquet")
    val out = Analytics.retention(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)), out.mkString(", "))
    // corpus invariants: offsets non-negative; by definition every cohort
    // member is active in their first week, so the offset-0 cell is the
    // cohort size and no later offset can exceed it
    val corpus = Analytics.retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(corpus.forall(_._2 >= 0))
    for ((cw, cells) <- corpus.groupBy(_._1)) {
      val base = cells.find(_._2 == 0L)
      assert(base.isDefined, s"cohort $cw missing its offset-0 cell")
      assert(cells.forall(_._3 <= base.get._3),
        s"cohort $cw has an offset cell above its size")
    }
  }

  test("streaming retention equals the batch rollup; late earlier weeks re-base cohorts") {
    import graft.streaming.RetentionStream
    import spark.implicits._
    // corpus twin: streamed per-user week sets roll up to the batch rows
    val streamed = RetentionStream.runToCompletion(spark, sf).cache()
    val got = RetentionStream.rollup(streamed).collect().map(_.toSeq).toSeq
    val want = Analytics.retention(spark, sf).collect().map(_.toSeq).toSeq
    assert(got == want, s"streamed rollup differs from batch retention")
    streamed.unpersist()
    // cross-batch DISORDER: file 2 delivers an event from an EARLIER week
    // than anything in file 1 — the user's cohort must move back and every
    // offset re-base (batch gets this for free; the stream must re-derive)
    val wk = 604800L
    def ev(id: Long, u: Long, sec: Long) =
      (id, new java.sql.Timestamp(sec * 1000L), u, "view", 1.0, "{}")
    val dir = java.nio.file.Files.createTempDirectory("graft_ret_ooo").toString
    val batches = Seq(
      Seq(ev(1, 1, 5 * wk + 10), ev(2, 1, 6 * wk + 10)), // cohort looks like week 5
      Seq(ev(3, 1, 2 * wk + 10)))                        // late: true cohort is week 2
    for ((rows, i) <- batches.zipWithIndex) {
      val stage = s"$dir/stage_$i"
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/in", f"part$i%02d.parquet")
      dst.getParentFile.mkdirs()
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(1000000L * (i + 1))
    }
    val out = RetentionStream.runToCompletion(spark, s"$dir/in",
      maxFilesPerTrigger = Some(1), glob = None,
      queryName = "retention_stream_ooo")
    val cells = RetentionStream.rollup(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(cells == Seq((2L, 0L, 1L), (2L, 3L, 1L), (2L, 4L, 1L)),
      s"late earlier week must re-base the cohort: $cells")
  }

  test("funnel: strict order + anchored window enforced; corpus counts monotone") {
    import spark.implicits._
    // handcrafted users — ts in seconds for readability:
    //  u1: view@0  click@10 purchase@20   → completes all 3
    //  u2: click@0 view@10  purchase@5    → purchase BEFORE its click-after-
    //     view: click@? — u2's first view is 10, no click after 10 → stops at view
    //  u3: view@0  click@50000 …          → click outside the 1000 s window
    //  u4: purchase@0 click@1 view@2      → reversed order: view only
    //  u5: no view at all                 → never enters the funnel
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 10L), (1L, "purchase", 20L),
      (2L, "click", 0L), (2L, "view", 10L), (2L, "purchase", 5L),
      (3L, "view", 0L), (3L, "click", 50000L),
      (4L, "purchase", 0L), (4L, "click", 1L), (4L, "view", 2L),
      (5L, "signup", 0L), (5L, "error", 1L))
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel").toString
    rows.toDF("user_id", "event_type", "sec")
      .select(monotonically_increasing_id().as("event_id"),
        timestamp_micros(col("sec") * 1000000L).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.parquet(dir + "/events.parquet")
    val out = Analytics.funnel(spark, dir, windowSec = 1000L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // views: u1,u2,u3,u4 = 4; click-after-view in window: u1 only (u2 has
    // none after its view, u3 outside window, u4 ordered wrong); purchase
    // after that click: u1
    assert(out.toSeq == Seq(
      (1L, "view", 4L, 1.0), (2L, "click", 1L, 0.25), (3L, "purchase", 1L, 0.25)),
      out.mkString(", "))
    // corpus run: counts monotone non-increasing, conversions in [0,1]
    val corpus = Analytics.funnel(spark, sf).collect()
    val counts = corpus.map(_.getLong(2))
    assert(counts.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)), counts.toSeq)
    assert(corpus.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0001))
    assert(corpus.head.getDouble(3) == 1.0)
  }
}
