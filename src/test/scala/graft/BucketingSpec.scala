package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** The co-located join pattern from SURVEY §4: bucket both fact tables on the
  * join key at write time → the join compiles without a shuffle exchange on
  * either side. At 100 TB this is the difference between re-shuffling the
  * fact table on every query and never shuffling it at all.
  */
class BucketingSpec extends SparkSpecBase {

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int = {
    df.count() // force AQE to finalize the plan
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case s: ShuffleExchangeExec => s }.size
  }

  test("bucketed tables join without a shuffle; unbucketed parquet shuffles") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    Tables.lineitem(spark, sf).write
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")

    val bucketed = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))

    // same answer...
    assert(bucketed.exceptAll(plain).count() == 0 && plain.exceptAll(bucketed).count() == 0)
    // ...but the bucketed join itself introduces no join-side shuffles:
    // only the final small aggregation exchange remains
    val bShuffles = shuffleCount(bucketed)
    val pShuffles = shuffleCount(plain)
    assert(bShuffles < pShuffles, s"bucketed=$bShuffles plain=$pShuffles")
    assert(bShuffles <= 1)
  }
}
