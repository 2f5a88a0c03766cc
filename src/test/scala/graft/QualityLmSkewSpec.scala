package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Receipts for quality_lm's scale shape (SURVEY D6, ADVICE r11 item 5):
  * the scoring joins run over pre-aggregated (doc_id,w1,w2,c) triples —
  * never one row per bigram occurrence — and a Zipf-hot bigram key is
  * split by AQE's skew-join at runtime.
  */
class QualityLmSkewSpec extends SparkSpecBase {

  test("quality_lm pre-aggregates repetition map-side: weighted NLL equals occurrence-mean NLL") {
    import spark.implicits._
    // a pathologically repetitive doc: 500 copies of one bigram. Under the
    // old per-occurrence join it contributes 500 scoring rows; under the
    // pre-aggregated shape exactly 1 (plus the bridge bigram). Either way
    // the weighted mean must equal the occurrence mean computed by hand.
    val rep = ("tok " * 501).trim                      // 500× ("tok","tok")
    val docs = Seq((1L, rep), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityLmOver(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 500, "nb must count occurrences, not distinct triples")
    // hand NLL for doc 1: all 500 occurrences share one probability
    // P = (c12+k)/(c1+k·V) with c12=500, c1(tok)=501, V=4, k=0.5
    val expected = BigDecimal(-math.log((500 + 0.5) / (501 + 0.5 * 4)) + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out(1L).getDouble(2) - expected) < 1e-9,
      s"weighted NLL ${out(1L).getDouble(2)} != occurrence-mean $expected")
    assert(out(2L).getLong(1) == 2)
  }

  test("quality_lm scoring join input is the distinct-triple aggregate, not raw occurrences") {
    import spark.implicits._
    val docs = Seq((1L, "x y " * 200), (2L, "p q r s")).toDF("doc_id", "text")
    val plan = TextAnalysis.qualityLmOver(docs).queryExecution.optimizedPlan.toString
    // the scoring joins must sit ABOVE an aggregate keyed by
    // (doc_id, w1, w2): the per-doc count alias `c` only exists when the
    // pre-aggregation feeds the join
    assert(plan.contains("count(1) AS c#") || plan.contains(" AS c#"),
      s"expected the (doc_id,w1,w2)->c pre-aggregate in the plan:\n$plan")
  }

  test("AQE splits a hot stopword bigram key in the quality_lm scoring join (skew=true receipt)") {
    import spark.implicits._
    val keep = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.5")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      // a corpus-wide hot bigram: every doc opens with the same stopword
      // pair, then diverges into a per-doc cold tail — after
      // pre-aggregation the hot (w1,w2) key still holds one row PER DOC
      // (the hot-key strings are constant so they compress away in the
      // shuffle files; doc count and low thresholds stand in for the
      // incompressible width real corpora have), which is exactly the
      // residual skew AQE must split
      val hot = "thethethethethethethethethethethethethethethethe"
      val docs = spark.range(0, 50000).select(col("id").as("doc_id"),
        concat(lit(s"$hot $hot cold"), col("id").cast("string"),
          lit(" tail"), col("id").cast("string")).as("text"))
      val out = TextAnalysis.qualityLmOver(docs)
      val qe = out.queryExecution
      val n = qe.executedPlan.execute().count()
      assert(n == 50000, s"one scored row per doc, got $n")
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark a scoring join skew=true; plan:\n$plan")
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
