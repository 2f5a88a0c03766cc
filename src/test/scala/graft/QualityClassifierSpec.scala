package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The learned quality classifier (D8): held-out separation and accuracy
  * of the CCNet-style logistic filter distilling the D2 heuristic, plus
  * probability sanity and partition stability of the scores.
  */
class QualityClassifierSpec extends SparkSpecBase {

  test("quality_classifier: held-out separation, probabilities sane, invariance") {
    val out = TextAnalysis.qualityClassifier(spark, sf).cache()
    assert(out.count() == Tables.documents(spark, sf).count())
    // probabilities are probabilities
    assert(out.filter(col("p_target") < 0.0 || col("p_target") > 1.0).count() == 0)
    // the signal is REAL on held-out rows the optimizer never saw:
    // target-class mean probability clearly above the rest
    val held = out.filter(col("held_out"))
    val means = held.groupBy("is_target").agg(avg("p_target").as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false) + 0.2,
      s"held-out separation too weak: $means")
    // held-out accuracy at the 0.5 threshold beats the majority baseline
    val heldN = held.count().toDouble
    val acc = held.filter((col("p_target") > 0.5) === col("is_target")).count() / heldN
    val majority = math.max(
      held.filter(col("is_target")).count() / heldN,
      held.filter(!col("is_target")).count() / heldN)
    assert(acc > majority, s"held-out acc $acc <= majority $majority")
    // partition stability: L-BFGS treeAggregates sum floats in partition
    // order, so coefficients can wiggle at machine precision — scores
    // from a reshuffled input must agree to 1e-3, label flips to zero
    val docs7 = Tables.documents(spark, sf).repartition(7)
    val labels7 = TextAnalysis.qualityScoreOver(docs7)
      .select(col("doc_id"), (col("score") >= 0.72).as("is_target"))
    val re = TextAnalysis.qualityClassifierOver(
      docs7.join(labels7, "doc_id"), col("is_target"))
      .select(col("doc_id"), col("p_target").as("p2"))
    val joined = out.join(re, "doc_id")
    assert(joined.filter(abs(col("p_target") - col("p2")) > 1e-3).count() == 0)
    out.unpersist()
  }
}
