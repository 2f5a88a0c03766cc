package graft.plans

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom aggregate: element-wise mean of a vector column — the centroid
  * aggregate k-means (IVF/PQ training) runs every iteration. Expressed as
  * an `Aggregator[IN, BUF, OUT]` with a mutable (sum, count) buffer, the
  * mergeable-partial-state shape that distributes: partials combine
  * map-side, only (dim doubles + long) per group crosses the shuffle —
  * versus the previous posexplode formulation that multiplied every row by
  * its dimensionality before aggregating.
  */
object VecAgg {

  /** Per-dimension sums AND counts: ragged inputs contribute to exactly the
    * dimensions they have, so the result is partition-independent and equal
    * to a per-dimension avg (the posexplode formulation's semantics).
    */
  case class MeanBuf(var sum: Array[Double], var cnt: Array[Long])

  object VecMean extends Aggregator[Seq[Double], MeanBuf, Seq[Double]] {
    override def zero: MeanBuf = MeanBuf(Array.emptyDoubleArray, Array.emptyLongArray)

    private def grow(b: MeanBuf, len: Int): Unit = if (b.sum.length < len) {
      b.sum = java.util.Arrays.copyOf(b.sum, len)
      b.cnt = java.util.Arrays.copyOf(b.cnt, len)
    }

    override def reduce(b: MeanBuf, a: Seq[Double]): MeanBuf = {
      if (a == null) return b // NULL rows contribute nothing, like avg()
      grow(b, a.length)
      var i = 0
      while (i < a.length) { b.sum(i) += a(i); b.cnt(i) += 1; i += 1 }
      b
    }

    override def merge(x: MeanBuf, y: MeanBuf): MeanBuf = {
      grow(x, y.sum.length)
      var i = 0
      while (i < y.sum.length) { x.sum(i) += y.sum(i); x.cnt(i) += y.cnt(i); i += 1 }
      x
    }

    override def finish(b: MeanBuf): Seq[Double] =
      // all-NULL (or empty) group → NULL, matching built-in aggregates
      if (b.cnt.length == 0) null
      else b.sum.indices.map(i => if (b.cnt(i) == 0) 0.0 else b.sum(i) / b.cnt(i))

    private[plans] val inEnc: ExpressionEncoder[Seq[Double]] = ExpressionEncoder()
    private[plans] val bufEnc: ExpressionEncoder[MeanBuf] = ExpressionEncoder()
    override def bufferEncoder: Encoder[MeanBuf] = bufEnc
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  private lazy val vecMeanUdaf = udaf(VecMean, VecMean.inEnc)

  /** Column API: mean vector of an array<double> column. */
  def vecMean(c: Column): Column = vecMeanUdaf(c)

  /** Expression builder for the registry/extensions table: a ScalaAggregator
    * over the typed Aggregator — the analyzer wraps AggregateFunction
    * results in an AggregateExpression, so this rides the same injection
    * point as the scalar functions. Reuses the aggregator's own encoders so
    * the builder cannot drift from the Column path.
    */
  def builder(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    require(es.length == 1, s"graft_vec_mean expects exactly one argument, got ${es.length}")
    new org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      es, VecMean, VecMean.inEnc, VecMean.bufEnc,
      true, true, 0, 0, Some("graft_vec_mean"))
  }
}
