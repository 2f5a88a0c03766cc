package graft.plans

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
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

  case class MeanBuf(var sum: Array[Double], var n: Long)

  object VecMean extends Aggregator[Seq[Double], MeanBuf, Seq[Double]] {
    override def zero: MeanBuf = MeanBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: MeanBuf, a: Seq[Double]): MeanBuf = {
      if (a == null) return b
      if (b.sum.length == 0) b.sum = new Array[Double](a.length)
      var i = 0
      val m = math.min(b.sum.length, a.length)
      while (i < m) { b.sum(i) += a(i); i += 1 }
      b.n += 1
      b
    }

    override def merge(x: MeanBuf, y: MeanBuf): MeanBuf = {
      if (y.sum.length == 0) return x
      if (x.sum.length == 0) return y
      var i = 0
      while (i < x.sum.length) { x.sum(i) += y.sum(i); i += 1 }
      x.n += y.n
      x
    }

    override def finish(b: MeanBuf): Seq[Double] =
      if (b.n == 0) Seq.empty else b.sum.map(_ / b.n).toSeq

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
  }

  private lazy val vecMeanUdaf = udaf(VecMean, ExpressionEncoder[Seq[Double]]())

  /** Column API: mean vector of an array<double> column. */
  def vecMean(c: Column): Column = vecMeanUdaf(c)

  /** Expression builder for the registry/extensions table: a ScalaAggregator
    * over the typed Aggregator — the analyzer wraps AggregateFunction
    * results in an AggregateExpression, so this rides the same injection
    * point as the scalar functions.
    */
  def builder(es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    new org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      es, VecMean, ExpressionEncoder[Seq[Double]](), ExpressionEncoder[MeanBuf](),
      true, true, 0, 0, Some("graft_vec_mean"))
}
