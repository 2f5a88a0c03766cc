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

  /** Column API for [[VecMeanFixed]] — the codegen path when the
    * dimensionality is known at plan time (it always is for k-means
    * training: it's the codebook width).
    */
  def vecMeanFixed(c: Column, dim: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      VecMeanFixed(GraftSqlBridge.expression(c), dim).toAggregateExpression())
  }

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

/** Element-wise mean of an `array<double>` column over a FIXED
  * dimensionality, as a pure-expression `DeclarativeAggregate`.
  *
  * The aggregation buffer is `dim` primitive double sums plus `dim`
  * primitive long counts — every slot is a fixed-width mutable field, so
  * the planner picks `HashAggregateExec` and the whole update loop stays
  * inside whole-stage codegen. The `Aggregator`-based [[VecAgg.VecMean]]
  * instead plans as an ObjectHashAggregate that serializes/deserializes a
  * `MeanBuf` object per group crossing — measurably slower in the k-means
  * training loop, where this aggregate runs once per Lloyd iteration.
  *
  * Semantics match [[VecAgg.VecMean]] for inputs of length ≤ dim (proven in
  * VecSpec): per-dimension counts make ragged/NULL rows contribute only to
  * the dimensions they actually have; a group with no non-NULL elements at
  * all evaluates to NULL like the built-in aggregates; a dimension with no
  * contributions yields 0.0. Dimensions beyond `dim` are not tracked —
  * callers pass the codebook width, which is exact for k-means.
  */
case class VecMeanFixed(child: org.apache.spark.sql.catalyst.expressions.Expression,
                        dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
    with org.apache.spark.sql.catalyst.trees.UnaryLike[
      org.apache.spark.sql.catalyst.expressions.Expression] {

  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  require(dim > 0, s"VecMeanFixed dim must be positive, got $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val sums = (0 until dim).map(i =>
    AttributeReference(s"vmf_sum_$i", DoubleType, nullable = false)())
  private lazy val cnts = (0 until dim).map(i =>
    AttributeReference(s"vmf_cnt_$i", LongType, nullable = false)())

  override lazy val aggBufferAttributes: Seq[AttributeReference] = (sums ++ cnts).toSeq

  override lazy val initialValues: Seq[Expression] =
    Seq.fill(dim)(Literal(0.0)) ++ Seq.fill(dim)(Literal(0L))

  // ANSI-safe element access: guard the index against the row's actual
  // length (out-of-range would throw under ANSI; here it means "this row
  // does not contribute to dimension i", like the ragged path of VecMean)
  private def elem(i: Int): Expression =
    If(IsNull(child), Literal(null, DoubleType),
      If(GreaterThan(Size(child), Literal(i)),
        GetArrayItem(child, Literal(i), failOnError = false),
        Literal(null, DoubleType)))

  override lazy val updateExpressions: Seq[Expression] = {
    val newSums = (0 until dim).map { i =>
      val e = elem(i)
      If(IsNull(e), sums(i), Add(sums(i), e))
    }
    val newCnts = (0 until dim).map { i =>
      If(IsNull(elem(i)), cnts(i), Add(cnts(i), Literal(1L)))
    }
    newSums ++ newCnts
  }

  override lazy val mergeExpressions: Seq[Expression] =
    sums.map(s => Add(s.left, s.right)) ++ cnts.map(c => Add(c.left, c.right))

  override lazy val evaluateExpression: Expression = {
    val total = cnts.map(_.asInstanceOf[Expression]).reduce(Add(_, _))
    If(EqualTo(total, Literal(0L)), Literal(null, dataType),
      CreateArray((0 until dim).map(i =>
        If(EqualTo(cnts(i), Literal(0L)), Literal(0.0),
          Divide(sums(i), Cast(cnts(i), DoubleType))))))
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): VecMeanFixed =
    copy(child = newChild)
}
