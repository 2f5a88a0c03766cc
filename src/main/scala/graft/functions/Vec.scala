package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float|double>` columns, built-ins only.
  *
  * These are the reference semantics (reference: src/embeddings.ts:77-92 —
  * dot / (||a||·||b|| + 1e-10), accumulating over min length): used by specs
  * to cross-check the codegen'd `CosineSim` expression in `graft.plans`,
  * and directly usable where the interpreted higher-order functions are fast
  * enough. The hot paths use the custom Expression (higher-order functions
  * don't participate in whole-stage codegen).
  */
object Vec {
  val Epsilon = 1e-10

  private def d(c: Column): Column = c.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column =
    aggregate(d(a), lit(0.0), (acc, x) => acc + x * x)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)) + lit(Epsilon))

  /** Deterministic random-hyperplane LSH bucket (SURVEY §2 C2): `planes`
    * pseudo-random integer hyperplanes derived from `(j*2654435761 +
    * d*40503) mod 9973 - 4986` — exact integer arithmetic, so Spark and the
    * DuckDB oracle produce bit-identical signs. Bucket = little-endian sign
    * bits. For normalized-ish vectors the buckets are near-uniform, making
    * this the shuffle key that bounds candidate sets at 100 TB.
    */
  def lshBucket(emb: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { j =>
      val dotJ = aggregate(
        transform(sequence(lit(0), lit(dim - 1)),
          dd => ((lit(j.toLong) * lit(2654435761L) + dd.cast("long") * lit(40503L)) % 9973L - 4986L)
            .cast("double") * element_at(d(emb), dd + 1)),
        lit(0.0), (acc, x) => acc + x)
      when(dotJ >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
