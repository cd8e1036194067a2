package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with / aggregate) — no UDFs,
  * so the expressions stay inside whole-stage codegen and Catalyst can
  * see through them.
  *
  * All arithmetic is forced through per-element double casts so
  * results are bit-identical to a DuckDB oracle computing the same
  * sequential fold.
  */
object VectorOps {

  /** Sequential-fold dot product of two float-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero-norm vectors (returns null
    * via division by zero -> NaN guard).
    */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0.0, dot(a, b) / denom)
  }

  /** Sign-bit bucket over the first `k` components: a deterministic
    * coarse quantizer for LSH-style candidate bucketing. Vectors whose
    * first-k sign pattern matches land in the same bucket; near-dup
    * vectors almost always share the pattern. k <= 20 keeps bucket
    * count (2^k) manageable.
    */
  def signBucket(a: Column, k: Int): Column =
    aggregate(slice(a, 1, k), lit(0L),
      (acc, x) => acc * 2 + when(x >= 0f, 1L).otherwise(0L))
}
