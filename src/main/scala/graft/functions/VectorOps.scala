package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Vector math over `array<float>` embedding columns.
  *
  * The hot entry points (dot/cosine) dispatch to the native Catalyst
  * kernels of [[VectorExprs]] (single fused loop, whole-stage codegen,
  * ~100× the throughput of the lambda form on 64-dim vectors — the
  * difference between 140s and 1s on an O(n²) exact-verify join).
  * The `*Relational` twins keep the pure higher-order-function
  * formulation as the cross-checked specification of the fold order;
  * VectorOpsSpec asserts native == relational bit-for-bit.
  *
  * All arithmetic is forced through per-element double casts so
  * results are bit-identical to a DuckDB oracle computing the same
  * sequential fold. Requires [[graft.GraftExtensions]] on the session.
  */
object VectorOps {

  // NARROWING CONTRACT of the bare dot/cosine entry points: any
  // numeric-array input is cast to the kernels' array<float> form, so
  // an array<double> embedding loses precision here (near-threshold
  // cosines can flip vs the old full-double zip_with form). Callers
  // that hold the DataFrame should use the *For dispatchers below,
  // which keep double-typed columns on the full-precision relational
  // path. For float inputs the cast is a no-op in the plan.
  private def f(c: Column): Column = c.cast("array<float>")

  private def isDoubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** True when `vecCol` is array<double> — such columns should stay on
    * the relational double path (see the narrowing contract above).
    */
  def isDoubleVec(df: DataFrame, vecCol: String): Boolean =
    isDoubleArray(df.schema(vecCol).dataType)

  /** Schema-aware cosine: native float kernel unless `vecCol` is
    * array<double>, in which case the full-double relational fold is
    * used (the pre-kernel behavior double-typed callers relied on).
    */
  def cosineFor(df: DataFrame, vecCol: String): (Column, Column) => Column =
    if (isDoubleArray(df.schema(vecCol).dataType)) cosineRelational _ else cosine _

  /** Schema-aware dot; see [[cosineFor]]. */
  def dotFor(df: DataFrame, vecCol: String): (Column, Column) => Column =
    if (isDoubleArray(df.schema(vecCol).dataType)) dotRelational _ else dot _

  /** Schema-aware norm; see [[cosineFor]]. */
  def normFor(df: DataFrame, vecCol: String): Column => Column =
    if (isDoubleArray(df.schema(vecCol).dataType))
      (a: Column) => sqrt(dotRelational(a, a))
    else norm _

  /** Sequential-fold dot product of two float-array columns (native). */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", f(a), f(b))

  /** Cosine similarity; null on zero-norm vectors (native, fused). */
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", f(a), f(b))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** PQ asymmetric-distance cosine (native, fused): codes row ×
    * per-query dot LUT × shared squared-norm LUT × query norm. See
    * [[AdcScoreExpr]]; null on malformed inputs or a zero denominator.
    */
  def adcScore(codes: Column, dotLut: Column, nrmSqLut: Column,
      queryNorm: Column): Column =
    call_function("graft_adc_score", codes, dotLut, nrmSqLut, queryNorm)

  /** Relational twin of [[dot]]: zip_with + aggregate fold. */
  def dotRelational(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Relational twin of [[cosine]]. */
  def cosineRelational(a: Column, b: Column): Column = {
    def n(v: Column) = sqrt(dotRelational(v, v))
    val denom = n(a) * n(b)
    when(denom =!= 0.0, dotRelational(a, b) / denom)
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
