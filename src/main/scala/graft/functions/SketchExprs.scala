package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, col, lit, udaf}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch: a mergeable frequency sketch for heavy-hitter
  * detection over key streams too wide to exact-count.
  *
  * The at-scale pattern this enables (and `q_heavyhitters` runs):
  * pass 1 builds a fixed-size sketch (one narrow map pass, partial
  * sketches SUM-merge — a few KB per partition through the shuffle);
  * pass 2 keeps only keys whose ESTIMATE clears the threshold — CMS
  * never underestimates, so no true heavy hitter is lost — and the
  * exact aggregation then runs over the surviving candidates only.
  * The long tail (the overwhelming majority of distinct keys in a
  * web corpus) never reaches the exact-count shuffle. A final exact
  * `>= T` filter removes the sketch's false positives, so the result
  * is IDENTICAL to the exact query — which is the DuckDB oracle.
  *
  * Estimate error: est(x) ∈ [true(x), true(x) + εN] w.p. 1−δ, with
  * ε = e/width, δ = e^−depth. Size the width so εN ≪ threshold.
  */
object Sketches {

  /** Flat row-major depth×width long counters. */
  final class CountMinSketch(val depth: Int, val width: Int,
      val counters: Array[Long]) extends Serializable {
    require(counters.length == depth * width)

    @inline private def slot(row: Int, s: UTF8String): Int = {
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, row.toLong)
      java.lang.Long.remainderUnsigned(h, width.toLong).toInt
    }

    def add(s: UTF8String): Unit = {
      var r = 0
      while (r < depth) {
        counters(r * width + slot(r, s)) += 1L
        r += 1
      }
    }

    def estimate(s: UTF8String): Long = {
      var min = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counters(r * width + slot(r, s))
        if (c < min) min = c
        r += 1
      }
      min
    }

    def serialize: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + counters.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putLong(depth.toLong).putLong(width.toLong)
      counters.foreach(bb.putLong)
      bb.array()
    }
  }

  object CountMinSketch {
    def empty(depth: Int, width: Int): CountMinSketch =
      new CountMinSketch(depth, width, new Array[Long](depth * width))

    def deserialize(bytes: Array[Byte]): CountMinSketch = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val d = bb.getLong.toInt
      val w = bb.getLong.toInt
      val counters = new Array[Long](d * w)
      var i = 0
      while (i < counters.length) { counters(i) = bb.getLong; i += 1 }
      new CountMinSketch(d, w, counters)
    }
  }

  /** Distributed build: the counter array is the aggregation buffer;
    * partials merge by element-wise SUM (CMS is a linear sketch).
    * Null keys are skipped.
    */
  final class CmsAgg(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Byte]] {
    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(buf: Array[Long], v: String): Array[Long] = {
      if (v != null) {
        new CountMinSketch(depth, width, buf).add(UTF8String.fromString(v))
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Byte] =
      new CountMinSketch(depth, width, buf).serialize

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
  }

  /** Build a serialized sketch over `df(key)` (string). */
  def build(df: DataFrame, key: String, depth: Int = 4,
      width: Int = 8192): Array[Byte] = {
    val agg = udaf(new CmsAgg(depth, width))
    df.select(agg(col(key).cast("string")).as("cms")).head().getAs[Array[Byte]](0)
  }

  /** `graft_cms_estimate(sketchBinary, key)` column form. */
  def estimate(sketch: Array[Byte], key: Column): Column =
    call_function("graft_cms_estimate", lit(sketch), key.cast("string"))
}

/** binary × string → bigint frequency estimate. Sketch side must be
  * foldable; parsed once per executor, probe stays in whole-stage
  * codegen (depth hash-mod-loads per row, no allocation).
  */
final case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, StringType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, StringType) => TypeCheckResult.TypeCheckFailure(
        "graft_cms_estimate sketch must be foldable (literal sketch bytes)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_cms_estimate expects (BINARY, STRING), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = right.nullable || left.nullable

  @transient private lazy val parsed: Sketches.CountMinSketch =
    Sketches.CountMinSketch.deserialize(left.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(l: Any, r: Any): Any =
    parsed.estimate(r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsSketch", parsed,
      classOf[Sketches.CountMinSketch].getName)
    defineCodeGen(ctx, ev, (_, r) => s"$ref.estimate($r)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimateExpr =
    copy(left = newLeft, right = newRight)
}
