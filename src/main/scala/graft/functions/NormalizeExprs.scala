package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernels — the canonicalization step every
  * large-scale text-dedup pipeline runs BEFORE hashing (the same
  * visible string can be NFC or NFD on the wire; unnormalized, its
  * copies hash apart and survive dedup). Spark has no built-in for
  * this; DuckDB's `nfc_normalize`/`strip_accents` are the oracle.
  *
  * Implemented on `java.text.Normalizer` (ICU-equivalent for the NFC/
  * NFD forms used here), wrapped as native expressions so the calls
  * stay inside whole-stage codegen.
  */
object NormalizeKernels {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already-NFC (all-ASCII in particular) skips the copy
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** NFD-decompose, drop combining marks (Mn), recompose — mirrors
    * DuckDB `strip_accents` on decomposable characters.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val decomposed = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    UTF8String.fromString(
      Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}

sealed abstract class StringUnaryKernelExpr extends UnaryExpression {
  protected def fnName: String
  protected def kernel: String // fully-qualified static method

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$fnName expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = StringType

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"$kernel($c)")
}

/** NFC canonical composition. */
final case class NfcNormalizeExpr(child: Expression) extends StringUnaryKernelExpr {
  override protected def fnName: String = "graft_nfc"
  override protected def kernel: String = "graft.functions.NormalizeKernels.nfc"
  override def nullSafeEval(v: Any): Any =
    NormalizeKernels.nfc(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

/** Combining-mark removal (accent stripping). */
final case class StripAccentsExpr(child: Expression) extends StringUnaryKernelExpr {
  override protected def fnName: String = "graft_strip_accents"
  override protected def kernel: String =
    "graft.functions.NormalizeKernels.stripAccents"
  override def nullSafeEval(v: Any): Any =
    NormalizeKernels.stripAccents(v.asInstanceOf[UTF8String])
  override protected def withNewChildInternal(newChild: Expression): StripAccentsExpr =
    copy(child = newChild)
}

object NormalizeOps {
  /** NFC-normalize a string column (native, codegen'd). */
  def nfc(c: Column): Column = call_function("graft_nfc", c)

  /** Strip accents / combining marks (native, codegen'd). */
  def stripAccents(c: Column): Column = call_function("graft_strip_accents", c)
}
