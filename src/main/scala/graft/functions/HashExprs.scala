package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the content-hash family (SURVEY.md
  * training-data mandate: SimHash / MinHash dedup).
  *
  * Why expressions and not explode+aggregate: the relational
  * formulation (explode tokens → 64 partial sums / 16 mins) is correct
  * and distributes, but it materializes one row per token and drags a
  * 64-column aggregate through a shuffle — measured 5s of a 7s query
  * at sf0.1. Per-document signatures are scalar functions of the text:
  * computing them inside the row pipeline keeps them in whole-stage
  * codegen (doGenCode emits a static call, like Spark's own hash
  * expressions), touches UTF8String bytes with zero boxing, and needs
  * NO shuffle at all.
  *
  * Hash parity: tokens are hashed with XXH64 seed 42 over their exact
  * byte ranges — bit-identical to `xxhash64(token)`; seeded shingle
  * hashes chain XXH64.hashLong(seed_i) → bytes, bit-identical to
  * `xxhash64(lit(i), shingle)`. So these kernels reproduce the
  * relational formulation's outputs exactly (asserted in DedupSpec).
  */
object HashExprs {

  /** 64-bit SimHash of space-tokenized text (empty tokens included,
    * `split` parity). Null text → null. Requires [[graft.GraftExtensions]]
    * on the session (spark.sql.extensions).
    */
  def simhash64(text: Column): Column = call_function("graft_simhash64", text)

  /** MinHash signature over distinct word k-shingles: array of
    * `numHashes` longs, or null when the text has fewer than k tokens
    * (parity with shingles() → empty → no aggregate row). Requires
    * [[graft.GraftExtensions]] on the session.
    */
  def minhashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    call_function("graft_minhash_sig", text,
      org.apache.spark.sql.functions.lit(shingleK),
      org.apache.spark.sql.functions.lit(numHashes))

  /** Distinct word k-shingles as array<string>; empty array for < k
    * tokens (parity with TextOps.shingles, including first-occurrence
    * order — array_distinct semantics). Requires [[graft.GraftExtensions]].
    */
  def shingles(text: Column, k: Int): Column =
    call_function("graft_shingles", text, org.apache.spark.sql.functions.lit(k))

  /** 60-bit MD5-token SimHash (oracle-parity variant): same algorithm
    * as [[simhash64]] but the token hash is the first 15 hex chars of
    * md5(token) — a quantity DuckDB computes natively
    * (`CAST('0x' || substr(md5(tok),1,15) AS BIGINT)`), so signatures
    * AND Hamming-near pairs check against a SQL oracle exactly. 60
    * bits keeps the value in non-negative signed BIGINT range on both
    * engines. Use [[simhash64]] (xxhash, no digest allocation) when
    * cross-engine parity isn't needed.
    */
  def simhash60(text: Column): Column = call_function("graft_simhash60", text)

  private val SPACE: Byte = ' '.toByte

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Kernel: 60-bit md5-token simhash votes; empty tokens included
    * (`split` parity, same as [[computeSimhash]]).
    */
  def computeSimhash60Md5(s: UTF8String): Long = {
    val md = md5Local.get()
    val toks = s.split(UTF8String.fromString(" "), -1)
    val votes = new Array[Int](60)
    var t = 0
    while (t < toks.length) {
      val d = md.digest(toks(t).getBytes) // digest() resets the instance
      // first 15 hex chars = big-endian first 8 bytes >>> 4
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = h >>> 4
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Codegen/eval kernel: simhash votes over space-delimited byte
    * ranges, no allocation.
    */
  def computeSimhash(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || org.apache.spark.unsafe.Platform.getByte(base, off + i) == SPACE) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Kernel: distinct k-shingle MinHash signature; returns null for
    * < k tokens.
    */
  def computeMinhash(s: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val toks = s.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < k) return null
    val seen = new java.util.HashSet[UTF8String]()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + k <= n) {
      val shingle = UTF8String.concatWs(space, java.util.Arrays.copyOfRange(toks, i, i + k): _*)
      if (seen.add(shingle)) {
        val bytes = shingle.getBytes
        var j = 0
        while (j < numHashes) {
          // chain parity with xxhash64(lit(j), shingle): lit(j) is an
          // IntegerType literal, which XxHash64 hashes via hashInt
          val seeded = XXH64.hashInt(j, 42L)
          val h = XXH64.hashUnsafeBytes(bytes,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, bytes.length, seeded)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Kernel: distinct k-shingles in first-occurrence order. */
  def computeShingles(s: UTF8String, k: Int): ArrayData = {
    val toks = s.split(UTF8String.fromString(" "), -1)
    val n = toks.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val space = UTF8String.fromString(" ")
    var i = 0
    while (i + k <= n) {
      seen.add(UTF8String.concatWs(space, java.util.Arrays.copyOfRange(toks, i, i + k): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }
}

/** text → simhash long; whole-stage-codegen friendly. */
final case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashExprs.computeSimhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.computeSimhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** text → 60-bit md5-token simhash; whole-stage-codegen friendly. */
final case class SimHash60Md5Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash60 expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashExprs.computeSimhash60Md5(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.computeSimhash60Md5($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash60Md5Expr =
    copy(child = newChild)
}

/** text → minhash signature array(numHashes long), null if < k tokens. */
final case class MinHashSigExpr(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleK >= 1 && numHashes >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    HashExprs.computeMinhash(input.asInstanceOf[UTF8String], shingleK, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.functions.HashExprs.computeMinhash"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $f($c, $shingleK, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** text → array of distinct k-shingles (first-occurrence order). */
final case class ShinglesExpr(child: Expression, shingleK: Int)
    extends UnaryExpression {
  require(shingleK >= 1)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles expects STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    HashExprs.computeShingles(input.asInstanceOf[UTF8String], shingleK)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.computeShingles($c, $shingleK)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}
