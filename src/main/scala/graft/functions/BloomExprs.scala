package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{call_function, col, lit, udaf}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Bloom-filter runtime join filter (the missing-from-public-API
  * sibling of Spark's internal `BloomFilterAggregate` runtime filter).
  *
  * At 100 TB the expensive part of `fact ⋈ dim` with a selective dim
  * predicate is shuffling fact rows that will never match. A Bloom
  * filter built over the dim keys and pushed to the fact SCAN drops
  * the overwhelming majority of non-matching rows before the
  * exchange; the exact join afterwards removes the false positives,
  * so the result is IDENTICAL to the plain join — which is what makes
  * the operator oracle-checkable with ordinary SQL.
  *
  * Layout: `numHashes` is stored in the first 8 bytes (little
  * endian), then the bit words. Hashing is double hashing over
  * XXH64(key): index_i = (h1 + i·h2) mod numBits — the standard
  * Kirsch–Mitzenmacher construction, no false negatives by design.
  *
  * Reference provenance: the reference has no joins beyond a lookup
  * scan (`syllabus_ai_graph.py:190-201`); this is the §2.C Q-JOIN
  * family taken to its at-scale conclusion (north-star mandate).
  */
object Bloom {

  /** Plain long-addressable bloom bit set; `words` excludes the header. */
  final class LongBloomFilter(val words: Array[Long], val numHashes: Int)
      extends Serializable {
    private val numBits: Long = words.length.toLong * 64L

    private def h1(v: Long): Long = XXH64.hashLong(v, 0x9747b28c)
    private def h2(v: Long): Long = XXH64.hashLong(v, 0x5bd1e995) | 1L

    def add(v: Long): Unit = {
      val a = h1(v); val b = h2(v)
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Long.remainderUnsigned(a + i * b, numBits)
        words((bit >>> 6).toInt) |= (1L << (bit & 63))
        i += 1
      }
    }

    def contains(v: Long): Boolean = {
      val a = h1(v); val b = h2(v)
      var i = 0
      while (i < numHashes) {
        val bit = java.lang.Long.remainderUnsigned(a + i * b, numBits)
        if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }

    def serialize: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + words.length * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putLong(numHashes.toLong)
      words.foreach(bb.putLong)
      bb.array()
    }
  }

  object LongBloomFilter {
    /** Optimal sizing for `expectedN` keys at false-positive rate
      * `fpp`: m = -n·ln(p)/ln²2 bits, k = (m/n)·ln2 hashes.
      */
    /** (numWords, numHashes) for `expectedN` keys at rate `fpp` —
      * pure arithmetic, so callers that only need the geometry (e.g.
      * [[BloomAgg]]) never allocate the zeroed filter itself.
      */
    def geometry(expectedN: Long, fpp: Double): (Int, Int) = {
      require(expectedN > 0 && fpp > 0 && fpp < 1)
      val mBits = math.max(64L,
        math.ceil(-expectedN * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
      val words = (mBits + 63) / 64
      // ((mBits+63)/64).toInt silently overflows Int for extreme
      // expectedN (≈ >1.3e19 bits), yielding a negative array size
      require(words <= Int.MaxValue.toLong,
        s"bloom filter of $mBits bits ($expectedN keys @ fpp=$fpp) exceeds " +
          "the max array-backed size; raise fpp or shard the filter")
      val k = math.max(1, math.round(mBits.toDouble / expectedN * math.log(2)).toInt)
      (words.toInt, k)
    }

    def sized(expectedN: Long, fpp: Double): LongBloomFilter = {
      val (words, k) = geometry(expectedN, fpp)
      new LongBloomFilter(new Array[Long](words), k)
    }

    def deserialize(bytes: Array[Byte]): LongBloomFilter = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val k = bb.getLong.toInt
      val words = new Array[Long]((bytes.length - 8) / 8)
      var i = 0
      while (i < words.length) { words(i) = bb.getLong; i += 1 }
      new LongBloomFilter(words, k)
    }
  }

  /** Distributed build: typed aggregator whose buffer is the raw word
    * array — partial filters are OR-merged, so the build is one
    * map-side pass over the dim keys plus a tiny (numBits/8-byte)
    * shuffle of one partial per partition. Null keys are skipped (a
    * null never equi-joins, so it needs no bit).
    */
  final class BloomAgg(expectedN: Long, fpp: Double)
      extends Aggregator[java.lang.Long, Array[Long], Array[Byte]] {
    // geometry only — instantiating a prototype just to read two ints
    // would transiently allocate the full zeroed filter (multi-GB at
    // large expectedN) on driver AND executors
    private val (numWords, kHashes) = LongBloomFilter.geometry(expectedN, fpp)

    override def zero: Array[Long] = new Array[Long](numWords)

    override def reduce(buf: Array[Long], v: java.lang.Long): Array[Long] = {
      if (v != null) { new LongBloomFilter(buf, kHashes).add(v.longValue()) }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Array[Byte] =
      new LongBloomFilter(buf, kHashes).serialize

    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
  }

  /** Build a serialized bloom filter over `df(key)` (bigint). One
    * narrow pass + driver collect of a single binary row.
    */
  def buildFilter(df: DataFrame, key: String, expectedN: Long,
      fpp: Double = 0.01): Array[Byte] = {
    val agg = udaf(new BloomAgg(expectedN, fpp))
    df.select(agg(col(key).cast("long")).as("bloom")).head().getAs[Array[Byte]](0)
  }

  /** `graft_bloom_contains(filterBinary, key)` column form. */
  def bloomContains(filter: Array[Byte], key: Column): Column =
    call_function("graft_bloom_contains", lit(filter), key.cast("long"))

  /** Bloom-pruned left-semi join: `fact` rows whose `factKey` appears
    * in `dim(dimKey)`. The bloom probe runs on the fact SCAN (narrow,
    * codegen'd), so non-matching rows never reach the exchange; the
    * exact semi join then removes false positives — result is
    * IDENTICAL to the plain semi join. `expectedN` sizes the filter
    * (pass the dim-side key cardinality or a safe upper bound; at
    * fpp=0.01 the filter costs ~1.2 bytes/key, so even 10^9 dim keys
    * broadcast at ~1.2 GB — past that, raise fpp or fall back to a
    * plain shuffled semi join).
    */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedN: Long, fpp: Double = 0.01): DataFrame = {
    require(factKey != dimKey,
      "alias the key columns apart (self-join ambiguity otherwise)")
    val filter = buildFilter(dim, dimKey, expectedN, fpp)
    fact.filter(bloomContains(filter, col(factKey)))
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_semi")
  }
}

/** binary × bigint → boolean membership probe. The filter side must be
  * foldable (a literal / broadcast scalar): it is deserialized ONCE
  * per executor (lazy val survives plan serialization), and the probe
  * stays inside whole-stage codegen — per-row work is k hash-mults
  * and k word loads, no allocation.
  */
final case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "graft_bloom_contains filter must be foldable (literal bloom bytes)")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_contains expects (BINARY, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = right.nullable || left.nullable

  @transient private lazy val parsed: Bloom.LongBloomFilter =
    Bloom.LongBloomFilter.deserialize(left.eval().asInstanceOf[Array[Byte]])

  override def nullSafeEval(l: Any, r: Any): Any =
    parsed.contains(r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", parsed,
      classOf[Bloom.LongBloomFilter].getName)
    defineCodeGen(ctx, ev, (_, r) => s"$ref.contains($r)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContainsExpr =
    copy(left = newLeft, right = newRight)
}
