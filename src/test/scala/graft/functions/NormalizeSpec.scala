package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Unicode forms are written as explicit \\u escapes — raw combining
  * characters in source would be editor/normalizer bait.
  */
class NormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val eAcuteComposed = "\u00e9"
  private val eAcuteDecomposed = "e\u0301"
  private val nTildeComposed = "\u00f1"
  private val nTildeDecomposed = "n\u0303"

  test("nfc recomposes decomposed sequences; composed forms are fixpoints") {
    val df = Seq(
      (eAcuteDecomposed, eAcuteComposed),
      (nTildeDecomposed, nTildeComposed),
      (eAcuteComposed, eAcuteComposed),
      ("ascii only", "ascii only"),
      ("A\u030aB", "\u00c5B")       // A + ring above recomposes to Aring
    ).toDF("raw", "expect")
    val bad = df.filter(NormalizeOps.nfc(col("raw")) =!= col("expect")).count()
    assert(bad == 0)
    val notIdem = df.filter(
      NormalizeOps.nfc(NormalizeOps.nfc(col("raw"))) =!=
        NormalizeOps.nfc(col("raw"))).count()
    assert(notIdem == 0)
  }

  test("strip_accents drops combining marks from either input form") {
    val df = Seq(
      ("caf" + eAcuteComposed, "cafe"),
      ("caf" + eAcuteDecomposed, "cafe"),
      ("ni" + nTildeDecomposed + "o", "nino"),
      ("no accents", "no accents")
    ).toDF("raw", "expect")
    val bad = df.filter(
      NormalizeOps.stripAccents(col("raw")) =!= col("expect")).count()
    assert(bad == 0)
  }

  test("null propagates; normalization-aware dedup collapses NFC/NFD twins") {
    val df = Seq[(java.lang.Long, String)](
      (1L, "caf" + eAcuteComposed + " latte"),
      (2L, "caf" + eAcuteDecomposed + " latte"),
      (3L, "other")
    ).toDF("id", "t")
    assert(df.select(NormalizeOps.nfc(lit(null).cast("string"))).head().isNullAt(0))
    // the canonical use: hash AFTER nfc and the visually-identical pair dedups
    val groups = df.groupBy(md5(NormalizeOps.nfc(col("t")))).count()
    assert(groups.count() == 2)
    assert(groups.filter(col("count") === 2).count() == 1)
  }
}
