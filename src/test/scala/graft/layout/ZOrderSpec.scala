package graft.layout

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class ZOrderSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Morton interleave for scalar cross-checks. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }.foldLeft(0L)(_ | _)

  test("interleave matches the scalar Morton reference on exhaustive 6-bit pairs") {
    val pairs = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val df = pairs.toDF("x", "y")
      .withColumn("z", ZOrder.interleave(col("x"), col("y"), 6))
      .as[(Long, Long, Long)].collect()
    df.foreach { case (x, y, z) =>
      assert(z == morton(x, y, 6), s"interleave($x, $y) = $z != ${morton(x, y, 6)}")
    }
  }

  test("shiftFor yields the smallest shift fitting the range into bits") {
    assert(ZOrder.shiftFor(256, 8) == 0) // max value 255 already fits 8 bits
    assert(ZOrder.shiftFor(257, 8) == 1) // max value 256 needs one shift
    assert(ZOrder.shiftFor(1, 8) == 0)
    assert(ZOrder.shiftFor(1500, 8) == 3) // max 1499 >> 3 = 187
    assert(ZOrder.shiftFor(2404, 8) == 4) // max 2403 >> 4 = 150
    for (r <- Seq(7L, 63L, 64L, 100L, 1023L, 1024L, 1025L, 65536L)) {
      val s = ZOrder.shiftFor(r, 8)
      assert((r - 1) >> s < 256, s"range $r shift $s does not fit")
      assert(s == 0 || (r - 1) >> (s - 1) >= 256, s"range $r shift $s not minimal")
    }
  }

  test("z-order files bound BOTH dimensions; a custkey sort leaves the date dimension unbounded") {
    val o = Tables.orders(spark, sf)
    val r = o.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(to_date(col("o_orderdate"))), max(to_date(col("o_orderdate")))).head()
    val (minCk, maxCk) = (r.getLong(0), r.getLong(1))
    val (minD, maxD) = (r.getDate(2), r.getDate(3))
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      minD.toLocalDate, maxD.toLocalDate)
    val day = datediff(to_date(col("o_orderdate")), lit(minD)).cast("long")
    val withDims = o.withColumn("day", day)

    // z-order layout: file = top 4 z-bits (16 files at this SF)
    val zFiles = withDims
      .withColumn("z", ZOrder.zValue(col("o_custkey"), minCk, maxCk,
        col("day"), 0L, nDays, bits = 8))
      .withColumn("file_id", ZOrder.fileId(col("z"), 8, 4))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n"),
        (max(col("o_custkey")) - min(col("o_custkey"))).as("ck_span"),
        (max(col("day")) - min(col("day"))).as("day_span"))
      .as[(Long, Long, Long, Long)].collect()
    assert(zFiles.length > 4, "z-order produced too few populated files to compare")

    // linear layout: same file COUNT, split by custkey range only
    val nf = zFiles.length
    val linFiles = withDims
      .withColumn("file_id",
        ((col("o_custkey") - lit(minCk)) * nf / (maxCk - minCk + 1)).cast("long"))
      .groupBy("file_id")
      .agg((max(col("day")) - min(col("day"))).as("day_span"))
      .as[(Long, Long)].collect()

    val ckRange = (maxCk - minCk).toDouble
    val dayRange = nDays.toDouble
    // every z-file bounds both dims to well under the full range
    // (8-bit grid, top-4-bit files => each file spans at most a
    // quarter of one dimension's grid plus one cell of the other)
    zFiles.foreach { case (f, _, ckSpan, daySpan) =>
      assert(ckSpan <= ckRange * 0.6, s"file $f ck_span $ckSpan vs range $ckRange")
      assert(daySpan <= dayRange * 0.6, s"file $f day_span $daySpan vs range $dayRange")
    }
    // ...while the custkey-sorted layout leaves day unbounded in
    // (nearly) every file: its files cannot serve a date predicate
    val linUnbounded = linFiles.count(_._2 > dayRange * 0.9)
    assert(linUnbounded >= linFiles.length - 1,
      s"custkey layout unexpectedly bounded day: $linUnbounded of ${linFiles.length}")
    // skipping win for a 10%-of-days predicate: fewer z-files overlap
    // the band than linear files (which ALL overlap)
    val band = (nDays / 2, nDays / 2 + nDays / 10)
    val zHit = withDims
      .withColumn("z", ZOrder.zValue(col("o_custkey"), minCk, maxCk,
        col("day"), 0L, nDays, bits = 8))
      .withColumn("file_id", ZOrder.fileId(col("z"), 8, 4))
      .groupBy("file_id")
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .filter(col("hi") >= band._1 && col("lo") <= band._2).count()
    assert(zHit < nf, s"z-order skipped nothing: $zHit of $nf files overlap")
  }
}
