package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Degenerate-input behavior: every operator must return an empty
  * (not crashed, not null-poisoned) result on empty input, and the
  * docx source must fail loudly on garbage bytes.
  */
class EdgeCaseSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val emptyEvents = Seq.empty[(Long, Long, Boolean)]
    .toDF("k", "ord", "is_marker")

  test("segmentation of an empty frame is empty") {
    assert(Segmentation.segment(emptyEvents, col("k"), col("is_marker"), col("ord"))
      .count() == 0)
  }

  test("batching of an empty frame is empty (both formulations)") {
    val e = Seq.empty[Long].toDF("id")
    assert(Batching.withBatchId(e, 5, col("id")).count() == 0)
    assert(Batching.withBatchIdScalable(e, 5, col("id")).count() == 0)
  }

  test("as-of join with empty right side keeps all left rows unmatched") {
    val left = Seq((1L, new java.sql.Timestamp(1000), "x")).toDF("k", "ts", "v")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("k", "ts", "px")
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("px"))
    assert(out.count() == 1)
    assert(out.select("asof_px").head().isNullAt(0))
  }

  test("range join with empty side is empty") {
    val l = Seq((1L, new java.sql.Timestamp(1000))).toDF("id", "ts")
    val r = Seq.empty[(Long, java.sql.Timestamp)].toDF("rid", "rts")
    assert(RangeJoin.bucketedRangeJoin(l, r, "ts", "rts", 10, 10).count() == 0)
  }

  test("dedup operators on an empty corpus are empty") {
    val e = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.dedup.Dedup.exactGroups(e, "doc_id", "text").count() == 0)
    assert(graft.dedup.Dedup.minhashNearDups(e, "doc_id", "text", 0.5).count() == 0)
    assert(graft.dedup.Dedup.simhashNearDups(e, "doc_id", "text").count() == 0)
    assert(graft.dedup.Dedup.ngramJaccardNearDups(e, "doc_id", "text", 0.5).count() == 0)
  }

  test("null and short texts don't break the native kernels") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "one two"), (4L, "a b c d e f"))
      .toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), graft.functions.HashExprs.simhash64(col("text")))
      .collect()
    assert(sh.count(_.isNullAt(1)) == 1) // null in, null out
    val mh = graft.dedup.Dedup.minhashSignature(df, "doc_id", "text", shingleK = 5)
    assert(mh.count() == 1) // only the 6-token doc has 5-shingles
  }

  test("docx source fails loudly on a non-docx file") {
    val f = java.nio.file.Files.createTempFile("not_a_docx", ".docx")
    java.nio.file.Files.write(f, "this is not a zip".getBytes)
    val ex = intercept[Exception] {
      spark.read.format("docx").load(f.toString).count()
    }
    assert(ex.getMessage != null)
  }

  test("bloom filter built over an empty dim matches nothing, pruned join is empty") {
    import graft.functions.Bloom
    val emptyDim = Seq.empty[Long].toDF("dk")
    val fact = Seq((1L, "a"), (2L, "b")).toDF("fk", "v")
    val f = Bloom.LongBloomFilter.deserialize(
      Bloom.buildFilter(emptyDim, "dk", expectedN = 1))
    assert(!f.contains(1L) && !f.contains(2L))
    assert(Bloom.prunedSemiJoin(fact, emptyDim, "fk", "dk", expectedN = 1)
      .count() == 0)
  }

  test("cms built over an empty stream estimates zero everywhere") {
    import graft.functions.Sketches
    val cms = Sketches.CountMinSketch.deserialize(
      Sketches.build(Seq.empty[String].toDF("w"), "w"))
    assert(cms.estimate(org.apache.spark.unsafe.types.UTF8String.fromString("x")) == 0)
  }

  test("triangle stats of an empty / single-edge graph are (0,0) / (1,0)") {
    val empty = Seq.empty[(Long, Long)].toDF("u", "v")
    assert(TriangleCount.stats(empty) == ((0L, 0L)))
    val one = Seq((1L, 2L)).toDF("u", "v")
    assert(TriangleCount.stats(one) == ((1L, 0L)))
  }

  test("native as-of join with empty right side keeps all left rows unmatched") {
    val left = Seq((1L, new java.sql.Timestamp(1000), "x")).toDF("k", "ts", "v")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("k", "ts", "px")
    val out = AsOfJoin.backwardNative(left, right, "k", "ts", Seq("px"))
    assert(out.count() == 1)
    assert(out.filter(col("asof_px").isNotNull).count() == 0)
    // and an empty LEFT side is simply empty
    val emptyLeft = Seq.empty[(Long, java.sql.Timestamp, String)].toDF("k", "ts", "v")
    assert(AsOfJoin.backwardNative(emptyLeft, right, "k", "ts", Seq("px")).count() == 0)
  }
}
