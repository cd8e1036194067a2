package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.dedup.ConnectedComponents

class CcStreamSpec extends SparkTestBase {
  import spark.implicits._

  // planted duplicate groups: {0,7,13} and {3,9} share text; the rest
  // are unique — labels must be {0,0,0}, {3,3}, singletons elsewhere
  private def docs = (0L until 16L).map { i =>
    val text =
      if (i == 7 || i == 13) "dup group alpha content"
      else if (i == 0) "dup group alpha content"
      else if (i == 9) "dup group beta content"
      else if (i == 3) "dup group beta content"
      else s"unique content $i"
    (i, text)
  }.toDF("doc_id", "text")

  test("streamed labels equal a one-shot CC over all edges, across a forced multi-trigger run") {
    val d = java.nio.file.Files.createTempDirectory("cc_stream").toFile
    d.deleteOnExit()
    // multi-file layout: one file per trigger forces the dup groups to
    // SPLIT across triggers, so appendEdges must genuinely MERGE a
    // later trigger's member into an already-labeled component
    docs.repartition(5).write.mode("overwrite")
      .parquet(s"${d.getAbsolutePath}/documents.parquet")
    val expected = ConnectedComponents
      .componentsAlternating(CcStream.edgesOf(docs))
      .filter(col("id") < CcStream.HubOffset)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    val got = CcStream.labelFile(spark, d.getAbsolutePath,
      maxFilesPerTrigger = Some(1))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == expected, s"stream != one-shot CC: $got vs $expected")
    // and the labels are the planted truth
    val m = got.toMap
    assert(m(0L) == 0L && m(7L) == 0L && m(13L) == 0L)
    assert(m(3L) == 3L && m(9L) == 3L)
    assert((1L until 16L).filter(i => !Set(3L, 7L, 9L, 13L)(i))
      .forall(i => m(i) == i))
  }

  test("edge construction is per-row pure: edge set independent of batching") {
    val all = CcStream.edgesOf(docs).as[(Long, Long)].collect().toSet
    val halves = CcStream.edgesOf(docs.filter($"doc_id" < 8))
      .as[(Long, Long)].collect().toSet ++
      CcStream.edgesOf(docs.filter($"doc_id" >= 8))
        .as[(Long, Long)].collect().toSet
    assert(all == halves)
    // hubs live above every doc id
    assert(all.forall { case (a, b) => a < CcStream.HubOffset && b >= CcStream.HubOffset })
  }
}
