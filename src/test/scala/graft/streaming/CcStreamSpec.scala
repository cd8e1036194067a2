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

  test("durable label store: stream ≡ batch; restart resumes from the committed generation") {
    val src = java.nio.file.Files.createTempDirectory("cc_store_src").toFile
    src.deleteOnExit()
    docs.repartition(5).write.mode("overwrite")
      .parquet(s"${src.getAbsolutePath}/documents.parquet")
    val expected = graft.dedup.ConnectedComponents
      .componentsAlternating(CcStream.edgesOf(docs))
      .filter(col("id") < CcStream.HubOffset)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq

    // uninterrupted durable run ≡ batch CC
    val store1 = java.nio.file.Files.createTempDirectory("cc_store1").toString
    try {
      val un = CcStream.labelStoreFile(spark, src.getAbsolutePath, store1,
        nBuckets = 8, maxFilesPerTrigger = Some(1))
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(un == expected, s"durable stream != batch CC: $un")
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(store1))

    // interrupted run: phase 1 sees only some files, the stream stops
    // (process exit), phase 2 reopens the SAME store+checkpoint with
    // the full dir — it must resume, not replay, and the final labels
    // must equal the uninterrupted run's
    val parts = new java.io.File(src, "documents.parquet").listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(parts.length == 5)
    val staged = java.nio.file.Files.createTempDirectory("cc_store_staged").toFile
    staged.deleteOnExit()
    val stagedTbl = new java.io.File(staged, "documents.parquet")
    assert(stagedTbl.mkdirs())
    def copyIn(fs: Seq[java.io.File]): Unit = fs.foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(stagedTbl, f.getName).toPath)
      ()
    }
    val store2 = java.nio.file.Files.createTempDirectory("cc_store2").toString
    try {
      copyIn(parts.take(2).toSeq)
      CcStream.labelStoreFile(spark, staged.getAbsolutePath, store2,
        nBuckets = 8, maxFilesPerTrigger = Some(1))
      // phase 1's labels are already durable and correct for its slice
      val slice = spark.read.parquet(parts.take(2).map(_.getAbsolutePath): _*)
      val sliceExpected = graft.dedup.ConnectedComponents
        .componentsAlternating(CcStream.edgesOf(slice))
        .filter(col("id") < CcStream.HubOffset)
        .select(col("id").as("doc_id"), col("component"))
        .as[(Long, Long)].collect().toSet
      val sliceGot = graft.dedup.LabelStore.load(spark, store2)
        .filter(col("id") < CcStream.HubOffset)
        .as[(Long, Long)].collect().toSet
      assert(sliceGot == sliceExpected, "phase-1 store labels wrong")
      val gensAfterP1 = graft.tools.Artifacts.committedGens(spark, store2)

      copyIn(parts.drop(2).toSeq)
      val resumed = CcStream.labelStoreFile(spark, staged.getAbsolutePath,
        store2, nBuckets = 8, maxFilesPerTrigger = Some(1))
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(resumed == expected, s"restart-resume != uninterrupted: $resumed")
      // resumption, not replay: phase 2 published exactly one new
      // generation per NEW file (3), never re-processing phase 1's —
      // generation numbers are monotone, so replay would overshoot
      val gensAfterP2 = graft.tools.Artifacts.committedGens(spark, store2)
      val genNum = (g: String) => g.split("/g").last.toLong
      assert(genNum(gensAfterP2.last) - genNum(gensAfterP1.last) == 3,
        s"expected 3 new generations (one per new file), " +
          s"got ${genNum(gensAfterP2.last) - genNum(gensAfterP1.last)}")
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(store2))
  }

  test("interleaved ingest + live takedowns ≡ batch appendEdges/removeNodes over the same sequence") {
    import graft.dedup.{ConnectedComponents, LabelStore}
    val src = java.nio.file.Files.createTempDirectory("cc_take_src").toFile
    src.deleteOnExit()
    docs.repartition(4).write.mode("overwrite")
      .parquet(s"${src.getAbsolutePath}/documents.parquet")
    val store = java.nio.file.Files.createTempDirectory("cc_take_store").toString
    try {
      // per-trigger: takedown every doc_id % 9 == 0 OF THAT TRIGGER
      // (already ingested by construction), recording the sequence
      val seq = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[Long], Seq[Long])] // (trigger docs, taken down)
      val got = CcStream.labelStoreFile(spark, src.getAbsolutePath, store,
        nBuckets = 8, maxFilesPerTrigger = Some(1),
        takedowns = (_, mb) => {
          val ids = mb.filter($"doc_id" % 9 === 0).select($"doc_id")
          val all = mb.select($"doc_id").as[Long].collect().toSeq.sorted
          val dead = ids.as[Long].collect().toSeq.sorted
          seq += ((all, dead))
          if (dead.isEmpty) None else Some(ids.toDF("id"))
        })
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(seq.size == 4 && seq.exists(_._2.nonEmpty),
        "fixture produced no takedowns — vacuous test")
      // replay the RECORDED sequence with the in-memory batch ops
      val byId = docs.select($"doc_id", $"text").as[(Long, String)]
        .collect().toMap
      var labels = spark.range(0).select($"id", $"id".as("component"))
      val soFar = scala.collection.mutable.Set.empty[Long] // surviving ids
      seq.foreach { case (ingested, dead) =>
        val mbDocs = ingested.map(i => (i, byId(i))).toDF("doc_id", "text")
        soFar ++= ingested
        labels = ConnectedComponents
          .appendEdges(labels, CcStream.edgesOf(mbDocs)).localCheckpoint()
        if (dead.nonEmpty) {
          soFar --= dead
          // the batch-op contract takes the CURRENT surviving edge
          // table — the edges of every doc ingested and not removed
          val surviving = soFar.toSeq.sorted
            .map(i => (i, byId(i))).toDF("doc_id", "text")
          labels = ConnectedComponents.removeNodes(labels,
            CcStream.edgesOf(surviving), dead.toDF("id")).localCheckpoint()
        }
      }
      val want = labels.filter($"id" < CcStream.HubOffset)
        .select($"id".as("doc_id"), $"component")
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(got == want, "interleaved stream takedowns != batch sequence")
      // final state is also the pure function of the survivors: CC
      // over all docs minus every taken-down id (order-independence)
      val deadAll = seq.flatMap(_._2).toSet
      val survivors = docs.filter(!$"doc_id".isin(deadAll.toSeq: _*))
      val pure = ConnectedComponents
        .componentsAlternating(CcStream.edgesOf(survivors))
        .filter($"id" < CcStream.HubOffset)
        .select($"id".as("doc_id"), $"component")
        .orderBy("doc_id").as[(Long, Long)].collect().toSeq
      assert(got == pure, "takedown state != CC over surviving docs")
      // deleted ids are gone from the durable store itself
      val stored = LabelStore.load(spark, store)
        .filter($"id".isin(deadAll.toSeq: _*)).count()
      assert(stored == 0, "taken-down ids still in the store")
    } finally graft.tools.Scratch.deleteRecursively(new java.io.File(store))
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
