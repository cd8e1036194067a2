package graft.streaming

import graft.SparkTestBase

/** Batch-vs-stream equivalence for the stateful segmentation
  * (SURVEY.md §7.2 M5): the streaming operator over the events file
  * must emit exactly the batch operator's rows restricted to the
  * final-watermark cutoff.
  */
class StreamingSegmentationSpec extends SparkTestBase {

  test("stream output == batch output under the watermark cutoff") {
    val stream = StreamingSegmentation.segmentFile(spark, sf).collect()
    val batch = StreamingSegmentation.segmentBatch(spark, sf).collect()
    assert(stream.length == batch.length)
    assert(stream.toSeq == batch.toSeq)
    assert(stream.nonEmpty) // the fixture has signup markers well before the tail
  }

  test("out-of-order arrival across microbatches still matches batch semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two files = two microbatches (maxFilesPerTrigger=1); batch 2
    // carries events with timestamps EARLIER than batch 1's tail —
    // the buffer-until-watermark state machine must still emit them
    // in event-time order
    val dir = java.nio.file.Files.createTempDirectory("graft_ooo_stream").toString
    def ev(id: Long, sec: Long, uid: Long, tpe: String) =
      (id, new java.sql.Timestamp(sec * 1000), uid, tpe, 1.0)
    val batch1 = Seq(ev(1, 100, 1, "signup"), ev(2, 2000, 1, "click"))
    val batch2 = Seq(ev(3, 300, 1, "click"), ev(4, 500, 1, "signup"),
      ev(5, 3000, 1, "click")) // 3000s advances the watermark past all
    batch1.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    batch2.toDF("event_id", "ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$dir/b2")
    // stage the two files into one stream dir in order
    val streamDir = java.nio.file.Files.createTempDirectory("graft_ooo_in").toString
    def stage(sub: String, n: String): Unit = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, new java.io.File(s"$streamDir/$n").toPath)
    }
    stage("b1", "0001.parquet")
    stage("b2", "0002.parquet")
    val schema = spark.read.parquet(streamDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir)
      .withWatermark("ts", "10 minutes").as[SegEvent]
    val name = s"ooo_${System.nanoTime()}"
    val q = StreamingSegmentation.segment(src, "signup").toDF()
      .writeStream.outputMode("append").format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table(name)
      .select("event_id", "segment").as[(Long, Long)].collect().toMap
    // event-time order: 1(signup,s1) 3(click,s1) 4(signup,s2) 2(click,s2)
    // — event 2 (arrived FIRST, ts 2000) lands in segment 2 because
    // the later-arriving signup at ts 500 precedes it in event time
    assert(got == Map(1L -> 1L, 3L -> 1L, 4L -> 2L, 2L -> 2L))
    // ts 3000 is above the final watermark (3000-600) — withheld, like
    // the batch twin's cutoff
    assert(!got.contains(5L))
  }

  test("segments are per-user increasing and start at >= 1") {
    val rows = StreamingSegmentation.segmentFile(spark, sf)
      .select("user_id", "segment").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    assert(rows.values.forall(segs => segs.head >= 1 && segs.zip(segs.tail).forall { case (a, b) => a <= b }))
  }
}
