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

  test("segments are per-user increasing and start at >= 1") {
    val rows = StreamingSegmentation.segmentFile(spark, sf)
      .select("user_id", "segment").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSeq)
    assert(rows.values.forall(segs => segs.head >= 1 && segs.zip(segs.tail).forall { case (a, b) => a <= b }))
  }
}
