package graft.streaming

import graft.SparkTestBase

/** Stream/batch equivalence (SURVEY.md §2.C Q-STREAM): the streaming
  * windowed aggregation in append mode must emit exactly the windows
  * its batch twin computes under the same watermark cutoff.
  */
class EventStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming windowed counts == batch twin with watermark cutoff") {
    val streamed = EventStream.windowedCounts(spark, sf)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    val batch = EventStream.windowedCountsBatch(spark, sf)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
