package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000)

  test("bucketed range join equals the brute-force inequality join") {
    val left = Seq((1L, t(100)), (2L, t(250)), (3L, t(1000)))
      .toDF("l_id", "lts")
    val right = Seq((10L, t(40)), (11L, t(160)), (12L, t(260)), (13L, t(5000)))
      .toDF("r_id", "rts")
    val got = RangeJoin.bucketedRangeJoin(left, right, "lts", "rts",
      beforeSec = 60, afterSec = 60)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val brute = left.crossJoin(right)
      .filter(col("rts").cast("long").between(
        col("lts").cast("long") - 60, col("lts").cast("long") + 60))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got == brute)
    assert(brute == Set((1L, 10L), (1L, 11L), (2L, 12L)))
  }

  test("each matching pair appears exactly once (no bin double-count)") {
    val left = (0L until 50L).map(i => (i, t(i * 7))).toDF("l_id", "lts")
    val right = (0L until 50L).map(i => (i + 100, t(i * 11))).toDF("r_id", "rts")
    val joined = RangeJoin.bucketedRangeJoin(left, right, "lts", "rts", 30, 30)
      .select("l_id", "r_id").as[(Long, Long)].collect()
    assert(joined.length == joined.distinct.length)
    val brute = left.crossJoin(right)
      .filter(col("rts").cast("long").between(
        col("lts").cast("long") - 30, col("lts").cast("long") + 30))
      .count()
    assert(joined.length.toLong == brute)
  }

  test("sub-second precision: pairs just outside the bound are excluded") {
    // l = 100.100s, r = 160.900s: floor diff = 60 but true offset
    // 60.8s > 60 — must NOT match (regression for the truncated-epoch
    // predicate)
    val left = Seq((1L, new Timestamp(100100))).toDF("l_id", "lts")
    val right = Seq((10L, new Timestamp(160900)), (11L, new Timestamp(160050)))
      .toDF("r_id", "rts")
    val got = RangeJoin.bucketedRangeJoin(left, right, "lts", "rts", 60, 60)
      .select("r_id").as[Long].collect().toSet
    assert(got == Set(11L)) // 160.050 - 100.100 = 59.95s <= 60 matches
  }

  test("plans as a hash join on the bin key, not a nested loop") {
    val ev = graft.Tables.events(spark, sf).select("event_id", "ts", "user_id")
    val ord = graft.Tables.orders(spark, sf).select("o_orderkey", "o_orderdate")
    val joined = RangeJoin.bucketedRangeJoin(ev, ord, "ts", "o_orderdate",
      beforeSec = 43200, afterSec = 43200)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("Join"), p.take(300))
  }
}
