package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def t(s: Long) = new Timestamp(s * 1000)

  private lazy val left = Seq(
    (1L, t(10), "l1"), (1L, t(20), "l2"), (1L, t(5), "l0"),
    (2L, t(10), "l3")).toDF("k", "ts", "name")
  private lazy val right = Seq(
    (1L, t(8), 100.0), (1L, t(20), 200.0), (3L, t(1), 999.0))
    .toDF("k", "ts", "px")

  test("backward as-of picks the latest right row at or before each left ts") {
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("px"))
      .select("name", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("l0").isEmpty)        // before any right row
    assert(out("l1").contains(100.0)) // 8 <= 10
    assert(out("l2").contains(200.0)) // equal ts matches (>=)
    assert(out("l3").isEmpty)        // key with no right rows
  }

  test("tolerance nulls out stale matches") {
    val out = AsOfJoin.backward(left, right, "k", "ts", Seq("px"),
      tolerance = Some(expr("INTERVAL 1 SECOND")))
      .select("name", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("l1").isEmpty)         // age 2s > 1s
    assert(out("l2").contains(200.0)) // age 0
  }

  test("forward as-of picks the earliest right row at or after each left ts") {
    val out = AsOfJoin.forward(left, right, "k", "ts", Seq("px"))
      .select("name", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("l0").contains(100.0)) // 8 >= 5, the earliest ahead
    assert(out("l1").contains(200.0)) // 20 >= 10 (8 is behind)
    assert(out("l2").contains(200.0)) // equal ts matches (<=)
    assert(out("l3").isEmpty)         // key with no right rows
  }

  test("forward tolerance nulls out matches too far ahead") {
    val out = AsOfJoin.forward(left, right, "k", "ts", Seq("px"),
      tolerance = Some(expr("INTERVAL 5 SECOND")))
      .select("name", "asof_px").as[(String, Option[Double])].collect().toMap
    assert(out("l0").contains(100.0)) // 3s ahead, inside 5s
    assert(out("l1").isEmpty)         // 10s ahead > 5s
    assert(out("l2").contains(200.0)) // 0s ahead
  }

  test("matches a driver-side brute force on real events") {
    val ev = graft.Tables.events(spark, sf)
    val lft = ev.filter(col("event_type") =!= "signup")
      .select("event_id", "user_id", "ts")
    val rgt = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("signup_id"))
    val got = AsOfJoin.backward(lft, rgt, "user_id", "ts", Seq("signup_id"))
      .select("event_id", "asof_signup_id").as[(Long, Option[Long])].collect().toMap
    val rightRows = rgt.select("user_id", "ts", "signup_id")
      .as[(Long, Timestamp, Long)].collect()
    val leftRows = lft.as[(Long, Long, Timestamp)].collect()
    leftRows.foreach { case (eid, uid, ts) =>
      val expected = rightRows.filter(r => r._1 == uid && !r._2.after(ts))
        .sortBy(r => (r._2.getTime, r._2.getNanos)).lastOption.map(_._3)
      assert(got(eid) == expected, s"event $eid")
    }
  }

  test("forward matches a driver-side brute force on real events") {
    val ev = graft.Tables.events(spark, sf)
    val lft = ev.filter(col("event_type") === "signup")
      .select("event_id", "user_id", "ts")
    val rgt = ev.filter(col("event_type") =!= "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("next_id"))
    val got = AsOfJoin.forward(lft, rgt, "user_id", "ts", Seq("next_id"))
      .select("event_id", "asof_next_id").as[(Long, Option[Long])].collect().toMap
    val rightRows = rgt.select("user_id", "ts", "next_id")
      .as[(Long, Timestamp, Long)].collect()
    val leftRows = lft.as[(Long, Long, Timestamp)].collect()
    leftRows.foreach { case (eid, uid, ts) =>
      val expected = rightRows.filter(r => r._1 == uid && !r._2.before(ts))
        .sortBy(r => (r._2.getTime, r._2.getNanos)).headOption.map(_._3)
      assert(got(eid) == expected, s"event $eid")
    }
  }
}
