package graft.plans

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.AsOfJoin

class AsOfJoinNativeSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 100.0),
    (1L, ts("2024-01-01 10:05:00"), 101.0),
    (1L, ts("2024-01-01 10:10:00"), 102.0),
    (2L, ts("2024-01-01 09:00:00"), 50.0)
  ).toDF("k", "ts", "price")

  private val trades = Seq(
    (1L, ts("2024-01-01 10:03:00")), // matches 10:00 quote
    (1L, ts("2024-01-01 10:05:00")), // equal ts matches the 10:05 quote
    (1L, ts("2024-01-01 09:59:00")), // before all quotes: null
    (2L, ts("2024-01-01 23:00:00")), // matches the only key-2 quote
    (3L, ts("2024-01-01 10:00:00"))  // key with no quotes: null
  ).toDF("k", "ts")

  test("native as-of matches hand-computed semantics incl. ties and misses") {
    val out = AsOfJoin.backwardNative(trades, quotes, "k", "ts", Seq("price"))
      .select(col("k"), col("ts"), col("asof_price"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(out == Set(
      (1L, "2024-01-01 10:03:00.0", 100.0),
      (1L, "2024-01-01 10:05:00.0", 101.0),
      (1L, "2024-01-01 09:59:00.0", null),
      (2L, "2024-01-01 23:00:00.0", 50.0),
      (3L, "2024-01-01 10:00:00.0", null)))
  }

  test("the plan contains the custom physical operator (one exchange+sort per side)") {
    val out = AsOfJoin.backwardNative(trades, quotes, "k", "ts", Seq("price"))
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), s"native node missing:\n$physical")
    // the union+window form would show a Window; the native one must not
    assert(!physical.contains("Window"), s"window leaked into plan:\n$physical")
  }

  test("native and composed forms agree on the events table") {
    val ev = Tables.events(spark, sf)
    val left = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    // dedup right (key, ts) — tie order is engine-defined otherwise
    val right = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("value"))
    val native = AsOfJoin.backwardNative(left, right, "user_id", "ts", Seq("value"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    val composed = AsOfJoin.backward(left, right, "user_id", "ts", Seq("value"))
      .select(col("event_id"), col("asof_ts"), col("asof_value"))
    assert(native.count() == left.count())
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty)
  }

  test("property: native as-of equals per-row brute force on random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    val sideGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(0, 40)
      ks <- Gen.listOfN(n, Gen.choose(1L, 5L))
      ts <- Gen.listOfN(n, Gen.choose(0L, 30L))
    } yield ks.zip(ts)

    for (i <- 0 until 10) {
      val lRows = sample(sideGen, 100L + i)
      // dedup right (key, ts) — tie order is engine-defined
      val rRows = sample(sideGen, 200L + i).distinct
        .groupBy(identity).keys.toList
      val l = lRows.zipWithIndex
        .map { case ((k, t), id) => (id.toLong, k, new Timestamp(t * 1000)) }
        .toDF("id", "k", "ts")
      val r = rRows.map { case (k, t) =>
        (k, new Timestamp(t * 1000), k * 1000 + t) }.toDF("k", "ts", "v")
      val got = AsOfJoin.backwardNative(l, r, "k", "ts", Seq("v"))
        .select(col("id"), col("asof_v"))
        .collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) None else Some(x.getLong(1))))
        .toMap
      val expect = lRows.zipWithIndex.map { case ((k, t), id) =>
        val best = rRows.filter(rr => rr._1 == k && rr._2 <= t)
          .sortBy(_._2).lastOption.map(rr => rr._1 * 1000 + rr._2)
        id.toLong -> best
      }.toMap
      assert(got == expect, s"iteration $i mismatch")
    }
  }

  test("a null-intolerant filter on right columns above the join still plans " +
      "(EliminateOuterJoin can no longer flip the marker join before the rewrite)") {
    // regression: as an optimizer rule, the rewrite raced EliminateOuterJoin —
    // this filter is null-intolerant on the right side, so the optimizer
    // would flip left_outer→inner first and the rewrite's require aborted
    // the query. As a post-hoc resolution rule the Join is gone before any
    // join-type elimination runs.
    val out = AsOfJoin.backwardNative(trades, quotes, "k", "ts", Seq("price"))
      .filter(col("asof_price").isNotNull)
    val physical = out.queryExecution.executedPlan.toString
    assert(physical.contains("AsOfJoin"), s"native node missing:\n$physical")
    assert(out.count() == 3) // the two miss rows are filtered
    assert(out.filter(col("asof_price").isNull).count() == 0)
  }

  test("null keys and null times on the left emit null matches, not crashes") {
    val l = Seq(
      (Some(1L), Some(ts("2024-01-01 10:03:00"))),
      (None, Some(ts("2024-01-01 10:03:00"))),
      (Some(1L), None)
    ).toDF("k", "ts")
    val out = AsOfJoin.backwardNative(l, quotes, "k", "ts", Seq("price"))
    assert(out.count() == 3)
    assert(out.filter(col("k").isNull && col("asof_price").isNotNull).count() == 0)
    assert(out.filter(col("ts").isNull && col("asof_price").isNotNull).count() == 0)
    assert(out.filter(col("k") === 1L && col("ts").isNotNull)
      .head().getAs[Double]("asof_price") == 100.0)
  }
}
