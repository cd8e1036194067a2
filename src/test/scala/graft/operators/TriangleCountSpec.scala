package graft.operators

import graft.SparkTestBase

class TriangleCountSpec extends SparkTestBase {
  import spark.implicits._

  test("known graphs: K4 has 4 triangles, a path has 0, a pendant adds none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    assert(TriangleCount.count(k4) == 4)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    assert(TriangleCount.count(path) == 0)
    val pendant = k4.union(Seq((4L, 9L)).toDF("u", "v"))
    assert(TriangleCount.count(pendant) == 4)
  }

  test("non-broadcast branch: same counts, session conf untouched") {
    // force the shuffled fallback (the branch that widens the
    // array-carrying exchanges): results must match the broadcast
    // path and the widening must be invisible to the session conf —
    // it is explicit repartitioning now, not a conf save/restore
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    spark.conf.set("spark.graft.triangles.broadcastMaxEdges", "1")
    try assert(TriangleCount.stats(k4) == ((6L, 4L)))
    finally spark.conf.unset("spark.graft.triangles.broadcastMaxEdges")
    assert(spark.conf.get("spark.sql.shuffle.partitions") == before)
  }

  test("normalization: duplicates, reversed edges, self-loops don't change the count") {
    val messy = Seq(
      (1L, 2L), (2L, 1L), (1L, 2L),   // duplicate + reversed
      (2L, 3L), (3L, 1L),
      (2L, 2L)                        // self-loop
    ).toDF("u", "v")
    assert(TriangleCount.count(messy) == 1)
    assert(TriangleCount.countNaive(messy) == 1)
  }

  test("sorted-intersect kernel: duplicates once, empty/disjoint zero, matches array_intersect") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(2L, 3L, 4L), 2),
      (Seq(1L, 1L, 2L, 2L), Seq(1L, 2L), 2),    // dups count once
      (Seq.empty[Long], Seq(1L, 2L), 0),
      (Seq(1L, 2L), Seq(3L, 4L), 0)
    ).toDF("a", "b", "expect")
    val bad = df.filter(
      call_function("graft_sorted_isect_count", col("a"), col("b")) =!= col("expect") ||
      call_function("graft_sorted_isect_count", col("a"), col("b")) =!=
        size(array_intersect(col("a"), col("b")))).count()
    assert(bad == 0)
  }

  test("oriented count matches the naive 3-join on a skewed random graph") {
    val rnd = new scala.util.Random(7)
    // hub-skewed: node 0 connects widely (the naive killer shape)
    val edges = ((1 to 60).map(i => (0L, i.toLong)) ++
      (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)))
      .toDF("u", "v")
    assert(TriangleCount.count(edges) == TriangleCount.countNaive(edges))
  }
}
