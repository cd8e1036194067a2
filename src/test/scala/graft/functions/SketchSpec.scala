package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  private def u(s: String) = UTF8String.fromString(s)

  test("cms never underestimates and is exact without collisions") {
    val cms = Sketches.CountMinSketch.empty(4, 1024)
    (1 to 50).foreach(i => (1 to i).foreach(_ => cms.add(u(s"key$i"))))
    (1 to 50).foreach { i =>
      val est = cms.estimate(u(s"key$i"))
      assert(est >= i, s"key$i underestimated: $est < $i")
      // 50 keys in 1024 slots × 4 rows: collisions essentially absent
      assert(est == i, s"key$i overestimated: $est != $i")
    }
    assert(cms.estimate(u("never-seen")) == 0)
  }

  test("serialize round-trips") {
    val cms = Sketches.CountMinSketch.empty(3, 64)
    Seq("a", "b", "a").foreach(s => cms.add(u(s)))
    val back = Sketches.CountMinSketch.deserialize(cms.serialize)
    assert(back.depth == 3 && back.width == 64)
    assert(back.estimate(u("a")) == 2 && back.estimate(u("b")) == 1)
  }

  test("distributed build sums partials (linear sketch)") {
    // zipf-ish stream: key k appears 1000/k times
    val rows = (1 to 100).flatMap(k => Seq.fill(1000 / k)(s"k$k"))
    val df = spark.sparkContext.parallelize(rows, 8).toDF("w")
    val cms = Sketches.CountMinSketch.deserialize(
      Sketches.build(df, "w", depth = 4, width = 4096))
    (1 to 100).foreach { k =>
      assert(cms.estimate(u(s"k$k")) >= 1000 / k)
    }
  }

  test("heavy-hitter pruning on a zipf stream loses no true heavy hitter") {
    val rows = (1 to 200).flatMap(k => Seq.fill(2000 / k)(s"k$k"))
    val total = rows.size
    val threshold = total / 50 // 2%
    val df = spark.sparkContext.parallelize(rows, 8).toDF("w")
    val sketch = Sketches.build(df, "w", depth = 4, width = 4096)
    val candidates = df.distinct()
      .filter(Sketches.estimate(sketch, col("w")) >= threshold)
      .as[String].collect().toSet
    val exact = rows.groupBy(identity).view.mapValues(_.size)
      .filter(_._2 >= threshold).keySet
    assert(exact.subsetOf(candidates), "a true heavy hitter was pruned")
    // and the tail is actually pruned (that's the point of the sketch)
    assert(candidates.size < 200 / 2,
      s"sketch kept ${candidates.size} of 200 keys — no pruning")
  }

  test("graft_cms_estimate rejects a non-foldable sketch side") {
    val df = Seq((Array[Byte](1), "x")).toDF("s", "k")
    val e = intercept[Exception] {
      df.select(call_function("graft_cms_estimate", col("s"), col("k"))).collect()
    }
    assert(e.getMessage.contains("foldable"))
  }
}
