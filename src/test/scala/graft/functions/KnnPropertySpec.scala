package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized cross-checks for the kNN building blocks: the native
  * cosine kernel against a same-fold-order Scala reference, and the
  * TopKAgg grouped top-k against the window formulation, on random
  * vector sets (drives Gens manually — scalatestplus isn't in the
  * offline cache).
  */
class KnnPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def vecGen(dim: Int): Gen[Seq[Float]] =
    Gen.listOfN(dim, Gen.choose(-100, 100).map(_ / 10.0f)).map(_.toSeq)

  private def refCosine(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    var d = 0.0; var sa = 0.0; var sb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      d += x * y; sa += x * x; sb += y * y
    }
    val denom = math.sqrt(sa) * math.sqrt(sb)
    if (denom == 0.0) None else Some(d / denom)
  }

  test("property: native cosine kernel matches the Scala fold bit-exactly") {
    val dims = Seq(1, 3, 8, 64)
    dims.foreach { dim =>
      val pairs = (0 until 25).map { i =>
        (vecGen(dim).pureApply(Gen.Parameters.default, Seed(100L * dim + i)),
          vecGen(dim).pureApply(Gen.Parameters.default, Seed(200L * dim + i)))
      }
      val got = pairs.toDF("a", "b")
        .select(VectorOps.cosine(
          col("a").cast("array<float>"), col("b").cast("array<float>")).as("c"))
        .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val want = pairs.map { case (a, b) => refCosine(a, b) }
      got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
        assert(g == w, s"dim=$dim pair=$i") // == : bit-exact, no tolerance
      }
    }
  }

  test("property: grouped TopKAgg knn equals window brute force on random vectors") {
    (0 until 5).foreach { trial =>
      val dim = 4 + trial
      val nProbe = 3 + trial
      val nCorpus = 30 + 10 * trial
      def v(seed: Long) = vecGen(dim).pureApply(Gen.Parameters.default, Seed(seed))
      val probes = (0 until nProbe)
        .map(i => (i.toLong, v(3000L + 17L * trial + i))).toDF("qid", "qvec")
        .withColumn("qvec", col("qvec").cast("array<float>"))
      val corpus = (0 until nCorpus)
        .map(i => (i.toLong, v(7000L + 31L * trial + i))).toDF("cid", "cvec")
        .withColumn("cvec", col("cvec").cast("array<float>"))
      val k = 1 + trial % 4
      val scored = corpus.join(broadcast(probes))
        .withColumn("cos", VectorOps.cosine(col("qvec"), col("cvec")))
        .filter(col("cos").isNotNull)
      val viaAgg = scored.groupBy(col("qid"))
        .agg(TopKAgg.topK(k)(col("cos"), col("cid")).as("top"))
        .select(col("qid"), explode(col("top")).as("t"))
        .select(col("qid"), col("t._1").as("cos"), col("t._2").as("cid"))
        .as[(Long, Double, Long)].collect().toSet
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("cid"))
      val viaWin = scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k)
        .select(col("qid"), col("cos"), col("cid"))
        .as[(Long, Double, Long)].collect().toSet
      assert(viaAgg == viaWin, s"trial=$trial k=$k")
    }
  }
}
