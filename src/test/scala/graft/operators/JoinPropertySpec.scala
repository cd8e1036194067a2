package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property checks: the scalable join formulations equal brute force
  * on randomly generated (seeded, reproducible) inputs — sub-second
  * timestamps included, since that precision has bitten before.
  */
class JoinPropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(1042L + i)))

  private val tsGen: Gen[Timestamp] =
    Gen.choose(0L, 500000L).map(ms => new Timestamp(ms))

  private val tableGen: Gen[(List[(Long, Timestamp)], List[(Long, Timestamp)])] = for {
    nl <- Gen.choose(1, 25)
    nr <- Gen.choose(1, 25)
    lts <- Gen.listOfN(nl, tsGen)
    rts <- Gen.listOfN(nr, tsGen)
  } yield (lts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
    rts.zipWithIndex.map { case (t, i) => (i + 1000L, t) })

  test("bucketed range join equals brute force on random sub-second data") {
    for (((l, r), k) <- samples(tableGen, 10).zipWithIndex) {
      val left = l.toDF("l_id", "lts")
      val right = r.toDF("r_id", "rts")
      val before = 30L + k
      val after = 45L + k
      val got = RangeJoin.bucketedRangeJoin(left, right, "lts", "rts", before, after)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      val brute = l.flatMap { case (lid, lt) =>
        r.filter { case (_, rt) =>
          rt.getTime >= lt.getTime - before * 1000 && rt.getTime <= lt.getTime + after * 1000
        }.map { case (rid, _) => (lid, rid) }
      }.toSet
      assert(got == brute, s"sample $k")
    }
  }

  private val asofGen: Gen[(List[(Long, Long, Timestamp)], List[(Long, Long, Timestamp, Double)])] = for {
    nl <- Gen.choose(1, 30)
    nr <- Gen.choose(0, 20)
    lks <- Gen.listOfN(nl, Gen.choose(1L, 3L))
    lts <- Gen.listOfN(nl, tsGen)
    rks <- Gen.listOfN(nr, Gen.choose(1L, 3L))
    rts <- Gen.listOfN(nr, tsGen)
  } yield (
    lks.zip(lts).zipWithIndex.map { case ((key, t), i) => (i.toLong, key, t) },
    rks.zip(rts).zipWithIndex.map { case ((key, t), i) => (i + 500L, key, t, i * 1.5) })

  test("as-of join equals brute force on random keyed data") {
    for (((l, r), k) <- samples(asofGen, 10).zipWithIndex) {
      // dedup right (key, ts) like the operator contract requires
      val rDedup = r.groupBy(x => (x._2, x._3)).values.map(_.maxBy(_._1)).toList
      val left = l.toDF("lid", "k", "ts")
      val right = rDedup.map(x => (x._2, x._3, x._4)).toDF("k", "ts", "px")
      val got = AsOfJoin.backward(left, right, "k", "ts", Seq("px"))
        .select("lid", "asof_px").as[(Long, Option[Double])].collect().toMap
      l.foreach { case (lid, key, lt) =>
        val expected = rDedup.filter(x => x._2 == key && !x._3.after(lt))
          .sortBy(x => (x._3.getTime, x._3.getNanos)).lastOption.map(_._4)
        assert(got(lid) == expected, s"sample $k lid $lid")
      }
    }
  }
}
