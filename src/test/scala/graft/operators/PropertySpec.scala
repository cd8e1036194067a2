package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Property-based invariants (SURVEY.md §5.2(4)) for the two
  * order-sensitive operators, against generated inputs (scalacheck
  * Gens drawn from fixed seeds — deterministic, no scalatestplus
  * bridge needed offline):
  *
  * Segmentation (vs a reference single-pass fold):
  *  - every row at/after its key's first marker lands in exactly one
  *    segment; rows before are dropped;
  *  - segment ids are the running marker count (monotone, start at 1).
  *
  * Batching:
  *  - Σ batch sizes = input size;
  *  - every batch is exactly `size` except possibly the last
  *    (reference slice semantics, syllabus_ai_graph.py:163-173);
  *  - batch ids are contiguous from 0;
  *  - the scalable formulation equals the window formulation.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val rowsGen: Gen[List[(Long, Long, Boolean)]] = for {
    n <- Gen.choose(0, 60)
    keys <- Gen.listOfN(n, Gen.choose(1L, 4L))
    marks <- Gen.listOfN(n, Gen.prob(0.25))
  } yield keys.zip(marks).zipWithIndex.map { case ((k, m), i) => (k, i.toLong, m) }

  test("segmentation invariants hold for arbitrary inputs") {
    for (rows <- samples(rowsGen, 15)) {
      val df = rows.toDF("k", "ord", "is_marker")
      val got = Segmentation.segment(df, col("k"), col("is_marker"), col("ord"))
        .select("k", "ord", "segment").as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        var seg = 0L
        rs.sortBy(_._2).flatMap { case (_, ord, m) =>
          if (m) seg += 1
          if (seg >= 1) Some((k, ord) -> seg) else None
        }
      }
      assert(got == expected)
    }
  }

  private val batchGen: Gen[(List[Long], Int)] = for {
    n <- Gen.choose(1, 50)
    ids <- Gen.listOfN(n, Gen.choose(0L, 1000000L))
    size <- Gen.choose(1, 7)
  } yield (ids.distinct, size)

  test("batching invariants hold for arbitrary inputs") {
    for ((ids, size) <- samples(batchGen, 15)) {
      val df = ids.toDF("id")
      val counts = Batching.withBatchId(df, size, col("id"))
        .groupBy("batch_id").count()
        .as[(Long, Long)].collect().sortBy(_._1)
      assert(counts.map(_._2).sum == ids.size)
      assert(counts.map(_._1).toSeq == counts.indices.map(_.toLong))
      counts.dropRight(1).foreach { case (_, c) => assert(c == size) }
      counts.lastOption.foreach { case (_, c) => assert(c <= size && c >= 1) }
    }
  }

  test("scalable batch ids equal the window formulation for arbitrary inputs") {
    for ((ids, size) <- samples(batchGen, 8)) {
      val df = ids.toDF("id")
      val a = Batching.withBatchId(df, size, col("id"))
        .select("id", "batch_id").as[(Long, Long)].collect().toMap
      val b = Batching.withBatchIdScalable(df, size, col("id"))
        .select("id", "batch_id").as[(Long, Long)].collect().toMap
      assert(a == b)
    }
  }
}
