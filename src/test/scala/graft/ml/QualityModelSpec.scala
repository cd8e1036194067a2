package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Trained quality gate: determinism (GD is decimal-exact, so two
  * runs agree bit-for-bit), a real learning signal (accuracy against
  * the label rule well above the majority class), an independent
  * in-memory GD reference, and the artifact round-trip.
  */
class QualityModelSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sf)

  test("training is deterministic and the artifact round-trips exactly") {
    val w1 = QualityModel.train(docs)
    val w2 = QualityModel.train(docs.repartition(7)) // fold-order proof
    assert(w1.toSeq == w2.toSeq,
      "decimal-quantized gradient sums must make training partition-invariant")
    val dir = java.nio.file.Files.createTempDirectory("quality_model").toFile
    dir.deleteOnExit()
    QualityModel.save(spark, w1, s"${dir.getAbsolutePath}/weights")
    assert(QualityModel.load(spark, s"${dir.getAbsolutePath}/weights").toSeq
      == w1.toSeq)
  }

  test("the model actually learns the rule (accuracy beats the majority class)") {
    val w = QualityModel.train(docs)
    val scored = QualityModel.score(docs, w)
    val (correct, total, positives) = scored.select(
      sum(when(col("keep") === (col("label") === 1), 1L).otherwise(0L)),
      count(lit(1)), sum(col("label").cast("long")))
      .as[(Long, Long, Long)].head()
    val acc = correct.toDouble / total
    val majority = math.max(positives, total - positives).toDouble / total
    assert(acc >= 0.75 && acc > majority,
      f"trained accuracy $acc%.3f should beat majority $majority%.3f")
  }

  test("distributed GD equals an in-memory reference on the same features") {
    val feats = QualityModel.features(docs).orderBy("doc_id")
      .as[(Long, Double, Double, Double, Double, Double)].collect()
    def sig(z: Double) = 0.5 + 0.5 * z / (1.0 + math.abs(z))
    var w = Array.fill(4)(0.0)
    val n = feats.length
    for (_ <- 0 until QualityModel.DefaultIters) {
      val sums = Array.fill(4)(BigDecimal(0))
      feats.foreach { case (_, x0, x1, x2, x3, y) =>
        val dot = w(0) * x0 + w(1) * x1 + w(2) * x2 + w(3) * x3
        val r = sig(dot) - y
        val xs = Array(x0, x1, x2, x3)
        for (j <- 0 until 4)
          sums(j) += BigDecimal(r * xs(j))
            .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }
      w = Array.tabulate(4)(j =>
        w(j) - QualityModel.DefaultLr * (sums(j).toDouble / n))
    }
    assert(QualityModel.train(docs).toSeq == w.toSeq)
  }
}
