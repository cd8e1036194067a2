package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TRAINED quality classifier (VERDICT r10 next-round #8) — the
  * model-based filter with ACTUALLY FITTED weights, completing
  * q_quality_model (which ships the hashing-trick dataflow with
  * hash-derived stand-in weights): logistic-style regression over
  * four deterministic text features, trained by full-batch gradient
  * descent, served as a durable weight artifact (the BpeTrainer
  * precedent) and scored corpus-wide.
  *
  * Why gradient descent here and not MLlib's LBFGS
  * (`ml.classification.LogisticRegression`): the driver's correctness
  * gate hash-checks every dumped cell against a DuckDB restatement,
  * and LBFGS's objective/gradient aggregation is a float treeAggregate
  * whose fold order varies with partitioning — its weights are not
  * reproducible bit-for-bit across engines (or even across cluster
  * layouts), so no exact oracle can exist for them. This trainer is
  * engineered for CROSS-ENGINE BIT-EXACTNESS instead:
  *
  *  - the link is the ALGEBRAIC sigmoid σ̃(z) = 0.5 + 0.5·z/(1+|z|)
  *    — same shape, range and monotonicity as the logistic link, but
  *    built only from IEEE-754-exact ops (+,×,÷,|·|), where libm exp
  *    differs in last ulps across engines;
  *  - each document's per-weight gradient contribution
  *    (σ̃(w·x) − y)·xⱼ is quantized to DECIMAL(30,8) and summed as
  *    decimals — exact and FOLD-ORDER-INDEPENDENT, so the distributed
  *    sum equals DuckDB's single-threaded one (the kmeans-oracle
  *    decimal-mean trick applied to gradients). Scale 8 keeps
  *    |sum|·10⁸ < 2⁵³, so the decimal→double cast is exact in both
  *    engines (the FIXTURES.md decimal-cast bound);
  *  - weight updates then run in plain doubles on identical inputs
  *    with identical op order — identical outputs.
  *
  * Training cost at scale: `iters` passes over the cached feature
  * frame, each one map-side-combined aggregation of 4 decimals — the
  * same economics as the Lloyd rounds in kmeans (linear per pass, a
  * 4-value driver state between passes).
  *
  * Features (x1..x3 scaled to comparable O(1) ranges — GD on raw
  * ratios stalls, the dominant-magnitude column eats the step) and
  * the deterministic label rule live in [[features]]; the rule is a
  * stopword-density × length gate, the q_text_quality signals.
  */
object QualityModel {

  val DefaultLr = 3.0
  val DefaultIters = 12
  val NumFeatures = 4

  private val Stopwords = Seq("the", "and", "of", "to", "in", "is", "a")

  /** (doc_id, x0..x3, y) — x0 bias, x1 tokens/100, x2 mean token
    * length /10, x3 stopword ratio ×10; y = 1 when stopword ratio
    * ≥ 0.06 AND ≥ 30 tokens (the deterministic label rule — in
    * production the labels come from human/LLM rating; the rule makes
    * the whole train restatable).
    */
  def features(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = split(col(textCol), " ")
    val nTok = size(toks)
    val stopCount = size(filter(toks, t => t.isInCollection(Stopwords)))
    val sr = stopCount.cast("double") / nTok
    docs.select(col(idCol),
      lit(1.0).as("x0"),
      (nTok.cast("double") / 100).as("x1"),
      (length(col(textCol)).cast("double") / nTok / 10).as("x2"),
      (sr * 10).as("x3"),
      when(sr >= 0.06 && nTok >= 30, lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  /** σ̃ — see the header for why not exp. */
  private def link(dot: Column): Column =
    lit(0.5) + lit(0.5) * dot / (lit(1.0) + abs(dot))

  private def dotCol(w: Array[Double]): Column =
    (0 until NumFeatures).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _)

  /** Full-batch GD from w = 0. Deterministic: same docs → same
    * weights, bit for bit, on any partitioning.
    */
  def train(docs: DataFrame, lr: Double = DefaultLr,
      iters: Int = DefaultIters): Array[Double] = {
    val f = features(docs).cache() // iters+1 passes
    try trainFeatures(f, lr, iters) finally f.unpersist()
  }

  /** [[train]] over an ALREADY-CACHED feature frame (caller holds the
    * cache) — lets train+score compositions (q_quality_trained) pay
    * the feature projection once (optimization r17).
    */
  def trainFeatures(f: DataFrame, lr: Double = DefaultLr,
      iters: Int = DefaultIters): Array[Double] = {
    {
      val n = f.count()
      require(n > 0, "cannot train on an empty corpus")
      var w = Array.fill(NumFeatures)(0.0)
      for (_ <- 0 until iters) {
        val r = link(dotCol(w)) - col("y")
        val aggs = (0 until NumFeatures).map(j =>
          sum((r * col(s"x$j")).cast(DecimalType(30, 8))).as(s"s$j"))
        val row = f.agg(aggs.head, aggs.tail: _*).collect()(0)
        w = Array.tabulate(NumFeatures)(j =>
          w(j) - lr * (row.getDecimal(j).doubleValue / n))
      }
      w
    }
  }

  /** (doc_id, score = σ̃(w·x) rounded 6dp, keep = w·x > 0, label) —
    * label echoed so an audit can read the model's agreement with the
    * rule straight off the dump.
    */
  def score(docs: DataFrame, w: Array[Double]): DataFrame =
    scoreFeatures(features(docs), w)

  /** [[score]] over a prebuilt feature frame — the [[trainFeatures]]
    * twin.
    */
  def scoreFeatures(f: DataFrame, w: Array[Double]): DataFrame = {
    require(w.length == NumFeatures)
    val dot = dotCol(w)
    f.select(col("doc_id"),
      round(link(dot), 6).as("score"),
      (dot > 0).as("keep"),
      col("y").cast("int").as("label"))
  }

  /** Durable weight artifact: (feature, weight) parquet — doubles
    * round-trip exactly.
    */
  def save(spark: SparkSession, w: Array[Double], path: String): Unit = {
    import spark.implicits._
    w.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("feature", "weight")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): Array[Double] =
    spark.read.parquet(path).orderBy("feature").collect()
      .map(_.getAs[Double]("weight"))
}
