package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.functions.VectorOps

/** Semantic invariants for the analytics surface (value-level parity
  * is the DuckDB oracle's job).
  */
class AnalyticsSpec extends SparkTestBase {

  test("funnel stage counts are monotonically non-increasing") {
    val rows = Analytics.defs("q_funnel")(spark, sf)
      .orderBy("stage").collect().map(_.getLong(1))
    assert(rows.length == 3)
    assert(rows.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("retention: offset 0 exists for every cohort day and bounds hold") {
    val df = Analytics.defs("q_retention")(spark, sf).cache()
    try {
      val offsets = df.select("offset").distinct().collect().map(_.getLong(0))
      assert(offsets.forall(o => o >= 0 && o <= 7))
      // every cohort day has day-0 activity (the signup event itself)
      val cohorts = df.select("cohort_day").distinct().count()
      val atZero = df.filter(col("offset") === 0).count()
      assert(atZero == cohorts)
    } finally df.unpersist()
  }

  test("pii: redacted text contains no email/phone/name patterns") {
    val df = Analytics.defs("q_pii")(spark, sf)
    val leaked = df.filter(
      col("redacted").rlike("[A-Za-z0-9.]+@[A-Za-z0-9.]+") ||
      col("redacted").rlike("555-[0-9]{4}") ||
      col("redacted").rlike("Customer#[0-9]+")).count()
    assert(leaked == 0)
    // and every row had at least one of each synthesized PII kind
    assert(df.filter(col("n_emails") < 1 || col("n_phones") < 1).count() == 0)
    assert(df.filter(!col("redacted").contains("<EMAIL>") ||
      !col("redacted").contains("<PHONE>") ||
      !col("redacted").contains("<NAME>")).count() == 0)
  }

  test("knn join: TopKAgg result equals the row_number-window brute force") {
    val emb = Tables.embeddings(spark, sf)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val scored = corpus.join(broadcast(probes))
      .withColumn("cos", VectorOps.cosine(col("qvec"), col("cvec")))
      .filter(col("cos").isNotNull)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid"))
    val brute = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("qid"), col("rk"), col("cid"), round(col("cos"), 6).as("cosine"))
    val agg = Analytics.defs("q_knn_join")(spark, sf)
    assert(agg.exceptAll(brute).isEmpty && brute.exceptAll(agg).isEmpty)
  }

  test("knn join: exactly 5 hits per probe, cosine non-increasing in rank") {
    val df = Analytics.defs("q_knn_join")(spark, sf).cache()
    try {
      val perProbe = df.groupBy("qid").count().select("count")
        .distinct().collect().map(_.getLong(0))
      assert(perProbe.sameElements(Array(5L)))
      val bad = df.withColumn("prev",
          lag(col("cosine"), 1).over(
            Window.partitionBy("qid").orderBy("rk")))
        .filter(col("prev").isNotNull && col("cosine") > col("prev"))
      assert(bad.count() == 0)
    } finally df.unpersist()
  }

  test("unpivot emits one row per (group, metric)") {
    val df = Analytics.defs("q_unpivot")(spark, sf)
    val flags = Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct().count()
    assert(df.count() == flags * 3)
    assert(df.select("metric").distinct().count() == 3)
  }

  test("hll: per-source and merged estimates land within DataSketches error bounds") {
    // bounds live IN the query since round 8 (est_ok column, stated
    // TRUE by the oracle) — assert every flag including the merged
    // __global__ row, whose exact count is now computed too
    val rows = Analytics.defs("q_hll")(spark, sf).collect()
    val perSource = rows.filter(_.getString(0) != "__global__")
    assert(perSource.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("est_ok"),
        s"${r.getString(0)}: estimate out of max(2, 5%) bound")
    }
    val global = rows.find(_.getString(0) == "__global__").get.getLong(1)
    // global exact distinct covers every per-source vocabulary
    assert(global >= perSource.map(_.getLong(1)).max && global <= 40,
      s"global exact $global implausible")
  }

  test("scd2: exactly one current row per customer, intervals chain without overlap") {
    val df = Analytics.defs("q_scd2")(spark, sf).cache()
    try {
      val customers = df.select("o_custkey").distinct().count()
      assert(df.filter(col("is_current")).count() == customers)
      // valid_from <= valid_to on every closed interval
      assert(df.filter(col("valid_to").isNotNull &&
        col("valid_from") > col("valid_to")).count() == 0)
      // each closed interval's valid_to equals the next row's valid_from
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("valid_from"), col("o_orderkey"))
      val broken = df
        .withColumn("next_from", lead(col("valid_from"), 1).over(w))
        .filter(col("valid_to").isNotNull &&
          col("valid_to") =!= col("next_from")).count()
      assert(broken == 0)
    } finally df.unpersist()
  }

  test("repetition: fractions live in (0,1] and planted exact dups agree pairwise") {
    val df = Analytics.defs("q_repetition")(spark, sf).cache()
    try {
      assert(df.count() == Tables.documents(spark, sf).count())
      assert(df.filter(col("top_word_frac") <= 0 || col("top_word_frac") > 1 ||
        col("dup_2gram_frac") < 0 || col("dup_2gram_frac") >= 1).count() == 0)
      // identical texts must produce identical signals
      val dupPair = Tables.documents(spark, sf)
        .groupBy("text").agg(collect_list("doc_id").as("ids"))
        .filter(size(col("ids")) >= 2)
        .select(explode(col("ids")).as("doc_id"), md5(col("text")).as("h"))
      val distinctSignals = df.join(dupPair, "doc_id")
        .select("h", "top_word_frac", "dup_2gram_frac").distinct()
        .groupBy("h").count().filter(col("count") > 1).count()
      assert(distinctSignals == 0)
    } finally df.unpersist()
  }

  test("boilerplate: chunk accounting conserves, untouched docs hash to their own text") {
    val df = Analytics.defs("q_boilerplate")(spark, sf).cache()
    try {
      assert(df.filter(col("n_kept") > col("n_chunks")).count() == 0)
      // the planted duplicate docs lose chunks; most docs keep all
      assert(df.filter(col("n_kept") < col("n_chunks")).count() > 0)
      val untouched = df.filter(col("n_kept") === col("n_chunks"))
      val expect = Tables.documents(spark, sf)
        .select(col("doc_id"), md5(col("text")).as("expect_hash"))
      val mismatched = untouched.join(expect, "doc_id")
        .filter(col("clean_hash") =!= col("expect_hash")).count()
      assert(mismatched == 0)
    } finally df.unpersist()
  }
}
