package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-2 surface widening (SURVEY.md §2.D additions): statistical
  * aggregates, exact quantiles, GROUPING SETS, subqueries, LATERAL
  * VIEW, TF-IDF, a csv+json sink/source round-trip, and a
  * stream-stream interval join. Same parity rules as Core (see its
  * header): explicit aliases, BIGINT normalization, deterministic
  * total ORDER BY, rounding only where both engines compute the same
  * real number in doubles.
  */
object Extended {
  import Core.Q

  // --------------------------------------------------------------- Q-STATS
  /** Statistical aggregate battery. stddev/var/corr/covar are the
    * standard definitions in both engines; magnitudes here keep the
    * engine-order float differences far below the rounding precision
    * (checked empirically at sf0.01/sf0.1).
    */
  private val qStats: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_discount"), col("l_tax")), 8).as("covar_disc_tax"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
      .orderBy("l_returnflag")

  private val qStatsSql =
    """SELECT l_returnflag,
      |  round(stddev_samp(l_extendedprice), 4) AS sd_price,
      |  round(var_samp(l_quantity), 4) AS var_qty,
      |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
      |  round(covar_samp(l_discount, l_tax), 8) AS covar_disc_tax,
      |  min(l_extendedprice) AS min_price,
      |  max(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------ Q-QUANTILE
  /** Exact interpolated percentiles (sort-based, order-independent —
    * no decimal path needed) + median.
    */
  private val qQuantile: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 6).as("p25_price"),
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50_price"),
        round(expr("percentile(l_extendedprice, 0.75)"), 6).as("p75_price"),
        round(expr("percentile(l_quantity, 0.5)"), 6).as("med_qty"))
      .orderBy("l_linestatus")

  private val qQuantileSql =
    """SELECT l_linestatus,
      |  round(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
      |  round(quantile_cont(l_extendedprice, 0.5), 6) AS p50_price,
      |  round(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price,
      |  round(quantile_cont(CAST(l_quantity AS DOUBLE), 0.5), 6) AS med_qty
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // ------------------------------------------------------- Q-GROUPINGSETS
  /** Explicit GROUPING SETS (completes the rollup/cube family) —
    * shared-dialect SQL, same string runs in Spark and DuckDB.
    */
  private val qGroupingSetsText =
    """SELECT CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |       l_returnflag, l_linestatus,
      |       count(*) AS n_rows,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  private val qGroupingSets: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(qGroupingSetsText)
  }

  // ----------------------------------------------------------- Q-SUBQUERY
  /** Subquery battery — correlated scalar subquery, correlated EXISTS,
    * NOT IN — shared-dialect SQL.
    */
  private val qSubqueryText =
    """SELECT c.c_custkey, c.c_name,
      |  (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      |  AND c.c_custkey NOT IN (SELECT o_custkey FROM orders
      |                          WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL)
      |ORDER BY c.c_custkey""".stripMargin

  private val qSubquery: Q = (s, d) => {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(qSubqueryText)
  }

  // ------------------------------------------------------------ Q-LATERAL
  /** LATERAL VIEW posexplode — the 1→n table-generating shape of the
    * reference's subtopic extraction (SURVEY §2.A O7) as SQL surface.
    * DuckDB states it with zipped unnest/generate_subscripts.
    */
  private val qLateral: Q = (s, d) => {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(
      """SELECT doc_id, CAST(pos + 1 AS BIGINT) AS pos, tok
        |FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50)
        |LATERAL VIEW posexplode(split(text, ' ')) t AS pos, tok
        |ORDER BY doc_id, pos""".stripMargin)
  }

  private val qLateralSql =
    """SELECT doc_id, CAST(generate_subscripts(l, 1) AS BIGINT) AS pos, unnest(l) AS tok
      |FROM (SELECT doc_id, string_split(text, ' ') AS l
      |      FROM documents WHERE doc_id < 50)
      |ORDER BY doc_id, pos""".stripMargin

  // -------------------------------------------------------------- Q-TFIDF
  /** TF-IDF scoring over the documents corpus — the canonical
    * text-pipeline ranking op. idf = ln((N+1)/(df+1)) + 1 (smoothed).
    * Top-100 cut orders by the ROUNDED score with (doc_id, tok)
    * tiebreak so the boundary is engine-independent.
    */
  private val qTfidf: Q = (s, d) => {
    // tf and df both consume the exploded token stream — aggregate tf
    // FIRST, then derive df from the (doc, tok, tf) relation: one pass
    // over the big explode instead of two, and df's distinct collapses
    // to a plain count (tf already groups by (doc_id, tok)). n = corpus
    // size is a metadata-cheap count off documents (doc_id is unique;
    // split() yields >= 1 token for every row, even empty text, so
    // every doc_id survives into toks — same N the oracle computes).
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(s, d).count()
    tf.join(dfreq, "tok")
      .withColumn("tfidf", round(
        col("tf") * (log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0), 6))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"), col("tfidf"))
      .orderBy(col("tfidf").desc, col("doc_id"), col("tok"))
      .limit(100)
  }

  private val qTfidfSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
      |df AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY 1),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM toks)
      |SELECT tf.doc_id, tf.tok, tf.tf AS tf,  df.df AS df,
      |       round(tf.tf * (ln((n.n + 1.0) / (df.df + 1.0)) + 1.0), 6) AS tfidf
      |FROM tf JOIN df USING (tok) CROSS JOIN n
      |ORDER BY tfidf DESC, tf.doc_id, tf.tok LIMIT 100""".stripMargin

  // --------------------------------------------------------------- Q-SINK
  /** Sink/source round-trip: write documents (minus free text — CSV
    * newline quoting is a non-goal) as BOTH csv and json, read each
    * back with an explicit schema, aggregate. Write happens once per
    * call into a fresh temp dir (driver-side temp, not the repo).
    * Oracle = the same aggregate straight off the parquet, × 2
    * formats — so the check proves the round-trip is lossless.
    */
  private val qSinkRoundtrip: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    docs.write.mode("overwrite").json(s"$base/json")
    val csvBack = s.read.option("header", "true").schema(docs.schema).csv(s"$base/csv")
    val jsonBack = s.read.schema(docs.schema).json(s"$base/json")
    def agg(df: DataFrame, fmt: String): DataFrame = df
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .select(lit(fmt).as("fmt"), col("source"), col("n_rows"),
        col("sum_chars"), col("n_langs"))
    agg(csvBack, "csv").unionByName(agg(jsonBack, "json"))
      .orderBy("fmt", "source")
  }

  private val qSinkRoundtripSql =
    """SELECT fmt, source, count(*) AS n_rows,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
      |FROM documents CROSS JOIN (VALUES ('csv'), ('json')) t(fmt)
      |GROUP BY fmt, source ORDER BY fmt, source""".stripMargin

  // ------------------------------------------------------------- Q-CURATE
  /** The composed training-data curation pipeline as ONE declarative
    * query — quality gate → exact dedup (keep lowest doc_id per
    * content hash) → per-source quota sample (deterministic md5
    * order). Each stage is one hash shuffle on a different key
    * (filter is free); this is the end-to-end shape the individual
    * q_clean/q_dedup_exact/q_sample_stratified operators compose into.
    */
  private val qCurate: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val quality = Tables.documents(s, d)
      .filter(col("lang") === "en" && col("n_chars") >= 200 &&
        length(col("text")) > 0)
    val dedupW = Window.partitionBy(col("content_hash"))
      .orderBy(col("doc_id"))
    val deduped = quality
      .withColumn("content_hash", md5(col("text")))
      .withColumn("dup_rank", row_number().over(dedupW))
      .filter(col("dup_rank") === 1)
    val quotaW = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    deduped
      .withColumn("rk", row_number().over(quotaW).cast("long"))
      .filter(col("rk") <= 20)
      .select(col("source"), col("rk"), col("doc_id"), col("n_chars"))
      .orderBy("source", "rk")
  }

  private val qCurateSql =
    """WITH quality AS (
      |  SELECT * FROM documents
      |  WHERE lang = 'en' AND n_chars >= 200 AND length(text) > 0),
      |deduped AS (
      |  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank
      |  FROM quality),
      |sampled AS (
      |  SELECT source, doc_id, n_chars,
      |         CAST(row_number() OVER (PARTITION BY source
      |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
      |  FROM deduped WHERE dup_rank = 1)
      |SELECT source, rk, doc_id, n_chars FROM sampled
      |WHERE rk <= 20 ORDER BY source, rk""".stripMargin

  // ---------------------------------------------------- Q-STREAM-SS-JOIN
  /** Stream-stream interval join (see EventStream.intervalJoinStream);
    * bounded input + inner join ⇒ sink equals the batch join.
    */
  private val qStreamSsJoin: Q = (s, d) =>
    graft.streaming.EventStream.intervalJoinStream(s, d)

  private val qStreamSsJoinSql =
    """SELECT l.user_id, l.event_id AS signup_event, r.event_id AS purchase_event,
      |       l.ts AS signup_ts, r.ts AS purchase_ts, r.value AS purchase_value
      |FROM events l JOIN events r
      |  ON l.user_id = r.user_id
      | AND l.event_type = 'signup' AND r.event_type = 'purchase'
      | AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 2 HOUR
      |ORDER BY l.user_id, signup_event, purchase_event""".stripMargin

  // ------------------------------------------------------------------ maps
  val defs: Map[String, Q] = Map(
    "q_stats" -> qStats,
    "q_quantile" -> qQuantile,
    "q_groupingsets" -> qGroupingSets,
    "q_subquery" -> qSubquery,
    "q_lateral" -> qLateral,
    "q_tfidf" -> qTfidf,
    "q_sink_roundtrip" -> qSinkRoundtrip,
    "q_curate" -> qCurate,
    "q_stream_ss_join" -> qStreamSsJoin)

  val oracles: Map[String, String] = Map(
    "q_stats" -> qStatsSql,
    "q_quantile" -> qQuantileSql,
    "q_groupingsets" -> qGroupingSetsText,
    "q_subquery" -> qSubqueryText,
    "q_lateral" -> qLateralSql,
    "q_tfidf" -> qTfidfSql,
    "q_sink_roundtrip" -> qSinkRoundtripSql,
    "q_curate" -> qCurateSql,
    "q_stream_ss_join" -> qStreamSsJoinSql)
}
