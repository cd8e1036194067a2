package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.dedup.Dedup
import graft.operators.ShortestPaths

/** Round-8 corpus-analysis batch: vocabulary construction with
  * coverage accounting, PMI token co-occurrence, incremental ingest
  * dedup (batch + its streaming twin), the iterative graph family
  * (bounded-hop BFS, weighted Bellman-Ford SSSP, label-propagation
  * communities), item-item co-occurrence recommendations, the
  * statistics trio (PSI drift, Welch's t A/B test, chi-square
  * independence), full-outer reconciliation, deterministic
  * mixing-weight sampling, first/last-touch attribution, and the
  * streaming EWMA anomaly query. Same driver contract as the other
  * query modules: every entry has a DuckDB oracle, float parity
  * rules per the queries/Core.scala header.
  */
object Corpus {
  import Core.Q

  // ---------------------------------------------------------------- Q-VOCAB
  /** Vocabulary construction — the first step of any tokenizer /
    * vocab pipeline: token frequencies over the corpus, the top-200
    * vocabulary by (count desc, token), and the cumulative fraction
    * of all token OCCURRENCES the vocabulary prefix covers (the
    * "coverage@N" curve vocab sizing is decided from).
    *
    * Scale shape: one shuffle for the token counts (map-side partial
    * aggregation does the heavy lifting — the domain is the vocab,
    * not the corpus), then TakeOrdered for the top-200 (distributed
    * heap-k, NO single-partition global sort of the vocab), and only
    * the 200 surviving rows enter the rank/cumsum window — a bounded
    * single-partition frame by construction.
    */
  private val qVocab: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).cast("double").as("tot"))
    val top = counts.orderBy(col("cnt").desc, col("token")).limit(200)
    val w = Window.orderBy(col("cnt").desc, col("token"))
    top.crossJoin(tot)
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("coverage", round(
        sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("double") / col("tot"), 6))
      .select(col("rank"), col("token"), col("cnt"), col("coverage"))
      .orderBy(col("rank"))
  }

  private val qVocabSql =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
      |t AS (SELECT token, count(*) AS cnt FROM toks
      |      WHERE len(token) > 0 GROUP BY token),
      |tot AS (SELECT CAST(sum(cnt) AS DOUBLE) AS tot FROM t),
      |top AS (SELECT token, cnt FROM t ORDER BY cnt DESC, token LIMIT 200)
      |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rank,
      |       token, cnt,
      |       round(CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |             / (SELECT tot FROM tot), 6) AS coverage
      |FROM top ORDER BY rank""".stripMargin

  // ------------------------------------------------------------ Q-BPE-TRAIN
  /** Trained BPE tokenizer ([[graft.ml.BpeTrainer]], Sennrich et al.
    * 2016) — the vocab-CONSTRUCTION loop q_text_bpe's fixed
    * segmentation lacked (VERDICT r8 missing #3): 20 rounds of
    * weighted adjacent-pair counting over the word-type table, best
    * merge by (count desc, left, right), greedy re-segmentation via
    * one literal `replace` per round on the marked-string state.
    * Output is the learned merge table itself — the artifact a
    * tokenizer ships. The oracle unrolls all 20 rounds as
    * p/b/s CTE triples built by the same loop (the q_pagerank
    * pattern) using DuckDB's own `replace`, which shares Spark's
    * left-to-right non-overlapping semantics, so every round's
    * argmax and re-segmentation is hash-checked, not approximated.
    */
  private val bpeRounds = 20

  /** Trained MERGES per dataset dir — plain Scala data, the durable
    * tokenizer artifact. Only the merges are cached: the consuming
    * queries rebuild the word-type segmentation as a lazy plan
    * ([[graft.ml.BpeTrainer.segmentationFor]]) per execution. A
    * cached checkpoint-backed frame here died the first time a
    * DIFFERENT query read it in a bench pass — the between-query
    * cache scrub unpersists every RDD, and a scrubbed localCheckpoint
    * is unrecoverable. Training is deterministic, so reuse is safe,
    * and the bench prices apply/segment as themselves, not + retrain.
    *
    * The merges round-trip through [[graft.ml.BpeTrainer.save]]/
    * [[graft.ml.BpeTrainer.load]] on first train (the IvfIndex bench
    * precedent, [[TrainingData.benchScratchDir]]): consuming queries
    * read the DURABLE parquet artifact, not trainer closure state —
    * the exact path a second cluster/JVM would take.
    */
  private val bpeTrained = scala.collection.concurrent.TrieMap
    .empty[String, Seq[graft.ml.BpeTrainer.Merge]]

  /** Drop the trained-merges cache — for harnesses that must time the
    * TRAINING itself (ScaleRehearsal's q_bpe_train row: with the cache
    * in place, a min-of-2 in one JVM always times the post-cache pass,
    * a toDF over 20 cached tuples — ADVICE r9).
    */
  private[graft] def clearBpeCache(): Unit = bpeTrained.clear()

  /** ONE scratch dir per dataset, reused across retrains — the bench
    * override and the rehearsal clear [[bpeTrained]] before every
    * timed pass, and minting a fresh benchScratchDir per retrain
    * stacked a temp dir + a JVM shutdown hook per pass (save uses
    * overwrite mode, so reuse is safe).
    */
  private val bpeArtifactDirs = scala.collection.concurrent.TrieMap
    .empty[String, String]

  private def trainedBpe(s: org.apache.spark.sql.SparkSession, d: String) =
    bpeTrained.getOrElseUpdate(d, {
      val t = graft.ml.BpeTrainer.train(Tables.documents(s, d), "text",
        bpeRounds)
      t.release()
      val p = bpeArtifactDirs.getOrElseUpdate(d,
        TrainingData.benchScratchDir("graft_bpe_merges"))
      graft.ml.BpeTrainer.save(s, t.merges, s"$p/merges")
      graft.ml.BpeTrainer.load(s, s"$p/merges")
    })

  private def bpeWords(s: org.apache.spark.sql.SparkSession, d: String) =
    graft.ml.BpeTrainer.segmentationFor(Tables.documents(s, d), "text",
      trainedBpe(s, d))

  /** Bench-path override for q_bpe_train: drop the cache first so
    * every timed pass pays FULL training (corpus word-type scan + 20
    * argmax rounds + artifact save/load) — without it, min-of-2 in
    * one JVM always records the post-cache pass, a toDF over 20
    * cached tuples (the ADVICE r9 rehearsal finding, same mechanism).
    * q_bpe_apply / q_bpe_segment keep the cache and deliberately
    * price SERVING a trained tokenizer, not training one.
    */
  private[queries] val qBpeTrainBench: Q = (s, d) => {
    clearBpeCache()
    qBpeTrain(s, d)
  }

  private val qBpeTrain: Q = (s, d) => {
    import s.implicits._
    trainedBpe(s, d)
      .map(m => (m.round, m.left, m.right, m.pairCount))
      .toDF("merge_round", "lhs", "rhs", "pair_count")
      .orderBy("merge_round")
  }

  /** The full unrolled training dialect (w, s0, then p/b/s per
    * round), shared by BOTH BPE oracles as the one WITH-prefix —
    * never derived by string surgery on a finished statement. Each
    * s_r guards on b_r being non-empty: if the corpus exhausts its
    * pairs before round `bpeRounds`, replace(marked, NULL, NULL)
    * would NULL-poison every later segmentation while the engine
    * keeps the valid partial one.
    */
  private val bpeCtePrefix: String = {
    val sb = new StringBuilder
    sb ++= """WITH w AS (
      |  SELECT token, count(*) AS cnt FROM (
      |    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
      |  WHERE regexp_matches(token, '^[a-z]{2,}$') GROUP BY token),
      |s0 AS MATERIALIZED (
      |  SELECT token, cnt,
      |    '<' || array_to_string(list_transform(range(1, len(token) + 1),
      |      i -> token[i:i]), '><') || '>' AS marked
      |  FROM w)""".stripMargin
    for (r <- 1 to bpeRounds) {
      sb ++= s""",
        |p$r AS MATERIALIZED (
        |  SELECT pr[1] AS l, pr[2] AS r, CAST(sum(cnt) AS BIGINT) AS pair_cnt
        |  FROM (SELECT cnt, unnest(list_transform(range(1, len(syms)),
        |          i -> [syms[i], syms[i + 1]])) AS pr
        |        FROM (SELECT cnt,
        |                string_split(substr(marked, 2, length(marked) - 2),
        |                  '><') AS syms
        |              FROM s${r - 1}))
        |  GROUP BY 1, 2),
        |b$r AS MATERIALIZED (SELECT l, r, pair_cnt FROM p$r
        |        ORDER BY pair_cnt DESC, l, r LIMIT 1),
        |s$r AS MATERIALIZED (
        |  SELECT token, cnt,
        |    CASE WHEN (SELECT count(*) FROM b$r) = 0 THEN marked
        |         ELSE replace(marked,
        |           '<' || (SELECT l FROM b$r) || '><' || (SELECT r FROM b$r) || '>',
        |           '<' || (SELECT l FROM b$r) || (SELECT r FROM b$r) || '>')
        |    END AS marked
        |  FROM s${r - 1})""".stripMargin
    }
    sb.toString
  }

  private val qBpeTrainSql: String =
    bpeCtePrefix + "\n" + (1 to bpeRounds).map(r =>
      s"SELECT $r AS merge_round, l AS lhs, r AS rhs, pair_cnt AS pair_count FROM b$r")
      .mkString("", "\nUNION ALL\n", "\nORDER BY merge_round")

  // ---------------------------------------------------------- Q-BPE-SEGMENT
  /** The learned segmentations themselves, dumped for a BOUNDED probe
    * set (the 50 lowest qualifying tokens) — the artifact a tokenizer
    * user actually inspects: token → ordered subwords + counts.
    * Bounded by construction (the probe cut is a TakeOrdered heap, so
    * the dump never scales with the corpus); the segmentation comes
    * from the same trained state q_bpe_apply joins against. The
    * subword sequence is dumped as a `><`-joined STRING (house
    * scalar-only dump convention — the driver's canonicalizer sorts
    * columns and cannot order raw array cells), which on the oracle
    * side is exactly the interior of `marked`.
    */
  private val qBpeSegment: Q = (s, d) =>
    bpeWords(s, d)
      .select(col("token"), col("cnt"),
        graft.ml.BpeTrainer.symbols("marked").as("syms"))
      .select(col("token"), col("cnt"),
        array_join(col("syms"), "><").as("subwords"),
        size(col("syms")).cast("long").as("n_subwords"))
      .orderBy("token").limit(50)

  private val qBpeSegmentSql =
    s"""$bpeCtePrefix
      |SELECT token, cnt,
      |       substr(marked, 2, length(marked) - 2) AS subwords,
      |       CAST(len(string_split(substr(marked, 2, length(marked) - 2),
      |         '><')) AS BIGINT) AS n_subwords
      |FROM s$bpeRounds ORDER BY token LIMIT 50""".stripMargin

  // ------------------------------------------------------------ Q-BPE-APPLY
  /** The learned tokenizer APPLIED: per-source subword statistics of
    * the corpus under the trained merges — the train→apply roundtrip
    * that proves the merge table actually segments. The corpus-side
    * work is an explode + a vocab-domain hash join against the final
    * word-type segmentation (broadcast-able: it IS the vocabulary);
    * nothing re-tokenizes character-by-character at read time. The
    * oracle reuses the full unrolled training dialect and reads
    * s20's segmentation sizes.
    */
  private val qBpeApply: Q = (s, d) => {
    val wordSyms = bpeWords(s, d).select(col("token"),
      size(graft.ml.BpeTrainer.symbols("marked")).cast("long").as("n_syms"))
    Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token").rlike("^[a-z]{2,}$"))
      // the vocab side is bounded BY DESIGN (it is the tokenizer's
      // word-type table) — broadcast explicitly rather than trusting
      // checkpoint-backed stats to clear the threshold
      .join(broadcast(wordSyms), "token")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("token")).cast("long")).as("n_chars"),
        sum(col("n_syms")).as("n_subwords"))
      .orderBy("source")
  }

  private val qBpeApplySql: String =
    s"""$bpeCtePrefix
      |SELECT source, count(*) AS n_words,
      |       CAST(sum(length(t.token)) AS BIGINT) AS n_chars,
      |       CAST(sum(len(string_split(
      |         substr(f.marked, 2, length(f.marked) - 2), '><'))) AS BIGINT)
      |         AS n_subwords
      |FROM (SELECT source, unnest(string_split(text, ' ')) AS token
      |      FROM documents) t
      |JOIN s$bpeRounds f ON t.token = f.token
      |WHERE regexp_matches(t.token, '^[a-z]{2,}$$')
      |GROUP BY source ORDER BY source""".stripMargin

  // -------------------------------------------------------------- Q-COOCCUR
  /** Token co-occurrence with pointwise mutual information — the
    * association statistic behind phrase mining and
    * word-embedding-free relatedness: PMI(a,b) = ln(P(a,b)/(P(a)P(b)))
    * over document-level co-occurrence, top-100 pairs.
    *
    * Scale shape: pair enumeration is the classic quadratic trap, so
    * each document contributes pairs only from its top-20 tokens by
    * (tf desc, token) — a per-document window over the doc's own
    * tokens (partition size bounded by document length), giving ≤190
    * pairs per document regardless of corpus size. The df/pair
    * tables live in the vocab domain; joins key on token (hash join,
    * AQE free to broadcast the small side), and the final top-100 is
    * TakeOrdered, not a global sort.
    */
  private val qCooccur: Q = (s, d) => {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val wdoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("token"))
    val top = tf.withColumn("r", row_number().over(wdoc))
      .filter(col("r") <= 20).select(col("doc_id"), col("token"))
    val df = top.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = top.agg(count_distinct(col("doc_id")).as("n_docs"))
    val pairs = top.as("a")
      .join(top.as("b"), col("a.doc_id") === col("b.doc_id") &&
        col("a.token") < col("b.token"))
      .groupBy(col("a.token").as("tok_a"), col("b.token").as("tok_b"))
      .agg(count(lit(1)).as("pair_docs"))
      .filter(col("pair_docs") >= 2)
    pairs
      .join(df.select(col("token").as("tok_a"), col("df").as("df_a")), "tok_a")
      .join(df.select(col("token").as("tok_b"), col("df").as("df_b")), "tok_b")
      .crossJoin(n)
      .withColumn("pmi", round(log(
        (col("pair_docs") * col("n_docs")).cast("double") /
          (col("df_a") * col("df_b")).cast("double")), 6))
      .select(col("tok_a"), col("tok_b"), col("pair_docs"), col("pmi"))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(100)
  }

  private val qCooccurSql =
    """WITH tf AS (
      |  SELECT doc_id, token, count(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |        FROM documents)
      |  WHERE len(token) > 0 GROUP BY doc_id, token),
      |top AS (
      |  SELECT doc_id, token FROM (
      |    SELECT doc_id, token,
      |           row_number() OVER (PARTITION BY doc_id
      |                              ORDER BY tf DESC, token) AS r
      |    FROM tf) WHERE r <= 20),
      |df AS (SELECT token, count(*) AS df FROM top GROUP BY token),
      |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM top),
      |pairs AS (
      |  SELECT a.token AS tok_a, b.token AS tok_b, count(*) AS pair_docs
      |  FROM top a JOIN top b ON a.doc_id = b.doc_id AND a.token < b.token
      |  GROUP BY a.token, b.token HAVING count(*) >= 2)
      |SELECT tok_a, tok_b, pair_docs,
      |       round(ln(CAST(pair_docs * (SELECT n_docs FROM n) AS DOUBLE)
      |                / CAST(da.df * db.df AS DOUBLE)), 6) AS pmi
      |FROM pairs
      |JOIN df da ON da.token = tok_a
      |JOIN df db ON db.token = tok_b
      |ORDER BY pmi DESC, tok_a, tok_b LIMIT 100""".stripMargin

  // ---------------------------------------------------- Q-DEDUP-INCREMENTAL
  /** Incremental ingest dedup — the production daily-batch shape: a
    * new batch of documents (deterministic 10% slice, doc_id % 10 = 0)
    * is classified against the EXISTING corpus index (the other 90%)
    * as exact duplicate (same md5 of the raw text), near duplicate
    * (same order-insensitive distinct-token-set fingerprint — the
    * q_fingerprint key), or new, with the matched corpus doc.
    *
    * Scale shape: the corpus index (key → min doc_id) is what a real
    * pipeline maintains incrementally — here it is built inline, one
    * map-side-combined aggregation per key kind. Classification is
    * two hash joins on 32-byte digests (unique per index row by
    * construction, so no fanout), never a text comparison; the batch
    * side is a fraction of the corpus, the natural asymmetry AQE
    * exploits.
    */
  private val qDedupIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def exactKey = Dedup.exactTextKey(col("text"))
    def nearKey = Dedup.tokenSetKey(col("text"))
    val batch = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), exactKey.as("ek"), nearKey.as("nk"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val exactIdx = corpus.groupBy(exactKey.as("ek"))
      .agg(min(col("doc_id")).as("exact_of"))
    val nearIdx = corpus.groupBy(nearKey.as("nk"))
      .agg(min(col("doc_id")).as("near_of"))
    batch
      .join(exactIdx, Seq("ek"), "left")
      .join(nearIdx, Seq("nk"), "left")
      .select(col("doc_id"),
        when(col("exact_of").isNotNull, lit("exact_dup"))
          .when(col("near_of").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("status"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"))
      .orderBy(col("doc_id"))
  }

  private val qDedupIncrementalSql =
    """WITH k AS (
      |  SELECT doc_id, md5(text) AS ek,
      |         md5(array_to_string(list_sort(list_distinct(
      |           list_filter(string_split(text, ' '), x -> x <> ''))), ' ')) AS nk
      |  FROM documents),
      |b AS (SELECT * FROM k WHERE doc_id % 10 = 0),
      |ce AS (SELECT ek, min(doc_id) AS exact_of FROM k
      |       WHERE doc_id % 10 <> 0 GROUP BY ek),
      |cn AS (SELECT nk, min(doc_id) AS near_of FROM k
      |       WHERE doc_id % 10 <> 0 GROUP BY nk)
      |SELECT b.doc_id,
      |       CASE WHEN ce.exact_of IS NOT NULL THEN 'exact_dup'
      |            WHEN cn.near_of IS NOT NULL THEN 'near_dup'
      |            ELSE 'new' END AS status,
      |       coalesce(ce.exact_of, cn.near_of) AS dup_of
      |FROM b LEFT JOIN ce USING (ek) LEFT JOIN cn USING (nk)
      |ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------- Q-STREAM-INGEST
  /** Streaming twin of q_dedup_incremental
    * ([[graft.streaming.IngestDedupStream]]): the 10% batch arrives
    * as a real file stream and classifies against the static corpus
    * index through a STATELESS stream-static join — no state store,
    * no watermark, rows emit immediately; the production "check every
    * incoming crawl batch before it lands" stage. The oracle is
    * q_dedup_incremental's SQL verbatim (identical semantics by
    * construction).
    */
  private val qStreamIngest: Q = (s, d) =>
    graft.streaming.IngestDedupStream.classifyFile(s, d)

  // ------------------------------------------------------------ Q-STREAM-CC
  /** STREAMING connected components ([[graft.streaming.CcStream]]) —
    * duplicate-group labels maintained INCREMENTALLY per micro-batch
    * via `ConnectedComponents.appendEdges` (round 12's delta CC),
    * never a full recompute: each arriving document contributes one
    * per-row-pure edge to its content hub (a 60-bit md5-prefix key
    * lifted above every doc id), so components are {dup-group ∪ hub}
    * stars whose label is the group's min doc_id, and the edge SET —
    * hence the fixpoint — is independent of the trigger split
    * (stream ≡ batch by construction; CcStreamSpec pins it and pins
    * labels ≡ a one-shot componentsAlternating over all edges). The
    * first STATEFUL member of the streaming dedup battery: the
    * classify streams serve a frozen index, here the evolving label
    * state IS the product. The oracle restates the star fixpoint
    * closed-form: min(doc_id) per md5 15-hex-char prefix — the same
    * key the hub is built from, so a hub collision (or any label
    * drift) fails the hash.
    */
  private val qStreamCc: Q = (s, d) =>
    graft.streaming.CcStream.labelFile(s, d).orderBy("doc_id")

  private val qStreamCcSql =
    """SELECT doc_id,
      |  min(doc_id) OVER (PARTITION BY substr(md5(text), 1, 15)) AS component
      |FROM documents ORDER BY doc_id""".stripMargin

  /** DURABLE streaming CC (VERDICT r12 next-round #1): the same
    * stream as q_stream_cc, but the evolving labels live in the
    * generation-published bucketed [[graft.dedup.LabelStore]] — each
    * trigger rewrites only the buckets its components touch, the
    * stream checkpoint is durable next to the store, and a restart
    * resumes from the committed generation instead of replaying the
    * corpus (restart-resume spec-pinned in CcStreamSpec). Labels are
    * identical to the ephemeral path by construction, so the oracle
    * is q_stream_cc's closed-form group-min verbatim. The query's
    * store is scratch (the driver re-runs from nothing); the returned
    * frame is snapshotted before the scratch drops.
    */
  private val qStreamCcStore: Q = (s, d) => {
    val store = java.nio.file.Files
      .createTempDirectory("graft_q_cc_store").toAbsolutePath.toString
    try graft.streaming.CcStream.labelStoreFile(s, d, store, nBuckets = 16)
      .orderBy("doc_id").localCheckpoint()
    finally graft.tools.Scratch.deleteRecursively(new java.io.File(store))
  }

  /** TAKEDOWN over the duplicate-group labels (VERDICT r12 next-round
    * #4): batch CC over the content hub-star graph, then
    * [[graft.dedup.ConnectedComponents.removeNodes]] deletes every
    * doc_id ≡ 0 (mod 97) — a set that includes group MINIMA, so the
    * retraction has to re-root components, not just drop rows. Only
    * the touched components recompute; the oracle is the closed-form
    * survivor group-min (dup groups are {docs ∪ hub} stars, so a
    * deletion can shrink a group or re-min it but never split it —
    * splits are RemoveNodesSpec's chain/random territory).
    */
  private val qCcTakedown: Q = (s, d) => {
    import graft.dedup.ConnectedComponents
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val edges = graft.streaming.CcStream.edgesOf(docs)
      .localCheckpoint() // read by CC and by the retraction's edge scan
    val labels = ConnectedComponents.componentsAdaptive(edges)
    val del = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id").as("id"))
    ConnectedComponents.removeNodes(labels, edges, del)
      .filter(col("id") < graft.streaming.CcStream.HubOffset)
      .select(col("id").as("doc_id"), col("component"))
      .orderBy("doc_id")
  }

  private val qCcTakedownSql =
    """SELECT d.doc_id, min(d2.doc_id) AS component
      |FROM documents d
      |JOIN documents d2
      |  ON substr(md5(d2.text), 1, 15) = substr(md5(d.text), 1, 15)
      | AND d2.doc_id % 97 <> 0
      |WHERE d.doc_id % 97 <> 0
      |GROUP BY d.doc_id
      |ORDER BY d.doc_id""".stripMargin

  // -------------------------------------------------------- Q-SHORTEST-PATH
  /** Single-source BFS shortest paths, bounded at 4 hops
    * ([[ShortestPaths]]), over a deterministically sparsified
    * co-purchase graph: parts are connected when they appear in the
    * same order (the q_triangles edge derivation) and the edge
    * survives the (u+v) % 13 = 0 sample — the raw co-purchase graph
    * has diameter 2, the sample gives the full 0–4 hop spread plus
    * unreachable nodes, so every BFS round does real work. Source =
    * the minimum surviving node, computed as a 1-row DataFrame (no
    * driver action).
    *
    * The oracle is a recursive CTE with UNION (not UNION ALL)
    * semantics — path enumeration would be exponential on a cyclic
    * graph; (node, dist) dedup bounds it at nodes × 5 rows.
    */
  /** The shared sparsified co-purchase graph: parts connected when
    * they appear in the same order (the q_triangles derivation),
    * edges surviving the (u+v) % 13 = 0 deterministic sample,
    * symmetrized, pre-partitioned on `u` — the iterative graph
    * queries (BFS, label propagation) join on it every round and
    * reuse this one exchange.
    */
  private def sparseCopurchaseEdges(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val pairs = Core.coPurchasePairs(s, d)
      .filter((col("u") + col("v")) % 13 === 0)
    pairs
      .union(pairs.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .repartition(s.sparkContext.defaultParallelism, col("u"))
  }

  /** The shared oracle-side restatement of [[sparseCopurchaseEdges]]. */
  private val sparseEdgesSql =
    """items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e0 AS (SELECT DISTINCT a.p AS u, b.p AS v
      |       FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |       WHERE (a.p + b.p) % 13 = 0),
      |e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0)""".stripMargin

  private val qShortestPath: Q = (s, d) =>
    // source = min node, derived INSIDE the operator from its
    // materialized edge cache — a caller-side agg would re-execute
    // the whole pair-derivation lineage a second time
    ShortestPaths.runFromMin(sparseCopurchaseEdges(s, d), "u", "v",
      maxHops = 4)
      .orderBy(col("node"))

  // both walk anchors carry HAVING so an EMPTY sparsified edge set
  // yields zero rows, matching the engine's empty frame (ADVICE r8:
  // a bare scalar subquery anchor emits a spurious (NULL, 0) row)
  private val qShortestPathSql =
    s"""WITH RECURSIVE $sparseEdgesSql,
      |walk(node, dist) AS (
      |  SELECT min(u), 0 FROM e HAVING min(u) IS NOT NULL
      |  UNION
      |  SELECT e.v, w.dist + 1 FROM walk w JOIN e ON e.u = w.node
      |  WHERE w.dist < 4)
      |SELECT node, CAST(min(dist) AS BIGINT) AS dist
      |FROM walk GROUP BY node ORDER BY node""".stripMargin

  // ------------------------------------------------------ Q-STREAM-ANOMALY
  /** Streaming EWMA anomaly detection
    * ([[graft.streaming.AnomalyStream]]): every event scored against
    * its user's running exponentially-weighted mean/variance, 3-sigma
    * control limit after a 5-event warm-up, run as a real streaming
    * query (file-source → custom flatMapGroupsWithState →
    * memory sink). The oracle restates the same double recurrence as
    * a per-user recursive CTE over the watermark-ripe prefix.
    */
  private val qStreamAnomaly: Q = (s, d) =>
    graft.streaming.AnomalyStream.detectFile(s, d)

  private val qStreamAnomalySql =
    """WITH RECURSIVE cut AS (
      |  SELECT date_trunc('milliseconds', max(ts)) - INTERVAL '10 minutes' AS c
      |  FROM events),
      |ev AS (
      |  SELECT user_id, event_id, ts, value,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts, event_id) AS rn
      |  FROM events
      |  WHERE ts < (SELECT c + INTERVAL '1 millisecond' FROM cut)),
      |r(user_id, rn, event_id, ts, value, ewma, ewvar) AS (
      |  SELECT user_id, rn, event_id, ts, value, value, CAST(0 AS DOUBLE)
      |  FROM ev WHERE rn = 1
      |  UNION ALL
      |  SELECT ev.user_id, ev.rn, ev.event_id, ev.ts, ev.value,
      |    CAST(0.3 AS DOUBLE) * ev.value + CAST(0.7 AS DOUBLE) * r.ewma,
      |    CAST(0.7 AS DOUBLE) * (r.ewvar + CAST(0.3 AS DOUBLE) *
      |      (ev.value - r.ewma) * (ev.value - r.ewma))
      |  FROM r JOIN ev ON ev.user_id = r.user_id AND ev.rn = r.rn + 1)
      |SELECT cur.event_id, cur.user_id, cur.ts, cur.value,
      |  prev.ewma AS ewma_prev,
      |  prev.ewvar AS ewvar_prev,
      |  coalesce(prev.rn >= 5 AND
      |    (cur.value - prev.ewma) * (cur.value - prev.ewma)
      |      > CAST(9 AS DOUBLE) * prev.ewvar, FALSE) AS is_anomaly
      |FROM r cur LEFT JOIN r prev
      |  ON prev.user_id = cur.user_id AND prev.rn = cur.rn - 1
      |ORDER BY cur.event_id""".stripMargin

  // ------------------------------------------------------- Q-SSSP-WEIGHTED
  /** Weighted bounded-hop shortest paths
    * ([[ShortestPaths.runWeighted]], 4-round Bellman-Ford) over the
    * shared sparsified co-purchase graph with deterministic integer
    * weights w(u,v) = 1 + (u+v) mod 5 — a lighter 2-edge detour can
    * beat a heavy direct edge, which BFS cannot express. The oracle
    * walks (node, dist, hops) triples with UNION dedup — bounded by
    * nodes × distinct-dists × hops, never path-enumeration.
    */
  private val qSsspWeighted: Q = (s, d) =>
    ShortestPaths.runWeightedFromMin(
      sparseCopurchaseEdges(s, d)
        .withColumn("w", lit(1L) + (col("u") + col("v")) % 5),
      "u", "v", "w", maxHops = 4)
      .orderBy(col("node"))

  private val qSsspWeightedSql =
    s"""WITH RECURSIVE $sparseEdgesSql,
      |walk(node, dist, hops) AS (
      |  SELECT min(u), CAST(0 AS BIGINT), 0 FROM e HAVING min(u) IS NOT NULL
      |  UNION
      |  SELECT e.v, w.dist + 1 + (e.u + e.v) % 5, w.hops + 1
      |  FROM walk w JOIN e ON e.u = w.node
      |  WHERE w.hops < 4)
      |SELECT node, CAST(min(dist) AS BIGINT) AS dist
      |FROM walk GROUP BY node ORDER BY node""".stripMargin

  // ---------------------------------------------------------- Q-COMMUNITIES
  /** Community detection via deterministic synchronous label
    * propagation ([[graft.operators.LabelPropagation]], 3 rounds)
    * over the shared sparsified co-purchase graph — the community
    * twin of q_dedup_groups' connected components (CC merges
    * everything reachable; LPA splits dense regions apart). The
    * oracle unrolls the 3 rounds as nested argmax CTEs built by the
    * same loop (the q_pagerank oracle pattern).
    */
  private val qCommunities: Q = (s, d) =>
    graft.operators.LabelPropagation.run(
      sparseCopurchaseEdges(s, d), "u", "v", iters = 3)
      .orderBy(col("node"))

  private val qCommunitiesSql = {
    val rounds = (1 to 3).map { i =>
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""l$i AS (
         |  SELECT node, nlabel AS label FROM (
         |    SELECT node, nlabel, row_number() OVER (
         |        PARTITION BY node ORDER BY c DESC, nlabel) AS rk
         |    FROM (SELECT e.u AS node, p.label AS nlabel, count(*) AS c
         |          FROM e JOIN $prev p ON p.node = e.v
         |          GROUP BY e.u, p.label))
         |  WHERE rk = 1)""".stripMargin
    }
    s"""WITH $sparseEdgesSql,
       |l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),
       |${rounds.mkString(",\n")}
       |SELECT node, label FROM l3 ORDER BY node""".stripMargin
  }

  // ----------------------------------------------------------------- Q-RECS
  /** Item-item collaborative filtering — co-occurrence
    * recommendations, the classic "customers also bought": items
    * sharing an order are candidate pairs, scored by co-occurrence
    * cosine c_ab / √(c_a·c_b), top-5 per item (ties → smaller item).
    *
    * Scale shape: pair enumeration rides the per-order sets (the
    * q_triangles one-shuffle derivation — within-order sets are
    * small, so the explosion is bounded per row); the ≥2-co-count
    * support filter runs BEFORE the ranking window, so each item's
    * window sees only its supported neighbours, and the popularity
    * counts join in item-domain hash joins. No corpus-sized window,
    * no cross join.
    */
  private val qRecs: Q = (s, d) => {
    val pairs = Core.coPurchasePairs(s, d)
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("cab"))
      .filter(col("cab") >= 2)
    val sym = pairs.union(
      pairs.select(col("v").as("u"), col("u").as("v"), col("cab")))
    // item popularity from a separate aggregation: caching the
    // per-order sets for double consumption would pin order-domain
    // state for the query's lifetime — recomputing the cheap scan is
    // the better trade (and at scale the two aggregates pipeline
    // independently)
    val cnt = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct().groupBy(col("p")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("s").desc, col("rec"))
    sym
      .join(cnt.select(col("p").as("u"), col("c").as("cu")), "u")
      .join(cnt.select(col("p").as("v"), col("c").as("cv")), "v")
      .select(col("u").as("item"), col("v").as("rec"), col("cab").as("co_count"),
        (col("cab").cast("double") /
          sqrt(col("cu").cast("double") * col("cv").cast("double"))).as("s"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("item"), col("rec"), col("co_count"),
        round(col("s"), 6).as("score"), col("rank"))
      .orderBy(col("item"), col("rank"))
  }

  private val qRecsSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |cnt AS (SELECT p, count(*) AS c FROM items GROUP BY p),
      |p0 AS (SELECT a.p AS u, b.p AS v, count(*) AS cab
      |       FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |       GROUP BY 1, 2 HAVING count(*) >= 2),
      |pr AS (SELECT u, v, cab FROM p0 UNION ALL SELECT v, u, cab FROM p0),
      |scored AS (
      |  SELECT pr.u AS item, pr.v AS rec, pr.cab AS co_count,
      |         CAST(pr.cab AS DOUBLE)
      |           / sqrt(CAST(cu.c AS DOUBLE) * CAST(cv.c AS DOUBLE)) AS s
      |  FROM pr JOIN cnt cu ON cu.p = pr.u JOIN cnt cv ON cv.p = pr.v)
      |SELECT item, rec, co_count, round(s, 6) AS score,
      |       CAST(rk AS BIGINT) AS rank
      |FROM (SELECT *, row_number() OVER (
      |        PARTITION BY item ORDER BY s DESC, rec) AS rk
      |      FROM scored)
      |WHERE rk <= 5 ORDER BY item, rank""".stripMargin

  // ---------------------------------------------------------- Q-ATTRIBUTION
  /** Conversion attribution — for every purchase, credit (a) the
    * user's most recent PRECEDING non-purchase event (last-touch)
    * and (b) the user's first event overall (first-touch), then
    * report per-channel conversion counts and decimal-exact
    * attributed revenue. Purchases with no preceding touch credit
    * 'direct'.
    *
    * Scale shape: two windows partitioned by user (frame sizes
    * bounded by per-user history; the last-touch window is
    * last-ignore-nulls over ROWS … 1 PRECEDING — the q_asof
    * union-window trick in single-table form), then a channel-domain
    * aggregate and one tiny full outer join of the two roles.
    */
  private val qAttribution: Q = (s, d) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val touched = Tables.events(s, d)
      .withColumn("last_touch", last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true)
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)))
      .withColumn("first_touch", first(col("event_type"))
        .over(w.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("last_touch"), lit("direct")).as("last_touch"),
        col("first_touch"), col("value"))
    val lastAgg = touched.groupBy(col("last_touch").as("channel"))
      .agg(count(lit(1)).as("n_last"), Core.dsum(col("value")).as("value_last"))
    val firstAgg = touched.groupBy(col("first_touch").as("channel"))
      .agg(count(lit(1)).as("n_first"), Core.dsum(col("value")).as("value_first"))
    lastAgg.join(firstAgg, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        coalesce(col("value_last"), lit(0.0)).as("value_last"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("value_first"), lit(0.0)).as("value_first"))
      .orderBy(col("channel"))
  }

  private val qAttributionSql = {
    val dsum = Core.DSUM.format("value")
    s"""WITH t AS (
       |  SELECT coalesce(last_value(CASE WHEN event_type <> 'purchase'
       |             THEN event_type END IGNORE NULLS)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |           'direct') AS last_touch,
       |         first_value(event_type)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS first_touch,
       |         event_type, value
       |  FROM events),
       |p AS (SELECT * FROM t WHERE event_type = 'purchase'),
       |l AS (SELECT last_touch AS channel, count(*) AS n_last,
       |             $dsum AS value_last FROM p GROUP BY 1),
       |f AS (SELECT first_touch AS channel, count(*) AS n_first,
       |             $dsum AS value_first FROM p GROUP BY 1)
       |SELECT channel,
       |       coalesce(l.n_last, 0) AS n_last,
       |       coalesce(l.value_last, CAST(0 AS DOUBLE)) AS value_last,
       |       coalesce(f.n_first, 0) AS n_first,
       |       coalesce(f.value_first, CAST(0 AS DOUBLE)) AS value_first
       |FROM l FULL OUTER JOIN f USING (channel)
       |ORDER BY channel""".stripMargin
  }

  // ------------------------------------------------------------ Q-MIX-APPLY
  /** Apply domain-mixing weights as an actual deterministic sample —
    * the execution half of q_mix_weights (which only COMPUTES the
    * rebalancing): every source is down-sampled toward the uniform
    * target share with keep-probability min(1, target/natural), the
    * per-doc coin being the first 8 md5 hex digits of doc_id mapped
    * to [0,1) — reproducible on any cluster, no rand(). Sources below
    * target keep everything (upsampling is a repeat factor at
    * training time, not a filter). Output: per-source natural/sampled
    * counts and the before/after corpus shares.
    *
    * Scale shape: two aggregations in the source domain and one
    * filtered count — the sample itself never materializes anywhere
    * (the filter IS the sample; a training pipeline would write it
    * partitioned by source).
    */
  private val qMixApply: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val n = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val t = n.agg(
      (sum(col("n")).cast("double") / count(lit(1))).as("target"),
      sum(col("n")).as("total"))
    val p = n.crossJoin(t).select(col("source"), col("n"),
      least(lit(1.0), col("target") / col("n").cast("double")).as("p"),
      col("total"))
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double") / lit(4294967296.0)
    val sampled = docs.join(p.select(col("source"), col("p")), "source")
      .filter(u < col("p"))
      .groupBy(col("source")).agg(count(lit(1)).as("sampled"))
    val tot = sampled.agg(sum(col("sampled")).as("ts"))
    p.join(sampled, Seq("source"), "left").crossJoin(tot)
      .select(col("source"), col("n").as("n_natural"),
        round(col("p"), 6).as("p_keep"),
        coalesce(col("sampled"), lit(0L)).as("n_sampled"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("share_before"),
        round(coalesce(col("sampled"), lit(0L)).cast("double") /
          col("ts").cast("double"), 6).as("share_after"))
      .orderBy(col("source"))
  }

  private val qMixApplySql =
    """WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n) AS DOUBLE) / count(*) AS target,
      |             CAST(sum(n) AS BIGINT) AS total FROM n),
      |p AS (SELECT source, n,
      |        least(CAST(1 AS DOUBLE),
      |              (SELECT target FROM t) / CAST(n AS DOUBLE)) AS p
      |      FROM n),
      |s AS (SELECT d.source, count(*) AS sampled
      |      FROM documents d JOIN p USING (source)
      |      WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
      |                 AS BIGINT) / CAST(4294967296 AS DOUBLE) < p.p
      |      GROUP BY d.source),
      |tot AS (SELECT CAST(sum(sampled) AS BIGINT) AS ts FROM s)
      |SELECT p.source, p.n AS n_natural, round(p.p, 6) AS p_keep,
      |       coalesce(s.sampled, 0) AS n_sampled,
      |       round(CAST(p.n AS DOUBLE)
      |             / CAST((SELECT total FROM t) AS DOUBLE), 6) AS share_before,
      |       round(CAST(coalesce(s.sampled, 0) AS DOUBLE)
      |             / CAST((SELECT ts FROM tot) AS DOUBLE), 6) AS share_after
      |FROM p LEFT JOIN s USING (source) ORDER BY p.source""".stripMargin

  // ----------------------------------------------------------------- Q-GINI
  /** Gini concentration coefficient of customer spend — the
    * inequality metric concentration dashboards run (and the same
    * arithmetic grades corpus-source concentration):
    * G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over spends sorted ascending.
    * Both Σ terms stay EXACT: xᵢ are 2-decimal customer totals
    * (decimal sums), and i·xᵢ sums as DECIMAL(38,2) — so the two
    * engines derive G from identical doubles with the identical
    * expression, no float-reduction ordering anywhere.
    *
    * Scale shape: one map-side-combined per-customer aggregation,
    * then the rank i = cumulative count over the customer domain
    * ordered by (spend, custkey), computed by the DISTRIBUTED
    * two-phase [[graft.operators.PrefixScan]] (the q_ks_test
    * machinery; VERDICT r16 next-round #6) — one range exchange and
    * a per-partition window, NEVER a single-partition global
    * `Window.orderBy`: the customer domain is unbounded at 100 TB
    * and this was the repo's last unbounded-domain one-task sort.
    */
  private val qGini: Q = (s, d) => {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      .withColumn("_one", lit(1L))
    graft.operators.PrefixScan
      .withCumSumsBy(spend, Seq("x", "o_custkey"), Seq("_one"))
      .select(col("x"), col("cum__one").as("i"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("total"),
        sum((col("i") * col("x")).cast("decimal(38,2)")).cast("double")
          .as("s1"))
      .select(col("n").as("n_customers"),
        round(col("total"), 2).as("total_spend"),
        round(lit(2.0) * col("s1") / (col("n").cast("double") * col("total"))
          - (col("n").cast("double") + 1) / col("n").cast("double"), 6)
          .as("gini"))
  }

  private val qGiniSql =
    """WITH spend AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS x
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT x, CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
      |  FROM spend),
      |agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(x) AS DOUBLE) AS total,
      |         CAST(sum(CAST(i * x AS DECIMAL(38,2))) AS DOUBLE) AS s1
      |  FROM ranked)
      |SELECT n AS n_customers, round(total, 2) AS total_spend,
      |       round(CAST(2.0 AS DOUBLE) * s1 / (CAST(n AS DOUBLE) * total)
      |             - (CAST(n AS DOUBLE) + 1) / CAST(n AS DOUBLE), 6) AS gini
      |FROM agg""".stripMargin

  // -------------------------------------------------------------- Q-KS-TEST
  /** Exact two-sample Kolmogorov–Smirnov test: is the o_totalprice
    * distribution of pre-1998 orders the same as 1998+? D = max over
    * the pooled support of |F1(v) - F2(v)|, computed EXACTLY in
    * integers by cross-multiplying the ECDF numerators
    * (|c1·n2 - c2·n1|, one division at the very end) — no float
    * accumulates anywhere, so the oracle is bit-trivial. The
    * continuous sibling of q_drift's binned PSI: PSI sees what the
    * bin edges let it see; KS is binning-free.
    *
    * Scale shape: one value-domain aggregation (map-side combine),
    * then the distributed two-phase prefix scan
    * ([[graft.operators.PrefixScan]]): range exchange → per-partition
    * offsets (driver sees one row per PARTITION) → parallel
    * within-partition windows. No single-partition global window
    * anywhere (the plan spec pins that), which is what makes an
    * EXACT ECDF viable at 100 TB. The 5% rejection uses the
    * large-sample critical value c(.05) = 1.358 squared against the
    * integer statistic, composed with the same IEEE operation order
    * in both engines.
    */
  private val qKsTest: Q = (s, d) => {
    val t = Tables.orders(s, d).select(col("o_totalprice").as("v"),
      when(col("o_orderdate") < lit("1998-01-01").cast("timestamp"), 1)
        .otherwise(2).as("smp"))
    val g = t.groupBy(col("v")).agg(
      sum(when(col("smp") === 1, 1L).otherwise(0L)).as("c1"),
      sum(when(col("smp") === 2, 1L).otherwise(0L)).as("c2"))
    val cum = graft.operators.PrefixScan.withCumSums(g, "v", Seq("c1", "c2"))
    // sample sizes read off the (checkpoint-backed) scan itself — the
    // final running count IS the total; no second pass over orders
    val n = cum.agg(max(col("cum_c1")).as("n1"), max(col("cum_c2")).as("n2"))
    // cross-multiplication in DECIMAL(38,0): at ~10¹¹-row samples the
    // cum×n products pass 2⁶³, where Long wraps/errors and decimal
    // (like the oracle's int128 promotion) stays exact; the dumped
    // d_num column stays BIGINT (its bound is the product itself, so
    // the cast is for the sf-bounded dump contract, not the math)
    cum.crossJoin(broadcast(n))
      .agg(max(abs(col("cum_c1").cast("decimal(38,0)") * col("n2") -
        col("cum_c2").cast("decimal(38,0)") * col("n1"))).as("dn"))
      .crossJoin(broadcast(n))
      .select(col("n1"), col("n2"),
        col("dn").cast("long").as("d_num"),
        round(col("dn").cast("double") /
          (col("n1").cast("double") * col("n2")), 6).as("ks_d"),
        (col("dn").cast("double") * col("dn").cast("double") >
          lit(1.844164) * (col("n1") + col("n2")) * col("n1") * col("n2"))
          .as("reject_05"))
  }

  private val qKsTestSql =
    """WITH t AS (
      |  SELECT o_totalprice AS v,
      |         CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
      |              THEN 1 ELSE 2 END AS smp
      |  FROM orders),
      |n AS (
      |  SELECT CAST(sum(CASE WHEN smp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |         CAST(sum(CASE WHEN smp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
      |  FROM t),
      |g AS (
      |  SELECT v,
      |         CAST(sum(CASE WHEN smp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
      |         CAST(sum(CASE WHEN smp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2
      |  FROM t GROUP BY v),
      |c AS (
      |  SELECT sum(c1) OVER (ORDER BY v) AS f1,
      |         sum(c2) OVER (ORDER BY v) AS f2
      |  FROM g),
      |d AS (
      |  SELECT CAST(max(abs(f1 * (SELECT n2 FROM n)
      |                      - f2 * (SELECT n1 FROM n))) AS BIGINT) AS d_num
      |  FROM c)
      |SELECT n1, n2, d_num,
      |       round(CAST(d_num AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2), 6) AS ks_d,
      |       CAST(d_num AS DOUBLE) * CAST(d_num AS DOUBLE) >
      |         CAST(1.844164 AS DOUBLE) * (n1 + n2) * n1 * n2 AS reject_05
      |FROM d, n""".stripMargin

  // ---------------------------------------------------------------- Q-CHISQ
  /** Chi-square independence test over the source × lang contingency
    * table — the categorical sibling of q_ab_test (is language
    * distribution independent of source?). Zero cells are included
    * (full row-total × col-total cross, observed coalesced to 0 —
    * omitting them understates the statistic). The cell terms are
    * summed as an ORDER-FIXED fold — both engines build the term
    * list sorted by (source, lang) and fold it left-to-right, so the
    * float reduction is order-insensitive structurally (the q_drift
    * rule, at 100 cells where literal unrolling stops scaling).
    */
  private val qChisq: Q = (s, d) => {
    val c = Tables.documents(s, d)
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
    val r = c.groupBy(col("source")).agg(sum(col("o")).as("ro"))
    val l = c.groupBy(col("lang")).agg(sum(col("o")).as("co"))
    val n = c.agg(sum(col("o")).cast("double").as("n"),
      count(lit(1)).as("n_cells_obs"))
    val cells = r.crossJoin(l).join(c, Seq("source", "lang"), "left")
      .crossJoin(n)
      .select(col("source"), col("lang"),
        coalesce(col("o"), lit(0L)).cast("double").as("o"),
        (col("ro").cast("double") * col("co").cast("double") / col("n"))
          .as("e"))
      .select(col("source"), col("lang"),
        ((col("o") - col("e")) * (col("o") - col("e")) / col("e")).as("term"))
    val nr = r.count()
    val nc = l.count()
    cells
      .agg(aggregate(
        sort_array(collect_list(struct(col("source"), col("lang"),
          col("term")))),
        lit(0.0), (acc, x) => acc + x.getField("term")).as("chi2_raw"))
      .crossJoin(n.select(col("n").cast("long").as("n_docs")))
      .select(col("n_docs"), lit(nr).as("n_sources"), lit(nc).as("n_langs"),
        lit((nr - 1) * (nc - 1)).as("df"),
        round(col("chi2_raw"), 6).as("chi2"))
  }

  private val qChisqSql =
    """WITH c AS (SELECT source, lang, count(*) AS o
      |           FROM documents GROUP BY 1, 2),
      |r AS (SELECT source, sum(o) AS ro FROM c GROUP BY 1),
      |l AS (SELECT lang, sum(o) AS co FROM c GROUP BY 1),
      |n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM c),
      |cells AS (
      |  SELECT r.source, l.lang,
      |    CAST(coalesce(c.o, 0) AS DOUBLE) AS o,
      |    CAST(r.ro AS DOUBLE) * CAST(l.co AS DOUBLE) / (SELECT n FROM n) AS e
      |  FROM r CROSS JOIN l LEFT JOIN c USING (source, lang)),
      |terms AS (
      |  SELECT source, lang, (o - e) * (o - e) / e AS term FROM cells)
      |SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_docs,
      |       (SELECT count(*) FROM r) AS n_sources,
      |       (SELECT count(*) FROM l) AS n_langs,
      |       ((SELECT count(*) FROM r) - 1)
      |         * ((SELECT count(*) FROM l) - 1) AS df,
      |       round(list_sum(list(term ORDER BY source, lang)), 6) AS chi2
      |FROM terms""".stripMargin

  // ------------------------------------------------------------ Q-RECONCILE
  /** Cross-system reconciliation — the data-quality report every
    * pipeline with two bookkeeping paths runs: orders' recorded
    * o_totalprice vs the lineitem-derived revenue per order, FULL
    * OUTER joined so orphans on EITHER side surface, classified as
    * matched (≤5% relative diff) / mismatched / orders_only /
    * lineitem_only, with exact decimal-path money totals per class.
    *
    * Scale shape: one map-side-combined revenue aggregation keyed on
    * the join key, one full outer hash join on that key (both sides
    * already partitioned by it), one tiny classification aggregate.
    */
  private val qReconcile: Q = (s, d) => {
    val ls = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(Core.revSum(col("l_extendedprice"), col("l_discount")).as("derived"))
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
    val status = when(col("o_orderkey").isNull, lit("lineitem_only"))
      .when(col("derived").isNull, lit("orders_only"))
      .when(abs(col("o_totalprice") - col("derived")) <=
        col("o_totalprice") * lit(0.05), lit("matched"))
      .otherwise(lit("mismatched"))
    o.join(ls, o("o_orderkey") === ls("l_orderkey"), "full_outer")
      .select(status.as("status"), col("o_totalprice"), col("derived"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("total_recorded"),
        sum(col("derived").cast("decimal(28,4)")).cast("double")
          .as("total_derived"))
      .orderBy(col("status"))
  }

  private val qReconcileSql =
    s"""WITH ls AS (
       |  SELECT l_orderkey,
       |         ${Core.REVSUM.format("l_extendedprice", "l_discount")} AS derived
       |  FROM lineitem GROUP BY l_orderkey),
       |j AS (
       |  SELECT CASE WHEN o.o_orderkey IS NULL THEN 'lineitem_only'
       |              WHEN ls.derived IS NULL THEN 'orders_only'
       |              WHEN abs(o.o_totalprice - ls.derived)
       |                   <= o.o_totalprice * CAST(0.05 AS DOUBLE) THEN 'matched'
       |              ELSE 'mismatched' END AS status,
       |         o.o_totalprice, ls.derived
       |  FROM orders o FULL OUTER JOIN ls ON o.o_orderkey = ls.l_orderkey)
       |SELECT status, count(*) AS n,
       |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       |         AS total_recorded,
       |       CAST(sum(CAST(derived AS DECIMAL(28,4))) AS DOUBLE)
       |         AS total_derived
       |FROM j GROUP BY status ORDER BY status""".stripMargin

  // -------------------------------------------------------------- Q-AB-TEST
  /** Two-sample A/B comparison — Welch's t-test per event_type
    * between the month's halves (the experiment-analysis twin of
    * q_drift's distribution view): exact decimal-path sums (value is
    * 2-decimal data, the queries/Core.scala rule; the squared sum is
    * exactly 4-decimal), means/variances derived from them with the
    * IDENTICAL expression tree in both engines, Welch t and
    * Satterthwaite df. Squares are written x*x, never pow(x, 2) —
    * pow is not guaranteed bit-equal to multiplication across
    * engines.
    *
    * Scale shape: one map-side-combined aggregation over (type,
    * period), then scalar arithmetic on a 10-row frame.
    */
  private val qAbTest: Q = (s, d) => {
    val g = Tables.events(s, d)
      .withColumn("period",
        when(dayofmonth(col("ts")) <= 15, lit("ref")).otherwise(lit("cur")))
      .groupBy(col("event_type"), col("period"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("s"),
        sum(col("value").cast("decimal(18,2)") *
          col("value").cast("decimal(18,2)")).cast("double").as("s2"))
      .select(col("event_type"), col("period"), col("n"),
        (col("s") / col("n").cast("double")).as("mean"),
        // n = 1 would divide by zero — and the two engines disagree
        // on double x/0 (NULL vs Inf/NaN), so guard to NULL on BOTH
        // sides rather than rely on either's convention
        when(col("n") > 1,
          (col("s2") - col("s") * col("s") / col("n").cast("double")) /
            (col("n").cast("double") - 1)).as("var"))
    val r = g.filter(col("period") === "ref").select(
      col("event_type"), col("n").as("n_ref"), col("mean").as("m_ref"),
      (col("var") / col("n").cast("double")).as("a"),
      col("n").cast("double").as("nr"))
    val c = g.filter(col("period") === "cur").select(
      col("event_type"), col("n").as("n_cur"), col("mean").as("m_cur"),
      (col("var") / col("n").cast("double")).as("b"),
      col("n").cast("double").as("nc"))
    // constant data in both halves gives a = b = 0 → zero standard
    // error; guard t/df to NULL symmetrically (see the var guard)
    val t = when(col("a") + col("b") > 0,
      (col("m_ref") - col("m_cur")) / sqrt(col("a") + col("b")))
    r.join(c, "event_type")
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round(col("m_ref"), 6).as("mean_ref"),
        round(col("m_cur"), 6).as("mean_cur"),
        round(t, 6).as("t_stat"),
        round(when(col("a") + col("b") > 0,
          (col("a") + col("b")) * (col("a") + col("b")) /
            (col("a") * col("a") / (col("nr") - 1) +
              col("b") * col("b") / (col("nc") - 1))), 2).as("df_welch"),
        (abs(t) > lit(1.96)).as("significant"))
      .orderBy(col("event_type"))
  }

  private val qAbTestSql =
    """WITH ev AS (
      |  SELECT event_type, value,
      |         CASE WHEN date_part('day', ts) <= 15 THEN 'ref' ELSE 'cur' END AS period
      |  FROM events),
      |g AS (
      |  SELECT event_type, period, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
      |         CAST(sum(CAST(value AS DECIMAL(18,2))
      |                  * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s2
      |  FROM ev GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, period, n,
      |         s / CAST(n AS DOUBLE) AS mean,
      |         CASE WHEN n > 1 THEN
      |           (s2 - s * s / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
      |         END AS var
      |  FROM g),
      |p AS (
      |  SELECT r.event_type, r.n AS n_ref, c.n AS n_cur,
      |         r.mean AS m_ref, c.mean AS m_cur,
      |         r.var / CAST(r.n AS DOUBLE) AS a,
      |         c.var / CAST(c.n AS DOUBLE) AS b,
      |         CAST(r.n AS DOUBLE) AS nr, CAST(c.n AS DOUBLE) AS nc
      |  FROM m r JOIN m c ON r.event_type = c.event_type
      |   AND r.period = 'ref' AND c.period = 'cur')
      |SELECT event_type, n_ref, n_cur,
      |       round(m_ref, 6) AS mean_ref, round(m_cur, 6) AS mean_cur,
      |       round(CASE WHEN a + b > 0
      |             THEN (m_ref - m_cur) / sqrt(a + b) END, 6) AS t_stat,
      |       round(CASE WHEN a + b > 0
      |             THEN (a + b) * (a + b)
      |                  / (a * a / (nr - 1) + b * b / (nc - 1)) END, 2)
      |         AS df_welch,
      |       abs(CASE WHEN a + b > 0
      |           THEN (m_ref - m_cur) / sqrt(a + b) END)
      |         > CAST(1.96 AS DOUBLE) AS significant
      |FROM p ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- Q-DRIFT
  /** Distribution drift monitoring — the Population Stability Index
    * every production feature pipeline watches: per event_type, the
    * month's first half is the reference period, its exact deciles
    * bin both periods, and PSI = Σ_b (p_cur − p_ref)·ln(p_cur/p_ref)
    * over the 10 bins (ε = 1e-6 floor on empty bins).
    *
    * Scale shape: one aggregation for the decile edges (exact
    * percentile — a sketch would serve at 100 TB, but the oracle
    * needs exactness; swapping to percentile_approx is a one-line
    * change), a broadcast of the 5-row edge table, one counting
    * aggregation over (type, period, bin), and a fixed-order 10-term
    * sum for the PSI — an order-INSENSITIVE float reduction, because
    * a sum(double) over bins would accumulate in engine-specific
    * order and diverge in the last ulps (the queries/Core.scala
    * parity rule, solved structurally here instead of decimally).
    */
  private val qDrift: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .withColumn("period",
        when(dayofmonth(col("ts")) <= 15, lit("ref")).otherwise(lit("cur")))
    val edges = ev.filter(col("period") === "ref")
      .groupBy(col("event_type"))
      .agg(expr(
        "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))")
        .as("edges"))
    val binned = ev.join(broadcast(edges), "event_type")
      .withColumn("bin",
        expr("size(filter(edges, e -> value > e))"))
      .groupBy(col("event_type"), col("period"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val totals = binned.groupBy(col("event_type"), col("period"))
      .agg(sum(col("cnt")).as("n"))
    val props = binned.join(totals, Seq("event_type", "period"))
      .select(col("event_type"), col("period"), col("bin"),
        greatest(col("cnt").cast("double") / col("n").cast("double"),
          lit(1e-6)).as("p"))
    val pivotCols = (0 to 9).flatMap(b => Seq(
      max(when(col("period") === "ref" && col("bin") === b, col("p")))
        .as(s"r$b"),
      max(when(col("period") === "cur" && col("bin") === b, col("p")))
        .as(s"c$b")))
    val byBin = props.groupBy(col("event_type"))
      .agg(pivotCols.head, pivotCols.tail: _*)
    val nRef = totals.filter(col("period") === "ref")
      .select(col("event_type"), col("n").as("n_ref"))
    val nCur = totals.filter(col("period") === "cur")
      .select(col("event_type"), col("n").as("n_cur"))
    val term = (b: Int) => {
      val (r, c) = (coalesce(col(s"r$b"), lit(1e-6)),
        coalesce(col(s"c$b"), lit(1e-6)))
      (c - r) * log(c / r)
    }
    byBin.join(nRef, "event_type").join(nCur, "event_type")
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        round((0 to 9).map(term).reduce(_ + _), 6).as("psi"))
      .withColumn("drifted", col("psi") > 0.2)
      .orderBy(col("event_type"))
  }

  private val qDriftSql = {
    val terms = (0 to 9).map { b =>
      s"""(coalesce(c$b, CAST(1e-6 AS DOUBLE)) - coalesce(r$b, CAST(1e-6 AS DOUBLE)))
         | * ln(coalesce(c$b, CAST(1e-6 AS DOUBLE)) / coalesce(r$b, CAST(1e-6 AS DOUBLE)))""" // fixed order, matches the Spark reduce
        .stripMargin.replace("\n", "")
    }.mkString(" + ")
    val pivots = (0 to 9).flatMap { b =>
      Seq(
        s"max(CASE WHEN period = 'ref' AND bin = $b THEN p END) AS r$b",
        s"max(CASE WHEN period = 'cur' AND bin = $b THEN p END) AS c$b")
    }.mkString(", ")
    s"""WITH ev AS (
       |  SELECT event_type, value,
       |         CASE WHEN date_part('day', ts) <= 15 THEN 'ref' ELSE 'cur' END AS period
       |  FROM events),
       |edges AS (
       |  SELECT event_type,
       |         quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS edges
       |  FROM ev WHERE period = 'ref' GROUP BY event_type),
       |binned AS (
       |  SELECT ev.event_type, ev.period,
       |         len(list_filter(edges.edges, e -> ev.value > e)) AS bin,
       |         count(*) AS cnt
       |  FROM ev JOIN edges USING (event_type)
       |  GROUP BY 1, 2, 3),
       |totals AS (SELECT event_type, period, CAST(sum(cnt) AS BIGINT) AS n
       |           FROM binned GROUP BY 1, 2),
       |props AS (
       |  SELECT b.event_type, b.period, b.bin,
       |         greatest(CAST(b.cnt AS DOUBLE) / CAST(t.n AS DOUBLE),
       |                  CAST(1e-6 AS DOUBLE)) AS p
       |  FROM binned b JOIN totals t USING (event_type, period)),
       |bybin AS (SELECT event_type, $pivots FROM props GROUP BY event_type)
       |SELECT bb.event_type,
       |       tr.n AS n_ref, tc.n AS n_cur,
       |       round($terms, 6) AS psi,
       |       round($terms, 6) > CAST(0.2 AS DOUBLE) AS drifted
       |FROM bybin bb
       |JOIN totals tr ON tr.event_type = bb.event_type AND tr.period = 'ref'
       |JOIN totals tc ON tc.event_type = bb.event_type AND tc.period = 'cur'
       |ORDER BY bb.event_type""".stripMargin
  }

  val defs: Map[String, Q] = Map(
    "q_drift" -> qDrift,
    "q_vocab" -> qVocab,
    "q_bpe_train" -> qBpeTrain,
    "q_bpe_apply" -> qBpeApply,
    "q_bpe_segment" -> qBpeSegment,
    "q_cooccur" -> qCooccur,
    "q_dedup_incremental" -> qDedupIncremental,
    "q_shortest_path" -> qShortestPath,
    "q_sssp_weighted" -> qSsspWeighted,
    "q_communities" -> qCommunities,
    "q_recs" -> qRecs,
    "q_ab_test" -> qAbTest,
    "q_reconcile" -> qReconcile,
    "q_chisq" -> qChisq,
    "q_ks_test" -> qKsTest,
    "q_gini" -> qGini,
    "q_mix_apply" -> qMixApply,
    "q_attribution" -> qAttribution,
    "q_stream_anomaly" -> qStreamAnomaly,
    "q_stream_ingest" -> qStreamIngest,
    "q_stream_cc" -> qStreamCc,
    "q_stream_cc_store" -> qStreamCcStore,
    "q_cc_takedown" -> qCcTakedown)

  val oracles: Map[String, String] = Map(
    "q_drift" -> qDriftSql,
    "q_vocab" -> qVocabSql,
    "q_bpe_train" -> qBpeTrainSql,
    "q_bpe_apply" -> qBpeApplySql,
    "q_bpe_segment" -> qBpeSegmentSql,
    "q_cooccur" -> qCooccurSql,
    "q_dedup_incremental" -> qDedupIncrementalSql,
    "q_shortest_path" -> qShortestPathSql,
    "q_sssp_weighted" -> qSsspWeightedSql,
    "q_communities" -> qCommunitiesSql,
    "q_recs" -> qRecsSql,
    "q_ab_test" -> qAbTestSql,
    "q_reconcile" -> qReconcileSql,
    "q_chisq" -> qChisqSql,
    "q_ks_test" -> qKsTestSql,
    "q_gini" -> qGiniSql,
    "q_mix_apply" -> qMixApplySql,
    "q_attribution" -> qAttributionSql,
    "q_stream_anomaly" -> qStreamAnomalySql,
    "q_stream_ingest" -> qDedupIncrementalSql,
    "q_stream_cc" -> qStreamCcSql,
    "q_stream_cc_store" -> qStreamCcSql, // durable path, identical labels
    "q_cc_takedown" -> qCcTakedownSql)
}
