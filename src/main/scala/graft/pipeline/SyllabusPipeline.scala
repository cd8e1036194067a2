package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end pipeline parity (reference E1–E3,
  * _base_syllabus_ai_graph_template.py:76-159): docx → topics →
  * subtopics → plan → batched generation → questions, as Spark
  * stages instead of a per-topic LangGraph loop.
  *
  * Where the reference loops (O9 batch selection → O11 generation →
  * O12 accumulate → O14 decision, one batch at a time), the engine
  * precomputes every `batch_id` and generates ALL batches in one
  * distributed pass — the loop's trip count is known once the plan
  * exists (SURVEY.md §3), so the conditional topology degenerates to
  * a groupBy. The per-topic accumulation (O12 union) is inherent: the
  * output Dataset holds every batch's questions.
  *
  * Reference caveats preserved or deliberately fixed:
  *  - `maxBatchesPerTopic` (default 12) mirrors the LangGraph
  *    `recursion_limit: 50` ceiling ≈ 12 batch iterations
  *    (_base_syllabus_ai_graph_template.py:144; SURVEY.md §7.5) —
  *    batches beyond the cap are dropped exactly as the reference's
  *    recursion error would truncate them. Raise it for real runs.
  *  - Subtopic-context lookup misses yield NO questions for the batch
  *    (syllabus_ai_graph.py:199-201).
  *  - The reference joins the whole batch to the FIRST row's subtopic
  *    (:190-191, a documented bug when a batch straddles subtopics);
  *    the engine batches within (topic, subtopic), so every question
  *    gets its own subtopic's context and batch sizes stay ≤
  *    batchSize. Deviation documented in SURVEY.md §2 O10.
  */
final class SyllabusPipeline(
    model: QuestionModel,
    subject: String,
    academicClass: String,
    val batchSize: Int = 5,
    val perSubtopic: Int = 9,
    val maxBatchesPerTopic: Long = 12,
    val marker: String = "Core element") extends Serializable {
  require(batchSize >= 1 && perSubtopic >= 1 && maxBatchesPerTopic >= 1)

  /** O7 as a distributed flatMap: partition-local model calls, 1 topic
    * ⇒ 0..n subtopics.
    */
  def extractSubtopics(topics: Dataset[SyllabusTopic]): Dataset[Subtopic] = {
    val spark = topics.sparkSession
    import spark.implicits._
    val (m, subj, cls) = (model, subject, academicClass)
    topics.mapPartitions(_.flatMap(t => m.extractSubtopics(t, subj, cls)))
  }

  /** O9+O10+O11+O12 in one pass: batch ids per topic, broadcast
    * subtopic-context join, grouped generation.
    */
  def generate(plan: Dataset[PlannedQuestion], subtopics: Dataset[Subtopic]): Dataset[Question] = {
    val spark = plan.sparkSession
    import spark.implicits._
    // order by (length, id), not the raw string: ids end in a decimal
    // counter, and lexicographic order would put "…-10" before "…-2",
    // truncating an arbitrary subset at the batch cap instead of the
    // plan tail. Within a topic partition the prefix is constant, so
    // length-then-string IS numeric order.
    val w = Window.partitionBy(col("topic"))
      .orderBy(length(col("question_id")), col("question_id"))
    val planB = plan.toDF()
      .withColumn("batch_id", floor((row_number().over(w) - 1) / batchSize))
      .filter(col("batch_id") < maxBatchesPerTopic)
    val ctxDf = subtopics.toDF().select(struct(col("*")).as("ctx_struct"))
      .select(col("ctx_struct"), col("ctx_struct.subtopic_name").as("ctx_name"),
        col("ctx_struct.topic_title").as("ctx_topic"))
    // lookup keyed by (topic, subtopic) — the reference resolves the
    // name within one topic's own subtopics (syllabus_ai_graph.py:190-201)
    val joined = planB
      .join(broadcast(ctxDf),
        planB("subtopic") === ctxDf("ctx_name") && planB("topic") === ctxDf("ctx_topic"),
        "left")
      .select(col("question_id"), col("topic"), col("subtopic"), col("difficulty"),
        col("concept_area"), col("status"), col("batch_id"), col("ctx_struct").as("ctx"))
      .as[PlannedWithCtx]
    val m = model
    joined
      .groupByKey(r => (r.topic, r.batch_id, r.subtopic))
      .flatMapGroups { (key: (String, Long, String), it: Iterator[PlannedWithCtx]) =>
        val rows = it.toSeq.sortBy(r => (r.question_id.length, r.question_id))
        rows.head.ctx match {
          case None => Iterator.empty // O10 miss ⇒ empty (:199-201)
          case ctx @ Some(_) =>
            val batch = rows.map(r => PlannedQuestion(r.question_id, r.topic,
              r.subtopic, r.difficulty, r.concept_area, "generating"))
            // `topic` and `sub_topic` are pinned to the PLANNED group
            // key, not the model echo: sinks partition on topic (a
            // stray title would land rows where a later group's
            // dynamic overwrite clobbers them — ADVICE r4) and
            // downstream grouping joins on sub_topic; the exactly-
            // once-per-title invariant must hold structurally for both
            m.generateQuestions(batch, ctx).iterator
              .map(_.copy(topic = key._1, sub_topic = key._3))
        }
      }
  }

  /** Full run: docx path(s) → questions, optionally saved through a
    * sink (O13/O18).
    */
  /** @param topicsNum reference `process(topics_num)` parity
    *   (_base_syllabus_ai_graph_template.py:114: default 1 topic per
    *   run): caps processing to the FIRST n topics of each document in
    *   document order. None (the engine default) processes everything
    *   — the whole-corpus pass is the point of the distributed
    *   rewrite.
    */
  def run(spark: SparkSession, docxPath: String,
      sink: Option[OutputManager] = None,
      topicsNum: Option[Int] = None): Dataset[Question] = {
    val allTopics = Topics.fromDocx(spark, docxPath, marker)
    val topics = topicsNum match {
      case None => allTopics
      case Some(n) =>
        // topic_seq is the 1-based running marker count per document
        allTopics.filter(org.apache.spark.sql.functions.col("topic_seq") <= n)
    }
    // subtopics feed BOTH the planner and the generation context join;
    // left lazy, each downstream action re-parses the docx corpus.
    // They are small (per-topic metadata, not documents) — materialize
    // once and cut the lineage
    val subs = extractSubtopics(topics).localCheckpoint()
    val plan = Planner.plan(subs, perSubtopic, idsPerTopic = true)
    val questions = generate(plan, subs)
    sink.foreach(_.save(questions))
    questions
  }

  /** [[run]] with in-flight observability: the question count, total
    * question characters and difficulty bounds are collected through
    * Spark's Observation API — accumulator-backed metrics computed by
    * the SAME job that materializes the result (the sink write, or
    * whatever action the caller triggers), NOT a second pass. At
    * corpus scale a metrics `.count()` after the write would re-run
    * the whole generation; this is the production pattern for
    * pipeline health counters (rows emitted, payload size, value
    * bounds) at zero extra cost. Returns the dataset plus a callback
    * that yields the metrics once an action has run.
    */
  def runObserved(spark: SparkSession, docxPath: String,
      sink: Option[OutputManager] = None,
      topicsNum: Option[Int] = None)
      : (Dataset[Question], () => Map[String, Any]) = {
    val obs = org.apache.spark.sql.Observation("syllabus_pipeline")
    val questions = run(spark, docxPath, sink = None, topicsNum)
    val observed = questions.observe(obs,
      count(lit(1)).as("n_questions"),
      sum(length(col("text")).cast("long")).as("question_chars"),
      min(col("difficulty")).as("min_difficulty"),
      max(col("difficulty")).as("max_difficulty"))
    sink.foreach(_.save(observed))
    (observed, () => obs.get)
  }

  /** Crash-resumable run — the engine's analogue of the reference's
    * `langgraph-checkpoint-sqlite` dependency (requirements.txt):
    * LangGraph checkpoints per-topic graph state so a crashed run
    * resumes where it died; here a per-topic COMPLETION MANIFEST
    * (JSON lines of `{topic}` under `manifestDir`) plays that role.
    *
    * The checkpoint unit is the topic TITLE, not the (doc_id,
    * topic_seq) occurrence: titles are the engine's actual
    * independence boundary — the batch window partitions by title,
    * the context join is keyed (title, subtopic), and the sink merges
    * duplicate titles into one partition (the reference's own
    * file-per-title semantic, SURVEY.md §7.5). An occurrence-level
    * checkpoint would split a title across commit groups, and a
    * per-title sink overwrite from group 2 would clobber group 1's
    * rows for the shared title.
    *
    * Titles are processed in groups of `checkpointEvery` (1 =
    * per-title commit); each group is extracted, planned, generated,
    * saved through `sink`, and only THEN recorded in the manifest —
    * on rerun, manifest titles are skipped entirely (the model is
    * never re-invoked for them). Commit order (sink happens-before
    * manifest) makes execution at-least-once; pair with an idempotent
    * per-title sink ([[ResumableJsonOutputManager]]) and the OUTPUT
    * is exactly-once: re-saving the one possibly-duplicated group
    * replaces its title partitions rather than appending. Title
    * independence makes group boundaries invisible: a resumed run's
    * rows are identical to a clean run's AND to the one-pass
    * [[run]]'s (spec-asserted).
    *
    * Only distinct titles are collected to the driver (bounded
    * metadata — the reference's driver loop holds full topic state);
    * the non-resumable [[run]] remains the single-pass path when
    * checkpointing isn't needed.
    *
    * SCALE NOTE: the group loop is a serial driver loop — with the
    * default `checkpointEvery = 1` every title pays its own
    * extract→plan→generate→save job chain. That fine granularity is
    * the POINT of per-title commit (max one title re-executed on
    * crash), but on a large corpus the per-job overhead dominates:
    * raise `checkpointEvery` so each group amortizes the chain over
    * many titles (risking only that group's re-execution on crash),
    * or use the one-pass [[run]] when resume isn't needed.
    */
  def runResumable(spark: SparkSession, docxPath: String,
      sink: OutputManager, manifestDir: String,
      topicsNum: Option[Int] = None, checkpointEvery: Int = 1): Unit = {
    require(checkpointEvery >= 1)
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val allTopics = Topics.fromDocx(spark, docxPath, marker)
    val topics = topicsNum match {
      case None => allTopics
      case Some(n) => allTopics.filter(col("topic_seq") <= n)
    }
    val done: Set[String] =
      try spark.read.schema("topic STRING").json(manifestDir)
        .collect().map(_.getString(0)).toSet
      catch { case _: org.apache.spark.sql.AnalysisException => Set.empty }
    val pending = topics.select(col("title")).distinct()
      .collect().map(_.getString(0))
      .filterNot(done).sorted // deterministic replay order across reruns
    pending.grouped(checkpointEvery).foreach { group =>
      // same persistRound pattern as the iterative operators: the
      // snapshot's blocks actually free at group end (localCheckpoint
      // here would leak them for the session per group — the round-3
      // block-retention class)
      val (subs, subsRdd) = graft.operators.Snapshots.persistRound(
        extractSubtopics(topics.filter(col("title").isin(group: _*))).toDF(), None)
      try {
        val subsDs = subs.as[Subtopic]
        val plan = Planner.plan(subsDs, perSubtopic, idsPerTopic = true)
        sink.save(generate(plan, subsDs))
        // commit point: the group is durable in the sink — record it
        group.toSeq.toDF("topic")
          .coalesce(1).write.mode("append").json(manifestDir)
      } finally subsRdd.unpersist(blocking = false)
    }
  }
}

/** Row shape of the generation stage (top-level so the product
  * encoder derives without an outer-instance capture).
  */
private[pipeline] final case class PlannedWithCtx(
    question_id: String, topic: String, subtopic: String,
    difficulty: String, concept_area: String, status: String,
    batch_id: Long, ctx: Option[Subtopic])
