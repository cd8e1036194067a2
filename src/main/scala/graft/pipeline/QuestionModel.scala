package graft.pipeline

/** The LLM seam (SURVEY.md §4.2): the reference's three model-backed
  * nodes (O7 subtopic extraction, O8 planning, O11 generation —
  * syllabus_ai_graph.py:45-271) sit behind this trait. The engine
  * calls it from `mapPartitions`/`flatMapGroups` stages, so an
  * implementation backed by a real model API inherits batching,
  * partition-level rate limiting and retry placement for free; the
  * in-repo default is the deterministic stub below (zero-egress
  * build, and the reference's own `temperature=0` shows determinism
  * was the intent, syllabus_ai_graph.py:29).
  *
  * Planning (O8) is NOT on the trait: its constraints are relational
  * and the engine builds plans declaratively (see [[Planner]]).
  */
trait QuestionModel extends Serializable {

  /** O7: one topic ⇒ 0..n subtopics (syllabus_ai_graph.py:45-90).
    * A failure inside an implementation must degrade to Nil — the
    * reference's parse-or-empty contract (:88-90).
    */
  def extractSubtopics(topic: SyllabusTopic, subject: String,
      academicClass: String): Seq[Subtopic]

  /** O11: one planned batch + its subtopic context ⇒ questions
    * (syllabus_ai_graph.py:184-271). Must preserve `question_id` and
    * `difficulty` of every planned question (prompt constraints
    * :229-230); failure degrades to Nil (:269-271).
    */
  def generateQuestions(batch: Seq[PlannedQuestion],
      context: Option[Subtopic]): Seq[Question]
}

/** Bounded-retry + request-batching decorator for any [[QuestionModel]]
  * — the configuration surface for the reference's own open issues
  * (rate limiting, retry logic, request batching —
  * /root/reference/README.md:325-328), which SURVEY §4.2 locates at
  * this seam. Wrap the real API-backed implementation:
  * `new ResilientQuestionModel(apiModel, maxRetries = 3, backoffMs = 500)`.
  *
  *  - Each model call is retried up to `maxRetries` times with linear
  *    backoff (`backoffMs * attempt` — the polite shape under
  *    rate-limit errors). Still failing ⇒ degrade to Nil, the
  *    reference's parse-or-empty contract
  *    (syllabus_ai_graph.py:88-90,269-271): one poisoned topic/batch
  *    never fails a corpus run.
  *  - `maxBatchSize` splits oversized generation batches into
  *    sub-calls (request batching): a permanent failure then degrades
  *    only its own sub-batch, and the per-call payload stays bounded
  *    regardless of the caller's batch build.
  *
  * The decorator composes per-call, so inside `mapPartitions` stages
  * the retries happen task-locally — a retry re-invokes the model for
  * ONE topic/batch, never the whole partition.
  */
final class ResilientQuestionModel(inner: QuestionModel,
    maxRetries: Int = 2, backoffMs: Long = 0L,
    maxBatchSize: Int = Int.MaxValue) extends QuestionModel {
  require(maxRetries >= 0 && backoffMs >= 0 && maxBatchSize >= 1)

  private def withRetry[T](empty: T)(call: => T): T = {
    var attempt = 0
    var out = empty
    var done = false
    while (!done) {
      try { out = call; done = true }
      catch {
        case scala.util.control.NonFatal(_) if attempt < maxRetries =>
          attempt += 1
          if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
        case scala.util.control.NonFatal(_) =>
          done = true // degrade to empty (parse-or-empty)
      }
    }
    out
  }

  override def extractSubtopics(topic: SyllabusTopic, subject: String,
      academicClass: String): Seq[Subtopic] =
    withRetry(Seq.empty[Subtopic])(
      inner.extractSubtopics(topic, subject, academicClass))

  override def generateQuestions(batch: Seq[PlannedQuestion],
      context: Option[Subtopic]): Seq[Question] =
    batch.grouped(maxBatchSize).toSeq.flatMap(sub =>
      withRetry(Seq.empty[Question])(inner.generateQuestions(sub, context)))
}

/** Token-bucket PACING decorator — the last of the reference's three
  * promised API-hardening features (rate limiting + retry logic +
  * request batching, /root/reference/README.md:325-328;
  * [[ResilientQuestionModel]] carries the other two; compose as
  * `new ResilientQuestionModel(new PacedQuestionModel(api, rps), …)`
  * so retries are ALSO paced — a retry storm is exactly the moment
  * the limiter must hold).
  *
  * Classic token bucket: capacity `burst`, refill `requestsPerSecond`
  * tokens/s. Each model call acquires one token, BLOCKING until one
  * accrues — so any window of length W seconds carries at most
  * `burst + rps·W` calls (spec-proven under a virtual clock). State
  * is per-instance and `@transient`: after task deserialization each
  * Spark task gets a fresh full bucket, so the bound is per
  * TASK/partition — size `rps = apiLimit / spark.executor.cores ×
  * executors` (the partition-level placement SURVEY §4.2 assigns this
  * seam; a cluster-global limiter would need an external coordinator,
  * which an embarrassingly-parallel map stage deliberately avoids).
  * Because every task SPAWN starts a full bucket, task churn (retries,
  * speculative copies, many short-lived tasks per slot) adds up to
  * `burst` unpaced calls per spawn on top of the steady rate — keep
  * `burst` at its default 1 for cluster maps, and include churn
  * headroom in the sizing (e.g. `rps = 0.8 × apiLimit / slots` when
  * speculation is on) rather than counting on the steady-state bound
  * alone.
  *
  * `nanoTime`/`sleeper` are injectable for deterministic tests; the
  * defaults are the real clock. Thread-safe (synchronized acquire):
  * driver-side local pipelines may share one instance across threads.
  */
final class PacedQuestionModel(inner: QuestionModel,
    requestsPerSecond: Double, burst: Int = 1,
    nanoTime: () => Long = () => System.nanoTime(),
    sleeper: Long => Unit = Thread.sleep(_)) extends QuestionModel {
  require(requestsPerSecond > 0 && burst >= 1)

  // Long.MinValue = "bucket not initialized" — survives BOTH fresh
  // construction and deserialization into a task (transient primitives
  // reset to 0, which is a VALID nanoTime; the sentinel is restored by
  // readObject below)
  @transient private var last: Long = Long.MinValue
  @transient private var tokens: Double = 0.0

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    last = Long.MinValue
  }

  /** Blocks until a token is available, then consumes it. */
  private def acquire(): Unit = synchronized {
    val now = nanoTime()
    if (last == Long.MinValue) { last = now; tokens = burst.toDouble }
    else {
      tokens = math.min(burst.toDouble,
        tokens + (now - last) / 1e9 * requestsPerSecond)
      last = now
    }
    if (tokens >= 1.0) tokens -= 1.0
    else {
      val waitMs = math.ceil((1.0 - tokens) / requestsPerSecond * 1000).toLong
      sleeper(waitMs)
      val after = nanoTime()
      // accrue for the actual slept span (virtual or real), then spend
      tokens = math.min(burst.toDouble,
        tokens + (after - last) / 1e9 * requestsPerSecond) - 1.0
      last = after
    }
  }

  override def extractSubtopics(topic: SyllabusTopic, subject: String,
      academicClass: String): Seq[Subtopic] = {
    acquire()
    inner.extractSubtopics(topic, subject, academicClass)
  }

  override def generateQuestions(batch: Seq[PlannedQuestion],
      context: Option[Subtopic]): Seq[Question] = {
    acquire()
    inner.generateQuestions(batch, context)
  }
}

/** Deterministic, pure-Scala QuestionModel: content is hash-seeded
  * from the inputs, so the same document always yields the same
  * questions (same spirit as the reference's temperature=0, but
  * actually reproducible). Honors every plan/generation constraint
  * the reference's prompts demand: ≥1 subtopic per non-empty topic,
  * 4 choices with exactly 1 correct, explanation+steps, hint,
  * id/difficulty preservation.
  */
final class StubQuestionModel extends QuestionModel {

  private def h(s: String): Long = {
    // FNV-1a 64-bit: stable across JVMs (String.hashCode is too, but
    // FNV gives better spread for seeding)
    var x = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { x ^= s.charAt(i).toLong; x *= 0x100000001b3L; i += 1 }
    x
  }

  /** One subtopic per table element (the syllabus grids are where the
    * reference's prompt mines objectives/criteria, FIXTURES.md), with
    * a paragraph-derived fallback so text-only topics still yield one.
    * Names embed `doc_id` AND `topic_seq` so duplicate topic titles
    * (13 markers / 6 titles in the fixture) keep per-occurrence
    * subtopics — including occurrences in DIFFERENT documents of a
    * corpus, which would otherwise collide in the (topic, subtopic)
    * context join. The reference processes each occurrence as a fresh
    * State and only the sink merges by title (SURVEY.md §7.5).
    */
  override def extractSubtopics(topic: SyllabusTopic, subject: String,
      academicClass: String): Seq[Subtopic] = {
    val tables = topic.elements.filter(_.element_type == "table")
    def cells(t: SyllabusElement): Seq[String] =
      t.table_rows.getOrElse(Nil).flatten.map(_.trim).filter(_.nonEmpty)
    val fromTables = tables.zipWithIndex.map { case (t, i) =>
      val cs = cells(t)
      Subtopic(
        subtopic_name = s"${topic.title} [${topic.doc_id}#${topic.topic_seq}] — part ${i + 1}",
        topic_title = topic.title,
        academic_class = academicClass,
        subject = subject,
        learning_objectives = cs.take(3),
        key_concepts = cs.slice(3, 7),
        assessment_criteria = cs.slice(7, 9),
        suggested_activities = cs.slice(9, 11))
    }
    if (fromTables.nonEmpty) fromTables
    else {
      val paras = topic.elements.flatMap(_.text).map(_.trim).filter(_.nonEmpty)
      if (paras.isEmpty) Nil
      else Seq(Subtopic(s"${topic.title} [${topic.doc_id}#${topic.topic_seq}] — overview", topic.title, academicClass,
        subject, paras.take(3), paras.slice(3, 7), Nil, Nil))
    }
  }

  override def generateQuestions(batch: Seq[PlannedQuestion],
      context: Option[Subtopic]): Seq[Question] =
    batch.map { pq =>
      val seed = h(pq.question_id + "|" + pq.topic + "|" + pq.subtopic)
      val correct = (math.floorMod(seed, 4)).toInt
      val choices = (0 until 4).map(i =>
        QuestionChoice(s"Option ${('A' + i).toChar}: ${pq.concept_area} case ${math.floorMod(seed >> (8 * i), 97)}",
          is_correct = i == correct))
      Question(
        question_id = pq.question_id,
        text = s"[${pq.difficulty}] Which statement about ${pq.concept_area} (${pq.subtopic}) is correct?",
        topic = pq.topic,
        sub_topic = pq.subtopic,
        academic_class = context.map(_.academic_class).getOrElse(""),
        examination_level = "MSCE",
        difficulty = pq.difficulty,
        tags = Seq(pq.topic, pq.concept_area).filter(_.nonEmpty),
        choices = choices,
        solution = QuestionSolution(
          explanation = s"Option ${('A' + correct).toChar} follows from ${pq.concept_area}.",
          steps = Seq(s"Recall ${pq.concept_area}.", "Eliminate inconsistent options.")),
        hint = s"Consider ${pq.concept_area}.",
        metadata = Some(QuestionMetadata(
          created_by = "graft-stub",
          created_at = "1970-01-01T00:00:00Z", // fixed: determinism over wall clock
          updated_at = "1970-01-01T00:00:00Z",
          time_estimate = Map("easy" -> "60s", "medium" -> "90s", "hard" -> "120s")
            .filter(_._1 == pq.difficulty))))
    }
}
