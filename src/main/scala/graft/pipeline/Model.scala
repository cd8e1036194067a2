package graft.pipeline

/** Typed pipeline data model — the Scala/Dataset restatement of the
  * reference's Pydantic models (reference: data_types.py:7-88 and
  * document_parser/data_types.py:13-120; SURVEY.md §1.3). Case classes
  * double as Spark `Encoder` schemas, giving the same compile-time
  * node-boundary contracts the reference gets from Pydantic at
  * runtime.
  */

/** Tagged union of body-level document elements
  * (document_parser/data_types.py:61-84): `element_type` is the
  * discriminator; `text` is set for paragraphs, `table_rows` (cell
  * texts) for tables.
  */
final case class SyllabusElement(
    element_idx: Long,
    element_type: String,
    text: Option[String],
    table_rows: Option[Seq[Seq[String]]])

/** A contiguous run of elements opened by a marker paragraph
  * (document_parser/data_types.py:87-98). Keyed by (doc_id, topic_seq)
  * — duplicate titles stay per-occurrence (SURVEY.md §7.5); only the
  * sink merges by title, matching the reference's file naming.
  */
final case class SyllabusTopic(
    doc_id: String,
    topic_seq: Long,
    title: String,
    elements: Seq[SyllabusElement])

/** data_types.py:7-15. */
final case class Subtopic(
    subtopic_name: String,
    topic_title: String,
    academic_class: String,
    subject: String,
    learning_objectives: Seq[String],
    key_concepts: Seq[String],
    assessment_criteria: Seq[String],
    suggested_activities: Seq[String])

/** data_types.py:62-68; status ∈ planned|generating|completed. */
final case class PlannedQuestion(
    question_id: String,
    topic: String,
    subtopic: String,
    difficulty: String,
    concept_area: String,
    status: String)

/** data_types.py:24-26. */
final case class QuestionChoice(text: String, is_correct: Boolean)

/** data_types.py:29-31. */
final case class QuestionSolution(explanation: String, steps: Seq[String])

/** data_types.py:34-38 — the model's only map type. */
final case class QuestionMetadata(
    created_by: String,
    created_at: String,
    updated_at: String,
    time_estimate: Map[String, String])

/** data_types.py:41-53; golden output shape README.md:248-277. */
final case class Question(
    question_id: String,
    text: String,
    topic: String,
    sub_topic: String,
    academic_class: String,
    examination_level: String,
    difficulty: String,
    tags: Seq[String],
    choices: Seq[QuestionChoice],
    solution: QuestionSolution,
    hint: String,
    metadata: Option[QuestionMetadata])
