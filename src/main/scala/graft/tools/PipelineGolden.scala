package graft.tools

/** The q_pipeline GOLDEN MANIFEST (VERDICT r15 next-round #6 — the
  * q_docx/q_multimodal precedent applied to the pipeline flagship):
  * the stub generator is fully deterministic (hash-seeded template
  * questions honoring the plan's difficulty/count constraints over
  * the committed chemistry fixture docx), so its per-topic aggregate
  * is a fixed 6-row table — measured ONCE by running the pipeline,
  * committed here, restated as a VALUES oracle, and re-measured per
  * test run by PipelineGoldenSpec so stub/parser/planner drift fails
  * LOUDLY instead of silently shifting a `no_oracle` row.
  *
  * Columns: (topic, n_questions, n_subtopics, n_difficulties) —
  * grouped over the full SyllabusPipeline.run output on
  * `chemistry_form_1_2.docx` with StubQuestionModel (see
  * graft.queries.Core.qPipeline).
  */
object PipelineGolden {

  val Rows: Seq[(String, Long, Long, Long)] = Seq(
    ("Analytical skills in chemistry", 60L, 7L, 3L),
    ("Chemical composition of matter", 18L, 2L, 3L),
    ("Chemical reactions", 18L, 2L, 3L),
    ("Environmental chemistry", 18L, 2L, 3L),
    ("Inorganic compounds", 27L, 3L, 3L),
    ("Organic chemistry", 18L, 2L, 3L))

  /** The golden VALUES body for the q_pipeline oracle SQL. */
  def valuesSql(): String = Rows.map { case (t, q, s, d) =>
    s"('${t.replace("'", "''")}', $q, $s, $d)"
  }.mkString(",\n  ")
}
