package graft.tools

/** The q_multimodal GOLDEN MANIFEST (VERDICT r14 next-round #7 — the
  * q_docx precedent applied to the media fixture): the encoded byte
  * size of each synthetic media payload is a pure function of
  * (doc_id, JDK codec), measured ONCE by direct driver-side codec
  * calls — never through the Spark pipeline under test — and
  * committed as `src/main/resources/graft/multimodal_golden.csv`.
  * The q_multimodal oracle joins that manifest (its only
  * non-SQL-expressible column) with the synthesis-formula dims the
  * decode-trio oracles already restate in SQL, promoting the query
  * from `no_oracle` to a full rows+schema+hash check.
  *
  * [[main]] regenerates the resource (run after any deliberate
  * change to the synthesis formulas or a JDK codec bump);
  * MultimodalGoldenSpec re-measures per test run and fails LOUDLY on
  * any drift between the committed file and the live codecs — the
  * engine can never silently follow a codec change.
  */
object MultimodalGolden {

  /** doc_id range covering EVERY fixture sf (sf0.001/sf0.01 share the
    * same 500 rows; sf0.1 has 5,000 — TESTDATA.md): the oracle joins
    * the manifest against the sf's documents table, so a superset
    * manifest serves all three SFs (MultimodalGoldenSpec asserts the
    * coverage).
    */
  val FixtureIds: Range = 0 until 5000

  /** (doc_id, n_bytes) measured by direct codec synthesis — the
    * independent measurement the committed resource snapshots.
    */
  def measure(ids: Seq[Long]): Seq[(Long, Long)] = {
    import graft.multimodal.Multimodal._
    ids.map { id =>
      val payload = (id % 3) match {
        case 0 => ImageIoCodec.synthesize(id)
        case 1 => WavCodec.synthesize(id)
        case _ => AviCodec.synthesize(id)
      }
      (id, payload.length.toLong)
    }
  }

  /** The committed manifest, parsed. */
  def committed(): Seq[(Long, Long)] = {
    val in = getClass.getResourceAsStream("/graft/multimodal_golden.csv")
    require(in != null, "missing resource graft/multimodal_golden.csv — " +
      "run graft.tools.MultimodalGolden to regenerate")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.isEmpty || l.startsWith("#"))
      .map { l =>
        val Array(a, b) = l.split(",")
        (a.toLong, b.toLong)
      }.toSeq
    finally in.close()
  }

  /** The golden VALUES body for the q_multimodal oracle SQL. */
  def valuesSql(): String =
    committed().map { case (id, n) => s"($id, $n)" }.mkString(", ")

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get(args.headOption.getOrElse(
      "src/main/resources/graft/multimodal_golden.csv"))
    java.nio.file.Files.createDirectories(out.getParent)
    val body = "# doc_id,n_bytes — measured by direct codec synthesis " +
      "(graft.tools.MultimodalGolden); regenerate via its main\n" +
      measure(FixtureIds.map(_.toLong)).map { case (id, n) => s"$id,$n" }
        .mkString("", "\n", "\n")
    java.nio.file.Files.write(out,
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote ${out.toAbsolutePath} (${FixtureIds.size} rows)")
  }
}
