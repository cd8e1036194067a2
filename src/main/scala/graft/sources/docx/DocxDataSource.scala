package graft.sources.docx

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for .docx files: `spark.read.format("docx").load(path)`
  * (reference O1, document_parser/syllabus_parser.py:156-172; SURVEY.md
  * §4.2 — the one custom source this engine justifies).
  *
  * Emits the `elements` schema of SURVEY.md §1.3, one row per
  * body-level element in document order:
  * {{{
  *   doc_id string, element_idx long, element_type string,
  *   text string, table_rows array<array<string>>
  * }}}
  *
  * Scale model: one input partition per file — docx files are small
  * (KBs..MBs) and zip+XML decode is the whole cost, so the natural
  * parallel unit is the document, exactly the reference's
  * "topic-based chunking" claim generalized to a corpus. Column
  * pruning is pushed down (a `text`-only projection never builds the
  * table-cell arrays). `doc_id` is the file name, matching the
  * reference keying output by document-derived names.
  */
final class DocxDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "docx"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocxDataSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocxTable(DocxDataSource.resolvePaths(properties.asScala.toMap))

  override def supportsExternalMetadata(): Boolean = false
}

object DocxDataSource {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType),
    StructField("element_idx", LongType, nullable = false),
    StructField("element_type", StringType, nullable = false),
    StructField("text", StringType),
    StructField("table_rows", ArrayType(ArrayType(StringType)))))

  /** The session's Hadoop configuration (carries spark.hadoop.* —
    * s3a credentials, kerberos, etc.); plain `new Configuration()`
    * would silently drop them.
    */
  private[docx] def sessionHadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private val quotedElement = "\"((?:[^\"\\\\]|\\\\.)*)\"".r

  /** Expand the `path`/`paths` option: a directory means every *.docx
    * inside it (non-recursive, like the built-in file sources'
    * default). The `paths` option is the JSON array DataFrameReader
    * serializes — parsed by quoted element (a naive comma split
    * corrupts paths containing commas).
    */
  private[docx] def resolvePaths(props: Map[String, String]): Seq[String] = {
    val raw = props.get("paths")
      .map(p => quotedElement.findAllMatchIn(p)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq)
      .orElse(props.get("path").map(Seq(_)))
      .getOrElse(throw new IllegalArgumentException("docx source requires a path"))
    val conf = sessionHadoopConf()
    raw.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        fs.listStatus(path).toSeq.filter(s => s.isFile && s.getPath.getName.endsWith(".docx"))
          .map(_.getPath.toString).sorted
      else Seq(p)
    }
  }

  /** Convenience reader (same result as format("docx").load). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("docx").load(path)
}

private[docx] final class DocxTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"docx(${paths.mkString(",")})"
  override def schema(): StructType = DocxDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocxScanBuilder(paths)
}

private[docx] final class DocxScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = DocxDataSource.schema
  private var pushed: Array[sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Accept `element_type = '…'` / IN filters (SURVEY.md §4.2's
    * candidate pushdown): a paragraph-only scan then never builds
    * table-cell arrays. `doc_id` equality/IN filters are accepted too
    * and prune whole FILES at planning time — doc_id IS the file name,
    * so a one-document lookup over a corpus of thousands of docx files
    * opens exactly one zip instead of every one (the docx analogue of
    * parquet partition pruning). Everything else stays post-scan.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    val (accepted, rest) = filters.partition {
      case sources.EqualTo("element_type", _: String) => true
      case sources.In("element_type", vs) => vs.forall(_.isInstanceOf[String])
      case sources.EqualTo("doc_id", _: String) => true
      case sources.In("doc_id", vs) => vs.forall(_.isInstanceOf[String])
      case _ => false
    }
    pushed = accepted
    // DSv2 contract: filters NOT returned here are REMOVED from the
    // query plan — Spark does not re-apply them post-scan. Accepting a
    // filter is a promise of exact enforcement: element_type is
    // filtered row-by-row in the reader, doc_id by whole-file pruning
    // (exact because every row's doc_id IS its file's name). Any
    // future approximate pruning must return its filter in `rest`.
    rest
  }
  override def pushedFilters(): Array[sources.Filter] = pushed

  private def pushedSet(column: String): Option[Set[String]] = {
    val sets = pushed.collect {
      case sources.EqualTo(`column`, v: String) => Set(v)
      case sources.In(`column`, vs) => vs.collect { case s: String => s }.toSet
    }
    if (sets.isEmpty) None else Some(sets.reduce(_ intersect _))
  }

  override def build(): Scan =
    new DocxScan(paths, required, pushedSet("element_type"), pushedSet("doc_id"))
}

private[docx] final class DocxScan(paths: Seq[String], required: StructType,
    elementTypes: Option[Set[String]], docIds: Option[Set[String]]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** doc_id pushdown lands HERE, not in the reader: non-matching files
    * produce no partition at all — never opened, never even scheduled.
    */
  override def planInputPartitions(): Array[InputPartition] =
    paths.filter(p => docIds.forall(_.contains(new Path(p).getName)))
      .map(p => DocxInputPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory = {
    // capture the session conf on the DRIVER and ship it serialized —
    // executors have no active session to rebuild it from
    val conf = new org.apache.spark.util.SerializableConfiguration(
      DocxDataSource.sessionHadoopConf())
    new DocxReaderFactory(required, elementTypes, conf)
  }
  override def description(): String =
    s"DocxScan(types=${elementTypes.map(_.mkString("|")).getOrElse("*")}," +
      s" docs=${docIds.map(_.mkString("|")).getOrElse("*")})"
}

private[docx] final case class DocxInputPartition(path: String) extends InputPartition

private[docx] final class DocxReaderFactory(required: StructType,
    elementTypes: Option[Set[String]],
    conf: org.apache.spark.util.SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new DocxPartitionReader(partition.asInstanceOf[DocxInputPartition].path,
      required, elementTypes, conf.value)
}

/** Executor-side reader: opens the file through the Hadoop FS API (so
  * file:// and hdfs:// etc. all work), streams it through DocxParser,
  * and projects to the pruned schema.
  */
private[docx] final class DocxPartitionReader(pathStr: String, required: StructType,
    elementTypes: Option[Set[String]] = None,
    hadoopConf: Configuration = new Configuration())
    extends PartitionReader[InternalRow] {
  private val path = new Path(pathStr)
  private val docId = UTF8String.fromString(path.getName)
  private val needTables = required.fieldNames.contains("table_rows")
  private val elements: Iterator[DocxElement] = {
    val fs = path.getFileSystem(hadoopConf)
    val in = fs.open(path)
    val all = try DocxParser.parse(in).iterator finally in.close()
    elementTypes match {
      case None => all
      case Some(ts) => all.filter(e => ts.contains(e.elementType))
    }
  }
  private var current: DocxElement = _

  override def next(): Boolean = {
    if (elements.hasNext) { current = elements.next(); true } else false
  }

  override def get(): InternalRow = {
    val values = required.fieldNames.map {
      case "doc_id" => docId
      case "element_idx" => current.idx
      case "element_type" => UTF8String.fromString(current.elementType)
      case "text" =>
        if (current.text == null) null else UTF8String.fromString(current.text)
      case "table_rows" =>
        if (!needTables || current.tableRows == null) null
        else new GenericArrayData(current.tableRows.map(r =>
          new GenericArrayData(r.map(UTF8String.fromString(_)).toArray[Any]): ArrayData).toArray[Any])
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    InternalRow.fromSeq(values.toSeq)
  }

  override def close(): Unit = ()
}
