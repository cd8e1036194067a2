package graft.sources.docx

import java.io.InputStream
import java.util.zip.ZipInputStream

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable.ArrayBuffer

/** One body-level docx element in document order.
  *
  * Mirrors the reference's element model (reference:
  * document_parser/syllabus_parser.py:48-70 iterates the direct
  * children of `document._element.body`): a body-level `w:p` becomes a
  * `paragraph` row (text = concatenated runs), a body-level `w:tbl`
  * becomes a `table` row flattened to `array<array<string>>` of cell
  * texts (reference: document_parser/data_types.py:100-120). Other
  * body children (sectPr, bookmarks) are skipped. `idx` preserves the
  * load-bearing document order (SURVEY.md §1.3).
  */
final case class DocxElement(
    idx: Long,
    elementType: String,
    text: String,             // null for tables
    tableRows: Seq[Seq[String]]) // null for paragraphs

/** Pure-JVM OOXML parser: docx (a zip) -> body-level element stream.
  *
  * JDK-only (java.util.zip + StAX) because the build is zero-egress —
  * no POI. Streams `word/document.xml` with a pull parser, so memory
  * is O(largest single element), not O(document): the scale path for a
  * many-file corpus is one task per file (see DocxScan), and within a
  * file this parser never materializes the XML tree.
  *
  * Text semantics match python-docx `Paragraph.text` (what the
  * reference's marker predicate sees, syllabus_parser.py:85): `w:t`
  * runs concatenated, `w:tab` -> "\t", `w:br`/`w:cr` -> "\n". Cell
  * text matches `_Cell.text`: the cell's direct paragraphs joined by
  * "\n" (content of tables nested inside a cell is excluded).
  */
object DocxParser {
  private val W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  /** Parse a .docx stream; caller owns/closes the stream. */
  def parse(in: InputStream): Seq[DocxElement] = {
    val zip = new ZipInputStream(in)
    try {
      var entry = zip.getNextEntry
      while (entry != null && entry.getName != "word/document.xml") {
        entry = zip.getNextEntry
      }
      require(entry != null, "not a docx: no word/document.xml entry")
      parseDocumentXml(zip)
    } finally zip.close()
  }

  /** Parse the inner word/document.xml stream. */
  def parseDocumentXml(in: InputStream): Seq[DocxElement] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    val r = f.createXMLStreamReader(in)
    val out = ArrayBuffer.empty[DocxElement]
    var idx = 0L
    var inBody = false
    var bodyDepth = 0 // element nesting depth relative to <w:body>
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (inBody) {
              bodyDepth += 1
              if (bodyDepth == 1 && r.getNamespaceURI == W) {
                r.getLocalName match {
                  case "p" =>
                    out += DocxElement(idx, "paragraph", readParagraph(r), null)
                    idx += 1; bodyDepth -= 1 // readParagraph consumed the END_ELEMENT
                  case "tbl" =>
                    out += DocxElement(idx, "table", null, readTable(r))
                    idx += 1; bodyDepth -= 1
                  case _ => () // sectPr etc: skipped via depth tracking
                }
              }
            } else if (r.getLocalName == "body" && r.getNamespaceURI == W) {
              inBody = true
            }
          case XMLStreamConstants.END_ELEMENT =>
            if (inBody) {
              if (bodyDepth == 0 && r.getLocalName == "body") inBody = false
              else bodyDepth -= 1
            }
          case _ => ()
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** Reads one <w:p> ... </w:p>, cursor on its START_ELEMENT; returns
    * run text. Consumes through the matching END_ELEMENT.
    */
  private def readParagraph(r: XMLStreamReader): String = {
    val sb = new java.lang.StringBuilder
    var depth = 0
    while (depth >= 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          if (r.getNamespaceURI == W) {
            r.getLocalName match {
              case "t" => sb.append(r.getElementText) // consumes its end tag
              case "tab" => sb.append('\t'); depth += 1
              case "br" | "cr" => sb.append('\n'); depth += 1
              case _ => depth += 1
            }
          } else depth += 1
        case XMLStreamConstants.END_ELEMENT => depth -= 1
        case _ => ()
      }
    }
    sb.toString
  }

  /** Reads one <w:tbl>: rows of cell texts. Nested tables contribute
    * no text (python-docx `_Cell.text` parity).
    */
  private def readTable(r: XMLStreamReader): Seq[Seq[String]] = {
    val rows = ArrayBuffer.empty[Seq[String]]
    var row: ArrayBuffer[String] = null
    var cell: java.lang.StringBuilder = null
    var cellParas = 0
    var depth = 0          // depth inside tbl
    var tblNest = 0        // >0 when inside a nested tbl
    var cellDepth = -1     // depth at which the current tc started
    while (depth >= 0) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val local = if (r.getNamespaceURI == W) r.getLocalName else ""
          local match {
            case "tbl" => tblNest += 1; depth += 1
            case "tr" if tblNest == 0 => row = ArrayBuffer.empty[String]; depth += 1
            case "tc" if tblNest == 0 =>
              cell = new java.lang.StringBuilder; cellParas = 0; cellDepth = depth; depth += 1
            case "p" if tblNest == 0 && cell != null && depth == cellDepth + 1 =>
              if (cellParas > 0) cell.append('\n')
              cellParas += 1
              cell.append(readParagraph(r)) // consumes its end tag; depth unchanged
            case _ => depth += 1
          }
        case XMLStreamConstants.END_ELEMENT =>
          depth -= 1
          val local = if (r.getNamespaceURI == W) r.getLocalName else ""
          local match {
            case "tbl" if tblNest > 0 => tblNest -= 1
            case "tc" if tblNest == 0 && cell != null && depth == cellDepth =>
              row += cell.toString; cell = null; cellDepth = -1
            case "tr" if tblNest == 0 && row != null =>
              rows += row.toSeq; row = null
            case _ => ()
          }
        case _ => ()
      }
    }
    rows.toSeq
  }
}
