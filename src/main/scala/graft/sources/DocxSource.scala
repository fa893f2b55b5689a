package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** DOCX text source — SURVEY.md §2.1 S2/S3 (reference app.py:26-27,
  * 37-38 reads paragraphs via python-docx; PDF needs a codec stack
  * this environment lacks and stays stubbed like multimodal decode).
  *
  * A .docx is a zip archive whose `word/document.xml` holds
  * paragraphs as `<w:p>` elements with text runs in `<w:t>` — both
  * readable with java.util.zip + regex, so the source is REAL (no
  * external libraries), not a stub.
  *
  * Pipeline shape (reference §3.1 startup ingest):
  * `spark.read.format("binaryFile")` scan → lock-file/extension
  * filter (app.py:35-36,144) → per-partition unzip+parse (map-only,
  * payloads never shuffle) → (source, para_idx, text) rows that feed
  * the same segment/embed/dedup operators as the parquet corpus.
  * Corrupt archives yield zero rows rather than failing the job —
  * the reference's load-error fallback semantics (app_callapi.py:
  * 62-63), but per-file instead of dropping the whole DB.
  */
object DocxSource {

  case class RawFile(path: String, content: Array[Byte])
  /** `source` is the file BASENAME — this source scans one flat
    * directory (non-recursive glob, like the reference's
    * os.listdir), where basenames are unique by construction. For
    * recursive corpora use [[DocCorpusSource]], whose identity is
    * the load-root-relative path precisely because basenames collide
    * across subdirectories. */
  case class DocParagraph(source: String, para_idx: Int, text: String)

  /** Binary-file scan of a directory, keeping only ingestible names:
    * drops `~$` Office lock files and non-docx extensions.
    * `pathGlobFilter` prunes at LISTING time — without it the scan
    * would materialize content bytes of every file (and a >2 GB
    * non-docx bystander would kill the job) before the row filter
    * could drop it; the column filter then handles lock files and
    * case variants. */
  def scanDocxFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.{docx,DOCX}")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("source"),
        col("content"))
      .filter(!col("source").startsWith("~$") && col("source").rlike("(?i)\\.docx$"))

  /** Parse each file's paragraphs per partition (map-only). */
  def extractParagraphs(files: Dataset[RawFile]): Dataset[DocParagraph] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.flatMap { f =>
      val name = f.path.substring(f.path.lastIndexOf('/') + 1)
      parseDocx(f.content).zipWithIndex.collect {
        case (text, i) if text.trim.nonEmpty => DocParagraph(name, i, text.trim)
      }
    })
  }

  /** DataFrame convenience: (source, content) → (source, para_idx, text). */
  def extractParagraphsDF(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    extractParagraphs(
      files.select(col("source").as("path"), col("content")).as[RawFile])
      .toDF()
  }

  /** Extract paragraph texts from docx bytes via a real StAX pull
    * parser (regex XML parsing broke on nested `<w:p>` inside text
    * boxes and on numeric character references — &#8217; etc., which
    * the parser decodes natively). One paragraph per TOP-LEVEL
    * `<w:p>`; `<w:t>` runs at any nesting depth (text boxes) are
    * appended to the enclosing top-level paragraph, so no text is
    * lost. Paragraphs inside `<w:tbl>` are SKIPPED — python-docx's
    * `.paragraphs` (the reference's read path, app.py:26-27) iterates
    * body-level paragraphs only and never descends into tables, so
    * including cell text would diverge from the reference on any
    * corpus document containing a table. DTD/external-entity
    * processing is disabled (XXE). Corrupt/non-docx input → empty
    * (per-file error containment). Package-private for tests. */
  private[sources] def parseDocx(bytes: Array[Byte]): Seq[String] =
    try documentXml(bytes).map(parseParagraphs).getOrElse(Seq.empty)
    catch { case _: Exception => Seq.empty }

  private def parseParagraphs(xml: Array[Byte]): Seq[String] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.IS_COALESCING, true)
    // no namespace resolution: fragments need no xmlns declarations,
    // and isName() matches both "p" and "w:p" forms
    f.setProperty(XMLInputFactory.IS_NAMESPACE_AWARE, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
    val paras = Seq.newBuilder[String]
    val buf = new StringBuilder
    var pDepth = 0 // nesting depth of w:p elements
    var tblDepth = 0 // nesting depth of w:tbl elements
    var capturing = false // current top-level paragraph is body-level
    var inText = false
    def isName(n: String): Boolean = { // namespace-config-agnostic
      val ln = r.getLocalName
      ln == n || ln == s"w:$n"
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT =>
            if (isName("tbl")) tblDepth += 1
            else if (isName("p")) {
              pDepth += 1
              if (pDepth == 1) { buf.clear(); capturing = tblDepth == 0 }
            } else if (isName("t") && pDepth >= 1 && capturing) inText = true
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inText) buf.append(r.getText)
          case XMLStreamConstants.END_ELEMENT =>
            if (isName("tbl")) tblDepth = math.max(0, tblDepth - 1)
            else if (isName("p")) {
              pDepth -= 1
              if (pDepth == 0 && capturing) paras += buf.toString
            } else if (isName("t")) inText = false
          case _ =>
        }
      }
    } finally r.close()
    paras.result()
  }

  private def documentXml(bytes: Array[Byte]): Option[Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator
        .continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst { case e if e.getName == "word/document.xml" => zin.readAllBytes() }
    } finally zin.close()
  }
}
