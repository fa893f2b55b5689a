package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.matching.Regex

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
  case class DocParagraph(source: String, para_idx: Int, text: String)

  /** Binary-file scan of a directory, keeping only ingestible names:
    * drops `~$` Office lock files and non-docx extensions. The name
    * filter runs BEFORE content is read into rows downstream. */
  def scanDocxFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .format("binaryFile")
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

  // self-closing form FIRST (Word emits empty paragraphs as
  // <w:p w:rsidR="..."/> — matching it lazily against the block form
  // would swallow the next real paragraph); <w:pPr> etc. can't match:
  // after "w:p" only '>', whitespace, or '/' qualify
  private val ParaSplit: Regex =
    "(?s)<w:p(?:\\s[^>]*)?/>|<w:p(?:\\s[^>]*)?>.*?</w:p>".r
  private val TextRun: Regex = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>".r

  /** Extract paragraph texts from docx bytes. Corrupt/non-docx input
    * → empty (per-file error containment). Package-private for tests. */
  private[sources] def parseDocx(bytes: Array[Byte]): Seq[String] =
    try {
      documentXml(bytes) match {
        case None => Seq.empty
        case Some(xml) =>
          ParaSplit
            .findAllIn(xml)
            .map(p => TextRun.findAllMatchIn(p).map(m => unescape(m.group(1))).mkString)
            .toSeq
      }
    } catch { case _: Exception => Seq.empty }

  private def documentXml(bytes: Array[Byte]): Option[String] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    try {
      Iterator
        .continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .collectFirst {
          case e if e.getName == "word/document.xml" =>
            new String(zin.readAllBytes(), "UTF-8")
        }
    } finally zin.close()
  }

  private def unescape(s: String): String =
    s.replace("&lt;", "<")
      .replace("&gt;", ">")
      .replace("&quot;", "\"")
      .replace("&apos;", "'")
      .replace("&amp;", "&")
}
