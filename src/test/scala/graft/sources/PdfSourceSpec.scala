package graft.sources

import graft.SparkSpec
import graft.sources.DocxSource.RawFile
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.Deflater

class PdfSourceSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal PDF with one content stream (optionally Flate-compressed). */
  private def makePdf(content: String, compress: Boolean): Array[Byte] = {
    val payload =
      if (!compress) content.getBytes("ISO-8859-1")
      else {
        val d = new Deflater()
        d.setInput(content.getBytes("ISO-8859-1")); d.finish()
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      }
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + payload.length +
      " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(payload)
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  private val contentStream =
    """BT /F1 12 Tf (Hello \(PDF\) world) Tj ET
      |BT [(multi) (-part \101) ] TJ ET""".stripMargin

  test("extracts Tj and TJ text from an uncompressed stream, with escapes") {
    val texts = PdfSource.extractStreams(makePdf(contentStream, compress = false))
    assert(texts.length === 1)
    assert(texts.head.contains("Hello (PDF) world"))
    assert(texts.head.contains("multi-part A")) // \101 octal = 'A'
  }

  test("decompresses FlateDecode streams via Inflater") {
    val texts = PdfSource.extractStreams(makePdf(contentStream, compress = true))
    assert(texts.length === 1 && texts.head.contains("Hello (PDF) world"))
  }

  test("non-pdf and corrupt input yield empty, not exceptions") {
    assert(PdfSource.extractStreams("not a pdf".getBytes) === Seq.empty)
    assert(PdfSource.extractStreams(Array[Byte]()) === Seq.empty)
    // valid header, garbage stream: row-level containment
    val garbage = "%PDF-1.4\nstream\n\nendstream".getBytes("ISO-8859-1")
    assert(PdfSource.extractStreams(garbage).forall(_.trim.isEmpty))
  }

  test("end-to-end: scan directory → per-stream text rows") {
    val dir = Files.createTempDirectory("pdf_src").toFile
    val f = new FileOutputStream(new java.io.File(dir, "doc.pdf"))
    f.write(makePdf(contentStream, compress = true)); f.close()
    val f2 = new FileOutputStream(new java.io.File(dir, "notes.txt"))
    f2.write("plain".getBytes); f2.close()
    val rows = PdfSource.extractTextDF(PdfSource.scanPdfFiles(spark, dir.getAbsolutePath))
      .collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("source") === "doc.pdf")
    assert(rows.head.getAs[String]("text").contains("Hello (PDF) world"))
  }
}
