package graft.sources

import graft.SparkSpec
import graft.sources.DocxSource._
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class DocxSourceSpec extends SparkSpec {
  import spark.implicits._

  import TestFixtures.makeDocx

  test("parseDocx extracts paragraph texts in order, multi-run and escaped") {
    val multiRun =
      """<?xml version="1.0"?><w:document><w:body>
        |<w:p><w:r><w:t>hello </w:t></w:r><w:r><w:t>world</w:t></w:r></w:p>
        |<w:p w:rsidR="00AB12CD"/>
        |<w:p><w:r><w:t>a &amp; b &lt;tag&gt;</w:t></w:r></w:p>
        |<w:p/>
        |</w:body></w:document>""".stripMargin
    val bos = new ByteArrayOutputStream(); val zos = new ZipOutputStream(bos)
    zos.putNextEntry(new ZipEntry("word/document.xml"))
    zos.write(multiRun.getBytes("UTF-8")); zos.closeEntry(); zos.close()
    val paras = DocxSource.parseDocx(bos.toByteArray)
    // the attributed self-closing paragraph (Word's empty-para form)
    // must yield its own empty slot, not swallow the next paragraph
    assert(paras === Seq("hello world", "", "a & b <tag>", ""))
  }

  test("table-cell paragraphs are skipped, matching python-docx .paragraphs (app.py:26-27)") {
    // body para + table with a cell para + trailing body para: the
    // reference's python-docx .paragraphs never descends into w:tbl
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?><w:document
        | xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>
        |<w:p><w:r><w:t>before table</w:t></w:r></w:p>
        |<w:tbl><w:tr><w:tc><w:p><w:r><w:t>cell text</w:t></w:r></w:p></w:tc></w:tr></w:tbl>
        |<w:p><w:r><w:t>after table</w:t></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    zip.putNextEntry(new ZipEntry("word/document.xml"))
    zip.write(xml.getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    assert(DocxSource.parseDocx(bos.toByteArray) === Seq("before table", "after table"))
  }

  test("parseDocx on corrupt bytes yields empty, not an exception (app_callapi.py:62-63)") {
    assert(DocxSource.parseDocx("not a zip at all".getBytes) === Seq.empty)
    assert(DocxSource.parseDocx(Array[Byte]()) === Seq.empty)
  }

  test("extractParagraphs drops blank paragraphs and keeps positional index") {
    // basename identity is THIS source's contract (flat-directory
    // scan — see DocParagraph scaladoc); recursive corpora go through
    // DocCorpusSource's root-relative identity instead
    val files = Seq(RawFile("/data/report.docx", makeDocx(Seq("first", "  ", "third")))).toDS()
    val rows = extractParagraphs(files).collect().sortBy(_.para_idx)
    assert(rows.map(r => (r.source, r.para_idx, r.text)).toSeq ===
      Seq(("report.docx", 0, "first"), ("report.docx", 2, "third")))
  }

  test("end-to-end: binaryFile scan → lock-file filter → paragraphs") {
    val dir = Files.createTempDirectory("docx_src").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val fos = new FileOutputStream(new java.io.File(dir, name))
      fos.write(bytes); fos.close()
    }
    write("a.docx", makeDocx(Seq("alpha beta", "gamma")))
    write("~$a.docx", Array[Byte](1, 2, 3)) // Office lock file
    write("notes.txt", "plain".getBytes)
    val scanned = scanDocxFiles(spark, dir.getAbsolutePath)
    assert(scanned.select("source").as[String].collect().toSet === Set("a.docx"))
    val paras = extractParagraphsDF(scanned).orderBy("para_idx").collect()
    assert(paras.map(_.getString(2)).toSeq === Seq("alpha beta", "gamma"))
  }
}
