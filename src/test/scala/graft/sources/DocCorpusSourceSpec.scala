package graft.sources

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class DocCorpusSourceSpec extends SparkSpec {
  import spark.implicits._

  private def makeDocx(paras: Seq[String]): Array[Byte] = {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?><w:document
        | xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""".stripMargin +
        paras.map(p => s"<w:p><w:r><w:t>$p</w:t></w:r></w:p>").mkString +
        "</w:body></w:document>"
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    zip.putNextEntry(new ZipEntry("word/document.xml"))
    zip.write(xml.getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    bos.toByteArray
  }

  private def makePdf(content: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + content.length + " >>\nstream\n")
      .getBytes("ISO-8859-1"))
    bos.write(content.getBytes("ISO-8859-1"))
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  private def corpusDir(): String = {
    val dir = Files.createTempDirectory("doc_corpus").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new java.io.File(dir, name)); f.write(bytes); f.close()
    }
    write("a.docx", makeDocx(Seq("alpha one", "beta two")))
    write("b.pdf", makePdf("BT (pdf text here) Tj ET"))
    write("~$a.docx", "lock".getBytes) // skipped
    write("notes.txt", "plain".getBytes) // skipped
    dir.getAbsolutePath
  }

  test("DSv2 source reads docx paragraphs and pdf streams, one partition per file") {
    val df = spark.read.format("graft.sources.DocCorpusSource").load(corpusDir())
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(rows === Set(
      ("a.docx", "docx", 0, "alpha one"),
      ("a.docx", "docx", 1, "beta two"),
      ("b.pdf", "pdf", 0, "pdf text here")))
    assert(df.rdd.getNumPartitions === 2) // one partition per accepted file
  }

  test("column pruning reaches the custom scan (text absent from ReadSchema)") {
    val df = spark.read.format("graft.sources.DocCorpusSource").load(corpusDir())
      .select("source", "kind")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("source") && !plan.contains("text"))
    assert(df.distinct().collect().length === 2)
  }
}
