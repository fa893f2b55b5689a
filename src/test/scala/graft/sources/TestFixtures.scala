package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

/** Shared minimal docx/pdf byte fixtures for the source specs — ONE
  * builder per format so every suite exercises the same fixture
  * shape (per-spec copies drift silently when the minimal format
  * needs a change). */
object TestFixtures {

  def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(bytes); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end() // release native zlib memory promptly
    out.toByteArray
  }

  /** Minimal valid docx: a zip holding word/document.xml, namespaced
    * and whitespace-preserving. */
  def makeDocx(paras: Seq[String]): Array[Byte] = {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?><w:document
        | xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"><w:body>""".stripMargin +
        paras.map(p => s"""<w:p><w:r><w:t xml:space="preserve">$p</w:t></w:r></w:p>""").mkString +
        "</w:body></w:document>"
    val bos = new ByteArrayOutputStream()
    val zip = new ZipOutputStream(bos)
    zip.putNextEntry(new ZipEntry("word/document.xml"))
    zip.write(xml.getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    bos.toByteArray
  }

  /** Minimal one-stream PDF; `compress` Flate-compresses the payload
    * AND declares `/Filter /FlateDecode` (the undeclared-filter
    * fallback path has its own dedicated fixture in PdfSourceSpec). */
  def makePdf(content: String, compress: Boolean = false): Array[Byte] = {
    val payload =
      if (compress) deflate(content.getBytes("ISO-8859-1"))
      else content.getBytes("ISO-8859-1")
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + payload.length +
      (if (compress) " /Filter /FlateDecode" else "") +
      " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(payload)
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    bos.toByteArray
  }
}
