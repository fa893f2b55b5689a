package graft.sources

import graft.SparkSpec
import graft.sources.DocxSource.RawFile
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.Deflater

class PdfSourceSpec extends SparkSpec {
  import spark.implicits._

  import TestFixtures.{deflate, makePdf}

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

  test("undeclared-filter compressed streams still decode (blind inflate fallback)") {
    // no /Filter entry at all: real writers sometimes omit it on
    // object streams — the opportunistic inflate-else-raw path
    val pdf = makeFilteredPdf(deflate(contentStream.getBytes("ISO-8859-1")), "")
    assert(PdfSource.extractStreams(pdf).exists(_.contains("Hello (PDF) world")))
  }

  test("non-pdf and corrupt input yield empty, not exceptions") {
    assert(PdfSource.extractStreams("not a pdf".getBytes) === Seq.empty)
    assert(PdfSource.extractStreams(Array[Byte]()) === Seq.empty)
    // valid header, garbage stream: row-level containment
    val garbage = "%PDF-1.4\nstream\n\nendstream".getBytes("ISO-8859-1")
    assert(PdfSource.extractStreams(garbage).forall(_.trim.isEmpty))
  }

  /** CID/Type0 fixture: a ToUnicode CMap stream (bfchar + bfrange,
    * Korean targets) plus a content stream showing hex strings — the
    * shape PyMuPDF handles on the reference's own Korean corpus. */
  private def makeCidPdf(compressCmap: Boolean): Array[Byte] = {
    val cmap =
      """/CIDInit /ProcSet findresource begin
        |begincmap
        |2 beginbfchar
        |<0001> <C548>
        |<0002> <B155>
        |endbfchar
        |1 beginbfrange
        |<0010> <0012> <D558>
        |endbfrange
        |endcmap
        |endcmap CMapName currentdict /CMap defineresource pop end end""".stripMargin
    val cmapPayload =
      if (!compressCmap) cmap.getBytes("ISO-8859-1")
      else deflate(cmap.getBytes("ISO-8859-1"))
    val content = "BT /F1 12 Tf <00010002> Tj [<0010> <0011>] TJ <0012> Tj ET"
    val bos = new ByteArrayOutputStream()
    // MULTI-DIGIT length object number: `/Length 14 0 R` must resolve
    // indirectly, not backtrack-match a truncated direct length ("1")
    bos.write(("%PDF-1.4\n14 0 obj\n" + content.length + "\nendobj\n" +
      "2 0 obj\n<< /Length " + cmapPayload.length +
      (if (compressCmap) " /Filter /FlateDecode" else "") +
      " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(cmapPayload)
    bos.write(("\nendstream\nendobj\n3 0 obj\n<< /Length 14 0 R >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  test("CID/Type0: hex strings decode through the ToUnicode CMap (bfchar + bfrange)") {
    for (compressed <- Seq(false, true)) {
      val texts = PdfSource.extractStreams(makeCidPdf(compressed)).filter(_.trim.nonEmpty)
      assert(texts.length === 1, s"compressed=$compressed")
      // <0001><0002> → 안녕; bfrange <0010>-<0012> → 하하하 base+offset
      assert(texts.head.contains("안녕"), s"compressed=$compressed")
      assert(texts.head.contains("하") && texts.head.contains("하학"),
        s"compressed=$compressed: bfrange offsets 하(D558) 학(D559)")
      assert(texts.head.contains("핚"), s"compressed=$compressed: third range code")
    }
  }

  test("mixed literal and hex text keeps document order within and across show ops") {
    val cmap = "1 beginbfchar\n<0001> <C548>\nendbfchar"
    val content = "BT (Hello ) Tj [(mid ) <0001> ( end)] TJ <0001> Tj (tail) Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + cmap.length + " >>\nstream\n" + cmap +
      "\nendstream\nendobj\n2 0 obj\n<< /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val text = PdfSource.extractStreams(pdf).filter(_.trim.nonEmpty).head
    // interleaving preserved: array item order AND operator order
    assert(text === "Hello  mid 안 end 안 tail")
  }

  test("/Length is honored: binary streams containing literal 'endstream' do not truncate") {
    val content = "BT (x endstream y) Tj ET"
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + content.length +
      " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(content.getBytes("ISO-8859-1"))
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    val texts = PdfSource.extractStreams(bos.toByteArray)
    assert(texts.exists(_.contains("x endstream y"))) // the old scan cut at 'endstream'
  }

  test("a lying /Length falls back to the endstream scan") {
    val content = "BT (ok) Tj ET"
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length 999999 >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(content.getBytes("ISO-8859-1"))
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    assert(PdfSource.extractStreams(bos.toByteArray).exists(_.contains("ok")))
  }

  // ---- /Filter chains: LZWDecode, ASCIIHexDecode ----

  /** PDF LZW encoder (test-side twin of PdfSource.lzwDecode): clear
    * code first, 9→12-bit MSB-first codes, one-early width change. */
  private def lzwEncode(input: Array[Byte]): Array[Byte] = {
    val dict = scala.collection.mutable.Map[Seq[Byte], Int]()
    for (i <- 0 until 256) dict(Seq(i.toByte)) = i
    var nextCode = 258
    var codeLen = 9
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << codeLen) | code; bitCnt += codeLen
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    emit(256)
    var w = Seq.empty[Byte]
    for (b <- input) {
      val wb = w :+ b
      if (dict.contains(wb)) w = wb
      else {
        emit(dict(w))
        dict(wb) = nextCode; nextCode += 1
        if (nextCode >= (1 << codeLen) && codeLen < 12) codeLen += 1
        w = Seq(b)
      }
    }
    if (w.nonEmpty) emit(dict(w))
    emit(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  test("lzwDecode: hand-computed 9-bit vector (ABABABA) decodes exactly") {
    // codes 256,65,66,258,260,257 packed MSB-first — derived by hand,
    // independent of the test-side encoder
    val vec = Array(0x80, 0x10, 0x48, 0x50, 0x28, 0x24, 0x04).map(_.toByte)
    assert(PdfSource.lzwDecode(vec).map(new String(_, "ISO-8859-1")) === Some("ABABABA"))
  }

  test("lzwDecode: round-trips across the 9->10-bit width change; junk is contained") {
    // > 253 dictionary adds forces the code width to grow mid-stream
    val text = (0 until 600).map(i => ((i * 37 + i / 7) % 90 + 33).toChar).mkString
    val enc = lzwEncode(text.getBytes("ISO-8859-1"))
    assert(PdfSource.lzwDecode(enc).map(new String(_, "ISO-8859-1")) === Some(text))
    assert(PdfSource.lzwDecode("not lzw at all ÿþ".getBytes("ISO-8859-1"))
      .forall(_.length >= 0)) // no throw
  }

  test("asciiHexDecode: pairs, whitespace, odd-digit pad, > EOD") {
    def dec(s: String) = PdfSource.asciiHexDecode(s.getBytes("ISO-8859-1"))
      .map(new String(_, "ISO-8859-1"))
    assert(dec("48 65 6C 6c6F>ignored") === Some("Hello"))
    assert(dec("definitely not hex") === None)
    assert(dec("7>") === Some("p")) // odd digit pads with 0 -> 0x70
  }

  private def makeFilteredPdf(payload: Array[Byte], filterEntry: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + payload.length +
      " " + filterEntry + " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(payload)
    bos.write("\nendstream\nendobj\n%%EOF".getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  test("/Filter /LZWDecode streams extract text") {
    val pdf = makeFilteredPdf(lzwEncode(contentStream.getBytes("ISO-8859-1")),
      "/Filter /LZWDecode")
    val texts = PdfSource.extractStreams(pdf)
    assert(texts.exists(_.contains("Hello (PDF) world")))
  }

  test("/Filter /ASCIIHexDecode and the [/ASCIIHexDecode /FlateDecode] chain extract text") {
    val hexed = contentStream.getBytes("ISO-8859-1")
      .map(b => "%02X".format(b & 0xff)).mkString + ">"
    val t1 = PdfSource.extractStreams(
      makeFilteredPdf(hexed.getBytes("ISO-8859-1"), "/Filter /ASCIIHexDecode"))
    assert(t1.exists(_.contains("Hello (PDF) world")))

    val chained = deflate(contentStream.getBytes("ISO-8859-1"))
      .map(b => "%02X".format(b & 0xff)).mkString + ">"
    val t2 = PdfSource.extractStreams(makeFilteredPdf(chained.getBytes("ISO-8859-1"),
      "/Filter [/ASCIIHexDecode /FlateDecode]"))
    assert(t2.exists(_.contains("Hello (PDF) world")))
  }

  test("ascii85Decode: 'Man ' anchor, z shortcut, partial group, EOD") {
    def dec(s: String) = PdfSource.ascii85Decode(s.getBytes("ISO-8859-1"))
    // hand-verified base-85: value('9jqo^') = 0x4D616E20 = "Man "
    assert(dec("9jqo^~>").map(new String(_, "ISO-8859-1")) === Some("Man "))
    assert(dec("z~>").map(_.toSeq) === Some(Seq[Byte](0, 0, 0, 0)))
    assert(dec("9jn~>").map(new String(_, "ISO-8859-1")) === Some("Ma")) // 3 chars -> 2 bytes
    assert(dec("9jqo^~>ignored after eod").map(_.toSeq)
      === dec("9jqo^~>").map(_.toSeq)) // '~' terminates
    assert(dec("ÿÿ") === None) // out-of-alphabet contained
  }

  test("runLengthDecode: literal runs, repeats, EOD") {
    val fixture = Array[Byte](2, 'a', 'b', 'c', (257 - 3).toByte, 'x', Byte.MinValue /*128=EOD*/,
      'Z' /*past EOD, ignored*/)
    assert(PdfSource.runLengthDecode(fixture).map(new String(_, "ISO-8859-1"))
      === Some("abcxxx"))
  }

  test("/Filter /ASCII85Decode and /RunLengthDecode streams extract text") {
    // test-side ASCII85 encoder (4 bytes -> 5 chars, partial -> n+1)
    def a85Encode(input: Array[Byte]): String = {
      val sb = new StringBuilder
      for (g <- input.grouped(4)) {
        val padded = g.padTo(4, 0.toByte)
        var v = 0L
        for (b <- padded) v = (v << 8) | (b & 0xffL)
        val digits = new Array[Char](5)
        for (j <- 4 to 0 by -1) { digits(j) = ('!' + (v % 85).toInt).toChar; v /= 85 }
        sb.appendAll(digits, 0, if (g.length == 4) 5 else g.length + 1)
      }
      sb.append("~>").toString
    }
    val t1 = PdfSource.extractStreams(makeFilteredPdf(
      a85Encode(contentStream.getBytes("ISO-8859-1")).getBytes("ISO-8859-1"),
      "/Filter /ASCII85Decode"))
    assert(t1.exists(_.contains("Hello (PDF) world")))

    // RunLength: all-literal encoding in 127-byte runs
    val content = contentStream.getBytes("ISO-8859-1")
    val rl = new ByteArrayOutputStream()
    for (g <- content.grouped(127)) { rl.write(g.length - 1); rl.write(g) }
    rl.write(128)
    val t2 = PdfSource.extractStreams(
      makeFilteredPdf(rl.toByteArray, "/Filter /RunLengthDecode"))
    assert(t2.exists(_.contains("Hello (PDF) world")))
  }

  test("image-codec filters are contained: /DCTDecode stream yields no text") {
    val pdf = makeFilteredPdf("(not really text) Tj".getBytes("ISO-8859-1"),
      "/Filter /DCTDecode")
    assert(PdfSource.extractStreams(pdf).forall(_.trim.isEmpty))
  }

  test("codespacerange fixes code width when a 2-byte CMap maps only low codes") {
    // keys <= 0xFF but declared 2-byte codespace: key-width inference
    // would decode byte-at-a-time and inject the 0x00 glyph everywhere
    val cmap =
      """begincodespacerange
        |<0000> <00FF>
        |endcodespacerange
        |3 beginbfchar
        |<0000> <0058>
        |<0001> <0041>
        |<0045> <0042>
        |endbfchar""".stripMargin
    val content = "BT <00010045> Tj ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + cmap.length + " >>\nstream\n" + cmap +
      "\nendstream\nendobj\n2 0 obj\n<< /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val text = PdfSource.extractStreams(pdf).filter(_.trim.nonEmpty).mkString
    assert(text.contains("AB"))
    assert(!text.contains("X")) // the 1-byte misread would emit X (0x00) between glyphs
  }

  test("fuzz: extractStreams and every filter decoder contain arbitrary bytes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 25) {
      val bytes = Array.fill(rnd.nextInt(2048))(rnd.nextInt(256).toByte)
      // none of these may throw — per-file containment is the rule
      PdfSource.extractStreams(bytes)
      PdfSource.extractStreams("%PDF-1.4\n".getBytes("ISO-8859-1") ++ bytes)
      PdfSource.lzwDecode(bytes)
      PdfSource.ascii85Decode(bytes)
      PdfSource.asciiHexDecode(bytes)
      PdfSource.runLengthDecode(bytes)
      // and a malformed dict/stream skeleton around the noise
      PdfSource.extractStreams(
        ("%PDF-1.4\n1 0 obj\n<< /Length " + trial + " /Filter /LZWDecode >>\nstream\n")
          .getBytes("ISO-8859-1") ++ bytes ++ "\nendstream".getBytes("ISO-8859-1"))
    }
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
