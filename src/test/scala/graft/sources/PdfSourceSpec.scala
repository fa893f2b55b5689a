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

  test("quote show operators ' and \" extract literal and hex text in document order") {
    val cmap = "1 beginbfchar\n<0001> <C548>\nendbfchar"
    val content = "BT (first) Tj T* (second) ' 2 0.5 (third) \" <0001> ' ET"
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length " + cmap.length + " >>\nstream\n" + cmap +
      "\nendstream\nendobj\n2 0 obj\n<< /Length " + content.length + " >>\nstream\n" +
      content + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    val text = PdfSource.extractStreams(pdf).filter(_.trim.nonEmpty).head
    assert(text === "first second third 안")
  }

  test("quote operators demand a token boundary: (x)'s in non-text operands not extracted") {
    // `'` glued to a following word char is NOT the show operator —
    // it's binary-ish operand soup; requiring a PDF delimiter or
    // whitespace after the quote keeps it out of extracted text
    val junk = "BT (real) Tj ET q (junk)'n cm Q"
    val pdfJunk = ("%PDF-1.4\n1 0 obj\n<< /Length " + junk.length + " >>\nstream\n" +
      junk + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfSource.extractStreams(pdfJunk).filter(_.trim.nonEmpty).head === "real")
    // but a quote at end-of-stream or before a delimiter still shows
    val eol = "BT (a) ' (b)'(c) ' ET"
    val pdfEol = ("%PDF-1.4\n1 0 obj\n<< /Length " + eol.length + " >>\nstream\n" +
      eol + "\nendstream\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfSource.extractStreams(pdfEol).filter(_.trim.nonEmpty).head === "a b c")
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

  // ---- Predictors (/DecodeParms, ISO 32000 §7.4.4.4) ----

  /** Test-side PNG row filter encoder: applies filter `tag` per row
    * (cycling when tag < 0) — the inverse of PdfSource's unfilter. */
  private def pngEncode(data: Array[Byte], rowLen: Int, bpp: Int, tag: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var prev = new Array[Int](rowLen)
    var r = 0
    var rowIdx = 0
    while (r < data.length) {
      val n = math.min(rowLen, data.length - r)
      val row = Array.tabulate(n)(i => data(r + i) & 0xff)
      val t = if (tag >= 0) tag else rowIdx % 5
      out.write(t)
      for (i <- 0 until n) {
        val left = if (i >= bpp) row(i - bpp) else 0
        val up = prev(i)
        val ul = if (i >= bpp) prev(i - bpp) else 0
        val x = row(i)
        val f = t match {
          case 0 => x
          case 1 => (x - left) & 0xff
          case 2 => (x - up) & 0xff
          case 3 => (x - (left + up) / 2) & 0xff
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - ul)
            val pr = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            (x - pr) & 0xff
        }
        out.write(f)
      }
      prev = row.padTo(rowLen, 0)
      r += n
      rowIdx += 1
    }
    out.toByteArray
  }

  test("PNG predictor: every row filter (None/Sub/Up/Average/Paeth) unfilters exactly") {
    val data = (0 until 640).map(i => ((i * 31 + i / 13) % 251).toByte).toArray
    for (tag <- Seq(0, 1, 2, 3, 4, -1)) { // -1 = cycle tags across rows
      val enc = pngEncode(data, rowLen = 16, bpp = 1, tag = tag)
      val dec = PdfSource.applyPredictor(Some("<< /Predictor 12 /Columns 16 >>"), enc)
      assert(dec.map(_.toSeq) === Some(data.toSeq), s"tag=$tag")
    }
  }

  test("PNG predictor honors Colors/BitsPerComponent (bpp > 1) and partial last rows") {
    val data = (0 until 90).map(i => (i * 7 % 256).toByte).toArray // not a row multiple
    val enc = pngEncode(data, rowLen = 24, bpp = 3, tag = 4)
    val dec = PdfSource.applyPredictor(
      Some("<< /Predictor 15 /Colors 3 /BitsPerComponent 8 /Columns 8 >>"), enc)
    assert(dec.map(_.toSeq) === Some(data.toSeq))
  }

  test("TIFF predictor 2 undoes horizontal differencing") {
    val data = "the quick brown fox jumps over the lazy dog 0123456789".getBytes("ISO-8859-1")
    val rowLen = 16
    val enc = data.clone()
    // difference each row right-to-left so lefts stay original
    var r = 0
    while (r < enc.length) {
      val end = math.min(r + rowLen, enc.length)
      var i = end - 1
      while (i > r) { enc(i) = (enc(i) - enc(i - 1)).toByte; i -= 1 }
      r += rowLen
    }
    val dec = PdfSource.applyPredictor(Some("<< /Predictor 2 /Columns 16 >>"), enc)
    assert(dec.map(new String(_, "ISO-8859-1")) === Some(new String(data, "ISO-8859-1")))
  }

  test("predictor-wrapped FlateDecode content stream round-trips text end-to-end") {
    val raw = contentStream.getBytes("ISO-8859-1")
    val pdf = makeFilteredPdf(deflate(pngEncode(raw, rowLen = 16, bpp = 1, tag = 2)),
      "/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 16 >>")
    assert(PdfSource.extractStreams(pdf).exists(_.contains("Hello (PDF) world")))
  }

  test("/DecodeParms array pairs with the /Filter array (null = no parms)") {
    val raw = contentStream.getBytes("ISO-8859-1")
    val payload = deflate(pngEncode(raw, rowLen = 16, bpp = 1, tag = 2))
      .map(b => "%02X".format(b & 0xff)).mkString + ">"
    val pdf = makeFilteredPdf(payload.getBytes("ISO-8859-1"),
      "/Filter [/ASCIIHexDecode /FlateDecode] " +
        "/DecodeParms [null << /Predictor 12 /Columns 16 >>]")
    assert(PdfSource.extractStreams(pdf).exists(_.contains("Hello (PDF) world")))
  }

  test("LZWDecode with /DP predictor applies after decompression") {
    val raw = contentStream.getBytes("ISO-8859-1")
    val pdf = makeFilteredPdf(lzwEncode(pngEncode(raw, rowLen = 16, bpp = 1, tag = 1)),
      "/Filter /LZWDecode /DP << /Predictor 11 /Columns 16 >>")
    assert(PdfSource.extractStreams(pdf).exists(_.contains("Hello (PDF) world")))
  }

  test("ascii85Decode rejects groups whose value exceeds 2^32-1") {
    assert(PdfSource.ascii85Decode("uuuuu~>".getBytes("ISO-8859-1")) === None)
    // boundary: 's8W-!' == 0xFFFFFFFF stays valid
    assert(PdfSource.ascii85Decode("s8W-!~>".getBytes("ISO-8859-1"))
      .map(_.toSeq) === Some(Seq[Byte](-1, -1, -1, -1)))
  }

  // ---- Encryption (standard security handler, ISO 32000 §7.6) ----
  // The fixture encryptor below is an INDEPENDENT implementation of
  // algorithms 2/3/4/5 written from the spec, so a key-derivation bug
  // in PdfSource cannot cancel out against its own test.

  private object Enc {
    val pad: Array[Byte] = Array(
      0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
      0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
      0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)
    def md5(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("MD5").digest(b)
    // independent RC4 (table copy + functional swap, unlike the prod loop)
    def rc4(key: Array[Byte], in: Array[Byte]): Array[Byte] = {
      var S = (0 until 256).toVector
      var j = 0
      for (i <- 0 until 256) {
        j = (j + S(i) + (key(i % key.length) & 0xff)) % 256
        S = S.updated(i, S(j)).updated(j, S(i))
      }
      var (x, y) = (0, 0)
      in.map { b =>
        x = (x + 1) % 256
        y = (y + S(x)) % 256
        S = S.updated(x, S(y)).updated(y, S(x))
        (b ^ S((S(x) + S(y)) % 256)).toByte
      }
    }
    def padPw(pw: Array[Byte]): Array[Byte] = (pw ++ pad).take(32)
    def computeO(ownerPw: String, r: Int, n: Int): Array[Byte] = {
      var h = md5(padPw(ownerPw.getBytes("ISO-8859-1")))
      if (r >= 3) for (_ <- 0 until 50) h = md5(h)
      val key = h.take(n)
      var o = rc4(key, padPw(Array.emptyByteArray)) // empty USER password
      if (r >= 3) for (i <- 1 to 19) o = rc4(key.map(b => (b ^ i).toByte), o)
      o
    }
    def fileKey(o: Array[Byte], p: Int, id0: Array[Byte], r: Int, n: Int): Array[Byte] = {
      val pLE = Array[Byte]((p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
        ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte)
      var h = md5(padPw(Array.emptyByteArray) ++ o ++ pLE ++ id0)
      if (r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
      h.take(n)
    }
    def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
      if (r == 2) rc4(key, pad)
      else {
        var x = md5(pad ++ id0)
        for (i <- 0 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
        x ++ new Array[Byte](16) // 32-byte entry: arbitrary 16-byte tail
      }
    def objKey(key: Array[Byte], num: Int, gen: Int, aes: Boolean): Array[Byte] = {
      val ext = Array[Byte]((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
      val salt = if (aes) Array[Byte](0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
      md5(key ++ ext ++ salt).take(math.min(key.length + 5, 16))
    }
    def aesEncrypt(key: Array[Byte], plain: Array[Byte]): Array[Byte] = {
      val iv = Array.tabulate[Byte](16)(i => (i * 17 + 3).toByte)
      val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(iv))
      iv ++ c.doFinal(plain)
    }
    def hex(b: Array[Byte]): String = "<" + b.map(x => "%02X".format(x & 0xff)).mkString + ">"
  }

  /** Build a one-content-stream PDF encrypted for the empty user
    * password. mode: "rc4-40" (V1/R2), "rc4-128" (V2/R3), "aes" (V4/R4
    * /AESV2). Owner password is non-empty to prove it isn't needed. */
  private def makeEncryptedPdf(content: String, mode: String,
                               breakU: Boolean = false): Array[Byte] = {
    val (v, r, bits) = mode match {
      case "rc4-40"  => (1, 2, 40)
      case "rc4-128" => (2, 3, 128)
      case "aes"     => (4, 4, 128)
    }
    val n = bits / 8
    val p = -3904
    val id0 = Array.tabulate[Byte](16)(i => (i * 29 + 5).toByte)
    val o = Enc.computeO("owner-secret", r, n)
    val key = Enc.fileKey(o, p, id0, r, n)
    val u0 = Enc.computeU(key, id0, r)
    val u = if (breakU) u0.map(b => (b ^ 0x55).toByte) else u0
    val objK = Enc.objKey(key, 1, 0, aes = mode == "aes")
    val payload =
      if (mode == "aes") Enc.aesEncrypt(objK, content.getBytes("ISO-8859-1"))
      else Enc.rc4(objK, content.getBytes("ISO-8859-1"))
    // /CF deliberately BEFORE the top-level /Length: a regex grabbing
    // the first /Length would read the nested crypt-filter length (16)
    val encDict =
      if (v < 4)
        s"<< /Filter /Standard /V $v /R $r ${if (v == 2) s"/Length $bits " else ""}" +
          s"/O ${Enc.hex(o)} /U ${Enc.hex(u)} /P $p >>"
      else
        s"<< /Filter /Standard /V 4 /R 4 " +
          s"/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen /Length 16 >> >> " +
          s"/StmF /StdCF /StrF /StdCF /Length $bits " +
          s"/O ${Enc.hex(o)} /U ${Enc.hex(u)} /P $p >>"
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + payload.length +
      " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(payload)
    bos.write(("\nendstream\nendobj\n5 0 obj\n" + encDict + "\nendobj\n" +
      "trailer\n<< /Root 9 0 R /Encrypt 5 0 R /ID [" + Enc.hex(id0) + " " +
      Enc.hex(id0) + "] >>\n%%EOF").getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  test("encrypted PDFs (RC4-40, RC4-128, AES-128) extract the same text as plaintext twins") {
    val plaintext = PdfSource.extractStreams(makePdf(contentStream, compress = false))
      .filter(_.trim.nonEmpty)
    assert(plaintext.nonEmpty)
    for (mode <- Seq("rc4-40", "rc4-128", "aes")) {
      val texts = PdfSource.extractStreams(makeEncryptedPdf(contentStream, mode))
        .filter(_.trim.nonEmpty)
      assert(texts === plaintext, s"mode=$mode")
    }
  }

  test("a non-empty user password (U mismatch) contains the whole file as no-rows") {
    for (mode <- Seq("rc4-40", "rc4-128", "aes")) {
      val pdf = makeEncryptedPdf(contentStream, mode, breakU = true)
      assert(PdfSource.extractStreams(pdf) === Seq.empty, s"mode=$mode")
    }
  }

  test("malformed AES-256 (/V 5) dict (short /U, no /UE) is contained as no-rows") {
    val pdf = ("%PDF-1.4\n1 0 obj\n<< /Length 20 >>\nstream\n(x) Tj padpadpad\nendstream\n" +
      "endobj\n5 0 obj\n<< /Filter /Standard /V 5 /R 6 /Length 256 /O <00> /U <00> /P -3904 " +
      ">>\nendobj\ntrailer\n<< /Encrypt 5 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    assert(PdfSource.extractStreams(pdf) === Seq.empty)
  }

  // ---- AES-256 (/V 5, ISO 32000-2 §7.6.4) ----
  // Independent test-side twin of algorithm 2.B: BigInt mod-3 digest
  // selection and functional repeat, vs the prod byte-sum/arraycopy
  // loop — a derivation bug cannot cancel out against its own test.

  private object Enc256 {
    import javax.crypto.Cipher
    import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
    def sha(bits: Int, b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-" + bits).digest(b)
    def aesCbcRaw(mode: Int, key: Array[Byte], iv: Array[Byte],
                  data: Array[Byte]): Array[Byte] = {
      val c = Cipher.getInstance("AES/CBC/NoPadding")
      c.init(mode, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
      c.doFinal(data)
    }
    def hash2B(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
      var k = sha(256, pwd ++ salt ++ udata)
      var i = 0
      var done = false
      while (!done) {
        val k1 = Array.fill(64)(pwd ++ k ++ udata).flatten
        val e = aesCbcRaw(Cipher.ENCRYPT_MODE, k.slice(0, 16), k.slice(16, 32), k1)
        val m = (BigInt(1, e.take(16)) mod 3).toInt
        k = sha(Seq(256, 384, 512)(m), e)
        i += 1
        done = i >= 64 && (e.last & 0xff) <= i - 32
      }
      k.take(32)
    }
  }

  /** One-content-stream PDF encrypted AES-256 for the EMPTY user
    * password (r = 5 legacy SHA-256 or 6 hardened 2.B). The 32-byte
    * file key is arbitrary; /U carries hash‖valSalt‖keySalt and /UE
    * wraps the file key under the key-salt hash. */
  private def makeAes256Pdf(content: String, r: Int, breakU: Boolean = false): Array[Byte] = {
    import javax.crypto.Cipher
    val fileKey = Array.tabulate[Byte](32)(i => (i * 41 + 7).toByte)
    val valSalt = Array.tabulate[Byte](8)(i => (i * 13 + 1).toByte)
    val keySalt = Array.tabulate[Byte](8)(i => (i * 19 + 3).toByte)
    val none = Array.emptyByteArray
    def h(salt: Array[Byte]) =
      if (r == 6) Enc256.hash2B(none, salt, none) else Enc256.sha(256, salt)
    val uHash0 = h(valSalt)
    val uHash = if (breakU) uHash0.map(b => (b ^ 0x55).toByte) else uHash0
    val u = uHash ++ valSalt ++ keySalt // 48 bytes
    val ue = Enc256.aesCbcRaw(Cipher.ENCRYPT_MODE, h(keySalt), new Array[Byte](16), fileKey)
    val o = Array.tabulate[Byte](48)(i => (i * 7 + 2).toByte) // unused for empty-user path
    val oe = Array.tabulate[Byte](32)(i => (i * 11 + 5).toByte)
    val payload = Enc.aesEncrypt(fileKey, content.getBytes("ISO-8859-1"))
    val encDict =
      s"<< /Filter /Standard /V 5 /R $r /Length 256 " +
        s"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> " +
        s"/StmF /StdCF /StrF /StdCF " +
        s"/O ${Enc.hex(o)} /U ${Enc.hex(u)} /OE ${Enc.hex(oe)} /UE ${Enc.hex(ue)} " +
        s"/P -3904 >>"
    val bos = new ByteArrayOutputStream()
    bos.write(("%PDF-1.4\n1 0 obj\n<< /Length " + payload.length +
      " >>\nstream\n").getBytes("ISO-8859-1"))
    bos.write(payload)
    bos.write(("\nendstream\nendobj\n5 0 obj\n" + encDict + "\nendobj\n" +
      "trailer\n<< /Root 9 0 R /Encrypt 5 0 R >>\n%%EOF").getBytes("ISO-8859-1"))
    bos.toByteArray
  }

  test("AES-256 (R6 and legacy R5) empty-password PDFs extract text identical to plaintext twins") {
    val plaintext = PdfSource.extractStreams(makePdf(contentStream, compress = false))
      .filter(_.trim.nonEmpty)
    assert(plaintext.nonEmpty)
    for (r <- Seq(6, 5)) {
      val texts = PdfSource.extractStreams(makeAes256Pdf(contentStream, r))
        .filter(_.trim.nonEmpty)
      assert(texts === plaintext, s"r=$r")
    }
  }

  test("AES-256 with a non-empty user password (U receipt mismatch) yields no rows") {
    for (r <- Seq(6, 5))
      assert(PdfSource.extractStreams(makeAes256Pdf(contentStream, r, breakU = true))
        === Seq.empty, s"r=$r")
  }

  test("malformed AES ciphertext is contained per-stream") {
    val info = PdfSource.EncryptInfo(4, 4, 16, new Array[Byte](32), new Array[Byte](32),
      -3904, Array.emptyByteArray, encryptMetadata = true, aes = true, streamsEncrypted = true)
    val key = new Array[Byte](16)
    // not a block multiple / shorter than IV+1 block → None, no throw
    assert(PdfSource.decryptBytes(key, info, 1, 0, new Array[Byte](37)) === None)
    assert(PdfSource.decryptBytes(key, info, 1, 0, new Array[Byte](16)) === None)
    // random "ciphertext" with a bad pad byte → None (BadPadding contained)
    val junk = Array.tabulate[Byte](48)(i => (i * 73 + 11).toByte)
    assert(PdfSource.decryptBytes(key, info, 1, 0, junk).isEmpty ||
      PdfSource.decryptBytes(key, info, 1, 0, junk).get.length < 32) // never throws
    // end-to-end: corrupting ciphertext never throws (partial text may
    // survive — same contract as binary corruption in plaintext PDFs)
    val pdf = makeEncryptedPdf(contentStream, "aes")
    val idx = new String(pdf, "ISO-8859-1").indexOf("stream\n") + 24
    pdf(idx) = (pdf(idx) ^ 0x7f).toByte
    PdfSource.extractStreams(pdf) // must not throw
  }

  test("V4 AES without a top-level /Length derives the key size from the crypt filter") {
    val plaintext = PdfSource.extractStreams(makePdf(contentStream, compress = false))
      .filter(_.trim.nonEmpty)
    // bytes form (/Length 16) and bits form (/Length 128) both read
    for (cfLen <- Seq(16, 128)) {
      val pdf = new String(makeEncryptedPdf(contentStream, "aes"), "ISO-8859-1")
        .replace(s"/StrF /StdCF /Length 128 ", "/StrF /StdCF ") // drop top-level length
        .replace("/CFM /AESV2 /AuthEvent /DocOpen /Length 16",
          s"/CFM /AESV2 /AuthEvent /DocOpen /Length $cfLen")
        .getBytes("ISO-8859-1")
      assert(new String(pdf, "ISO-8859-1").contains("/StrF /StdCF /O"), "fixture rewrite applied")
      val texts = PdfSource.extractStreams(pdf).filter(_.trim.nonEmpty)
      assert(texts === plaintext, s"cfLen=$cfLen")
    }
  }

  test("a lone /DecodeParms dict with a /Filter array attaches to the Flate stage") {
    val raw = contentStream.getBytes("ISO-8859-1")
    val payload = deflate(pngEncode(raw, rowLen = 16, bpp = 1, tag = 2))
      .map(b => "%02X".format(b & 0xff)).mkString + ">"
    val pdf = makeFilteredPdf(payload.getBytes("ISO-8859-1"),
      "/Filter [/ASCIIHexDecode /FlateDecode] " +
        "/DecodeParms << /Predictor 12 /Columns 16 >>")
    assert(PdfSource.extractStreams(pdf).exists(_.contains("Hello (PDF) world")))
  }

  test("ARRAY-form single-element /DecodeParms keeps strict positional pairing") {
    // parser-level: the two forms are distinguished
    assert(PdfSource.decodeParmsInfo("<< /DecodeParms << /Predictor 12 >> >>")._1 === false)
    assert(PdfSource.decodeParmsInfo("<< /DecodeParms [ << /Predictor 12 >> ] >>")._1 === true)
    // behavioral: `[<<…>>]` binds to position 0 (AHx, which ignores
    // parms) per spec — the predictor must NOT migrate to the Flate
    // stage, so the Sub-filtered payload stays garbled
    val raw = contentStream.getBytes("ISO-8859-1")
    val payload = deflate(pngEncode(raw, rowLen = 16, bpp = 1, tag = 1))
      .map(b => "%02X".format(b & 0xff)).mkString + ">"
    val strict = makeFilteredPdf(payload.getBytes("ISO-8859-1"),
      "/Filter [/ASCIIHexDecode /FlateDecode] " +
        "/DecodeParms [ << /Predictor 12 /Columns 16 >> ]")
    assert(!PdfSource.extractStreams(strict).exists(_.contains("Hello (PDF) world")))
  }

  test("tokenizer terminates on zero-width junk and skips % comments between tokens") {
    // ')' opens nothing: the old parse returned ("", start) and every
    // array loop spun forever — now it consumes one junk char
    assert(PdfSource.parseObjectAt("[ ) ]", 0)._2 === 5)
    // % comments are whitespace between tokens (ISO 32000 §7.2.4)
    assert(PdfSource.parseObjectAt("[ % comment\n 1 2 ]", 0)._2 === 18)
    // end-to-end: a crafted /DecodeParms array with junk and comments
    // must neither hang nor throw, and the predictor still pairs
    val raw = contentStream.getBytes("ISO-8859-1")
    val payload = deflate(pngEncode(raw, rowLen = 16, bpp = 1, tag = 2))
    val pdf = makeFilteredPdf(payload,
      "/Filter [/FlateDecode] " +
        "/DecodeParms [ % legal comment\n << /Predictor 12 /Columns 16 >> ) ]")
    assert(PdfSource.extractStreams(pdf).exists(_.contains("Hello (PDF) world")))
    // pure junk array: contained (no text), terminates
    val junk = makeFilteredPdf("(x) Tj".getBytes("ISO-8859-1"),
      "/DecodeParms [ ) } { ] /Other true")
    PdfSource.extractStreams(junk) // must return, not hang
  }

  test("dictEntries tokenizer: nested dicts, hex strings, refs, names") {
    val d = "<< /V 4 /CF << /StdCF << /CFM /AESV2 /Length 16 >> >> /Length 128 " +
      "/O <41424344> /Next 7 0 R /Flag true >>"
    val e = PdfSource.dictEntries(d)
    assert(e("V") === "4")
    assert(e("Length") === "128") // top-level, not the nested 16
    assert(!e.contains("CFM")) // nested keys not hoisted to the top level
    assert(e("Next") === "7 0 R")
    assert(PdfSource.pdfStringBytes(e("O")).map(new String(_, "ISO-8859-1")) === Some("ABCD"))
    assert(PdfSource.pdfStringBytes("(a\\(b\\)c\\101)").map(new String(_, "ISO-8859-1"))
      === Some("a(b)cA"))
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
