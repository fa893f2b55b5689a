package graft.sources

import java.util.zip.Inflater
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable.ArrayBuffer

/** PDF text source — SURVEY.md §2.1 S2 (reference app.py:21-24 reads
  * per-page text via PyMuPDF). No PDF library exists in this
  * environment, so this is a JDK-only extractor with honest limits:
  *
  *  REAL: header/version validation; stream discovery honoring the
  *  dict's `/Length` (direct or indirect `N 0 R`) so binary streams
  *  containing the literal bytes `endstream` do not truncate, with a
  *  keyword-scan fallback when `/Length` is absent or inconsistent;
  *  `/Filter`-chain decoding — FlateDecode (java.util.zip.Inflater),
  *  LZWDecode (ISO 32000 §7.4.4, 9→12-bit codes, early change),
  *  ASCIIHexDecode, ASCII85Decode and RunLengthDecode, applied in
  *  declared order including array chains like
  *  `[/ASCIIHexDecode /FlateDecode]`; text from the standard
  *  text-showing operators `(…) Tj` / `[(…)…] TJ` with PDF
  *  string-escape handling; and CID/Type0 composite fonts via the
  *  embedded ToUnicode CMap — `<hex> Tj` / hex items in `TJ` arrays
  *  decode through parsed `bfchar`/`bfrange` mappings with the code
  *  width taken from `begincodespacerange` (the path a Korean corpus
  *  like the reference's needs, app.py:21-24).
  *
  *  LIMITS: encrypted files and image-codec filters (DCT/JPX) yield
  *  NO text rows (extraction returns nothing for such streams — the
  *  per-file containment rule, reference app_callapi.py:62-63);
  *  LZW/Flate predictors are not applied (content streams don't use
  *  them; xref streams that do carry no text); CID text without a
  *  ToUnicode CMap (font-program-only mapping) cannot be recovered;
  *  all ToUnicode CMaps in a file are merged (per-font resource
  *  scoping is not tracked — collisions resolve first-wins, which is
  *  exact for the overwhelmingly common one-composite-font case).
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
      else {
        val decoded = streamSegments(bytes).map { case (dict, seg) =>
          new String(decodeStream(dict, seg), "ISO-8859-1")
        }
        // one merged code→unicode map from every ToUnicode CMap in
        // the file (first-wins on collision; see scaladoc LIMITS),
        // with the code byte-width taken from the CMaps' own
        // codespacerange declarations when present
        val cmapTexts = decoded.filter(_.contains("beginbf"))
        val cmap = cmapTexts
          .foldLeft(Map.empty[Int, String])((acc, s) => parseCMap(s).concat(acc))
        // merged-map code width = MAX over every CMap's declared
        // codespacerange AND the key-based inference: a single width
        // must serve all fonts (per-font scoping untracked — scaladoc
        // LIMITS), and under-reading a 2-byte CJK font injects wrong
        // glyphs everywhere, while over-reading a (rare) hex-shown
        // 1-byte font merely drops its run
        val width =
          if (cmap.isEmpty) None
          else Some((cmapTexts.flatMap(codespaceWidth) :+ inferredWidth(cmap)).max)
        decoded.map(extractTextOps(_, cmap, width))
      }
    } catch { case _: Exception => Seq.empty }

  /** Apply the stream dict's `/Filter` chain. No declared filter →
    * opportunistic inflate with raw passthrough (uncompressed content
    * streams); declared Flate/LZW/ASCIIHex decode for real; any other
    * filter (DCT/JPX/Crypt/…) carries no recoverable text — the
    * stream is dropped rather than surfacing binary junk as "text". */
  private[sources] def decodeStream(dict: Option[String], data: Array[Byte]): Array[Byte] = {
    val filters = dict.toSeq.flatMap(filterChain)
    if (filters.isEmpty) tryInflate(data).getOrElse(data)
    else
      filters.foldLeft(Option(data)) { (acc, f) =>
        acc.flatMap(d => f match {
          case "FlateDecode" | "Fl"      => tryInflate(d)
          case "LZWDecode" | "LZW"       => lzwDecode(d)
          case "ASCIIHexDecode" | "AHx"  => asciiHexDecode(d)
          case "ASCII85Decode" | "A85"   => ascii85Decode(d)
          case "RunLengthDecode" | "RL"  => runLengthDecode(d)
          case _                         => None
        })
      }.getOrElse(Array.emptyByteArray)
  }

  // single name (`/Filter /FlateDecode`) or array (`/Filter [/AHx /Fl]`)
  private val FilterEntry = """/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)""".r
  private val NameToken = """/([A-Za-z0-9]+)""".r
  private def filterChain(dict: String): Seq[String] =
    FilterEntry.findFirstMatchIn(dict).toSeq.flatMap(m =>
      NameToken.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)

  /** PDF LZWDecode (ISO 32000 §7.4.4): MSB-first bit stream, 9→12-bit
    * codes, 256 = clear-table, 257 = EOD, one-early code-width change
    * (EarlyChange default 1). Predictors are not applied (content
    * streams in the wild don't use them; xref streams — which do —
    * carry no text). Returns None on malformed input (containment,
    * like [[tryInflate]]). */
  private[sources] def lzwDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var dict = ArrayBuffer.tabulate[Array[Byte]](258)(i =>
        if (i < 256) Array(i.toByte) else Array.emptyByteArray)
      var codeLen = 9
      var prev: Array[Byte] = null
      var bitBuf = 0L
      var bitCnt = 0
      var eod = false
      var i = 0
      while (i < data.length && !eod) {
        bitBuf = (bitBuf << 8) | (data(i) & 0xffL)
        bitCnt += 8
        while (bitCnt >= codeLen && !eod) {
          val code = ((bitBuf >> (bitCnt - codeLen)) & ((1L << codeLen) - 1)).toInt
          bitCnt -= codeLen
          code match {
            case 256 =>
              dict = dict.take(258); codeLen = 9; prev = null
            case 257 => eod = true
            case _ =>
              val entry =
                if (code < dict.length) dict(code)
                else if (prev != null && code == dict.length) prev :+ prev(0)
                else throw new IllegalStateException(s"bad LZW code $code")
              out.write(entry)
              if (prev != null) dict += (prev :+ entry(0))
              prev = entry
              // one-early width change: the NEXT code to be assigned
              // is dict.length, readable only at the wider size
              if (dict.length + 1 >= (1 << codeLen) && codeLen < 12) codeLen += 1
          }
        }
        i += 1
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** PDF ASCII85Decode: 5 chars in ['!','u'] → 4 bytes (base-85 big-
    * endian), `z` = four zero bytes at a group boundary, whitespace
    * skipped, `~` starts the EOD marker; a trailing partial group of
    * n chars pads with 'u' and keeps n−1 bytes. */
  private[sources] def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = new String(data, "ISO-8859-1")
      val out = new java.io.ByteArrayOutputStream()
      val group = new Array[Int](5)
      var n = 0
      var i = 0
      var done = false
      def writeGroup(v: Long, nBytes: Int): Unit = {
        val bytes = Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        out.write(bytes, 0, nBytes)
      }
      while (i < s.length && !done) {
        val c = s.charAt(i)
        if (c == '~') done = true
        else if (c.isWhitespace) ()
        else if (c == 'z' && n == 0) writeGroup(0L, 4)
        else if (c >= '!' && c <= 'u') {
          group(n) = c - '!'; n += 1
          if (n == 5) {
            var v = 0L
            for (j <- 0 until 5) v = v * 85 + group(j)
            writeGroup(v, 4)
            n = 0
          }
        } else throw new IllegalArgumentException(s"bad ascii85 char '$c'")
        i += 1
      }
      if (n == 1) throw new IllegalArgumentException("dangling ascii85 char")
      if (n > 1) {
        val k = n
        for (j <- k until 5) group(j) = 84 // pad with 'u'
        var v = 0L
        for (j <- 0 until 5) v = v * 85 + group(j)
        writeGroup(v, k - 1)
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** PDF RunLengthDecode: length byte l — 0..127 copies the next l+1
    * bytes literally, 129..255 repeats the next byte 257−l times,
    * 128 is EOD. */
  private[sources] def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val out = new java.io.ByteArrayOutputStream()
      var i = 0
      var done = false
      while (i < data.length && !done) {
        val l = data(i) & 0xff
        if (l == 128) done = true
        else if (l < 128) { out.write(data, i + 1, l + 1); i += l + 1 }
        else { val b = data(i + 1); for (_ <- 0 until 257 - l) out.write(b); i += 1 }
        i += 1
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** PDF ASCIIHexDecode: hex pairs → bytes, whitespace ignored, `>`
    * is EOD, odd trailing digit padded with 0. */
  private[sources] def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val s = new String(data, "ISO-8859-1")
      val end = { val e = s.indexOf('>'); if (e < 0) s.length else e }
      val hex0 = s.substring(0, end).filterNot(_.isWhitespace)
      if (!hex0.forall(c => Character.digit(c, 16) >= 0)) None
      else {
        val hex = if (hex0.length % 2 == 1) hex0 + "0" else hex0
        Some(hex.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray)
      }
    } catch { case _: Exception => None }

  private[sources] def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length > 7 && new String(bytes.take(5), "ISO-8859-1") == "%PDF-"

  // direct form must consume the FULL number ((?!\d) blocks the
  // backtrack where `/Length 1234 0 R` matches digits "123" with a
  // satisfied lookahead) and must not be an indirect reference
  private val DirectLen = """/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)""".r
  private val IndirectLen = """/Length\s+(\d+)\s+\d+\s+R""".r

  /** Locate stream payloads. For each `stream` keyword the preceding
    * dict's `/Length` (direct, or indirect resolved against the
    * file's integer objects) gives the exact byte count — required
    * for binary payloads that contain `endstream` as literal bytes.
    * Falls back to the `endstream` scan when `/Length` is missing or
    * fails its sanity check (an `endstream` keyword must follow the
    * claimed extent). */
  private def streamSegments(bytes: Array[Byte]): Seq[(Option[String], Array[Byte])] = {
    val hay = new String(bytes, "ISO-8859-1") // 1:1 byte↔char
    // integer objects (`7 0 obj 1234 endobj`) for indirect /Length
    val intObjs: Map[Int, Int] =
      """(\d+)\s+\d+\s+obj\s+(\d+)\s+endobj""".r.findAllMatchIn(hay)
        .map(m => m.group(1).toInt -> m.group(2).toInt).toMap
    val out = ArrayBuffer.empty[(Option[String], Array[Byte])]
    var from = 0
    while ({ val s = hay.indexOf("stream", from); s >= 0 } ) {
      val s = hay.indexOf("stream", from)
      // skip "endstream" matches: require not preceded by "end"
      if (s >= 3 && hay.startsWith("endstream", s - 3)) from = s + 6
      else {
        var dataStart = s + "stream".length
        if (dataStart < hay.length && hay.charAt(dataStart) == '\r') dataStart += 1
        if (dataStart < hay.length && hay.charAt(dataStart) == '\n') dataStart += 1
        val dict = dictBefore(hay, s)
        val declaredLen: Option[Int] = dict.flatMap { d =>
          // indirect first: a `N 0 R` reference must never be
          // misread as a direct integer
          IndirectLen.findFirstMatchIn(d).flatMap(m => intObjs.get(m.group(1).toInt))
            .orElse(DirectLen.findFirstMatchIn(d).map(_.group(1).toInt))
        }
        val endByLen = declaredLen.collect {
          // sanity: `endstream` (after optional EOL) must follow the
          // declared extent, else the length lies — fall back to scan
          case n if dataStart + n <= hay.length &&
            hay.indexOf("endstream", dataStart + n) >= 0 &&
            hay.substring(dataStart + n, hay.indexOf("endstream", dataStart + n))
              .forall(c => c == '\r' || c == '\n' || c == ' ') =>
            dataStart + n
        }
        endByLen match {
          case Some(e) =>
            out += (dict -> java.util.Arrays.copyOfRange(bytes, dataStart, e))
            from = hay.indexOf("endstream", e) + "endstream".length
          case None =>
            val e = hay.indexOf("endstream", dataStart)
            if (e < 0) from = hay.length
            else {
              out += (dict -> java.util.Arrays.copyOfRange(bytes, dataStart, e))
              from = e + "endstream".length
            }
        }
      }
    }
    out.toSeq
  }

  /** The `<< … >>` dict immediately preceding position `pos`,
    * handling nesting, or None. */
  private def dictBefore(hay: String, pos: Int): Option[String] = {
    val close = hay.lastIndexOf(">>", pos)
    if (close < 0) return None
    // only whitespace may sit between the dict and `stream`
    if (!hay.substring(close + 2, pos).forall(_.isWhitespace)) return None
    var depth = 1
    var i = close - 1
    while (i > 0 && depth > 0) {
      if (hay.charAt(i) == '>' && hay.charAt(i - 1) == '>') { depth += 1; i -= 2 }
      else if (hay.charAt(i) == '<' && hay.charAt(i - 1) == '<') { depth -= 1; i -= 2 }
      else i -= 1
    }
    if (depth == 0) Some(hay.substring(i, close + 2)) else None
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

  // ---- ToUnicode CMap parsing (CID/Type0 composite fonts) ----

  private val BfCharBlock = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRangeBlock = """(?s)beginbfrange(.*?)endbfrange""".r
  private val CharEntry = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
  private val RangeEntry =
    """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(<[0-9A-Fa-f]+>|\[[^\]]*\])""".r
  private val HexToken = """<([0-9A-Fa-f]+)>""".r

  /** UTF-16BE hex → String (surrogate pairs compose naturally). */
  private def utf16Hex(hex: String): String =
    hex.grouped(4).filter(_.length == 4)
      .map(h => Integer.parseInt(h, 16).toChar).mkString

  /** Parse one ToUnicode CMap's bfchar/bfrange sections into a
    * code → unicode map. Package-private for tests. */
  private[sources] def parseCMap(cmap: String): Map[Int, String] = {
    val out = scala.collection.mutable.Map.empty[Int, String]
    for (block <- BfCharBlock.findAllMatchIn(cmap); e <- CharEntry.findAllMatchIn(block.group(1)))
      out(Integer.parseInt(e.group(1), 16)) = utf16Hex(e.group(2))
    for (block <- BfRangeBlock.findAllMatchIn(cmap); e <- RangeEntry.findAllMatchIn(block.group(1))) {
      val lo = Integer.parseInt(e.group(1), 16)
      val hi = Integer.parseInt(e.group(2), 16)
      e.group(3) match {
        case arr if arr.startsWith("[") =>
          // <lo> <hi> [<d0> <d1> …]: explicit destination per code
          val dsts = HexToken.findAllMatchIn(arr).map(m => utf16Hex(m.group(1))).toSeq
          for ((d, off) <- dsts.zipWithIndex if lo + off <= hi) out(lo + off) = d
        case single =>
          // <lo> <hi> <dstStart>: consecutive destinations
          val start = single.drop(1).dropRight(1)
          val base = Integer.parseInt(start.takeRight(4), 16)
          val prefix = start.dropRight(4)
          for (c <- lo to hi)
            out(c) = utf16Hex(prefix + "%04X".format(base + (c - lo)))
      }
    }
    out.toMap
  }

  private val CodespaceBlock = """(?s)begincodespacerange(.*?)endcodespacerange""".r

  /** Authoritative CID code byte-width from the CMap's own
    * `begincodespacerange <lo> <hi> endcodespacerange` declaration
    * (hex digits of the bound / 2). This matters when a 2-byte CMap
    * maps only codes <= 0xFF: key-based inference would decode one
    * byte at a time and inject spurious glyphs wherever a low code is
    * mapped. */
  private[sources] def codespaceWidth(cmap: String): Option[Int] =
    CodespaceBlock.findFirstMatchIn(cmap).flatMap(b =>
      HexToken.findFirstMatchIn(b.group(1)).map(m => (m.group(1).length + 1) / 2))

  /** Key-based CID code width: mapped keys > 0xFF force 2 bytes.
    * Combined (max) with declared codespaceranges by the caller. */
  private[sources] def inferredWidth(cmap: Map[Int, String]): Int =
    if (cmap.keys.exists(_ > 0xff)) 2 else 1

  /** Decode a CID hex string through the merged ToUnicode map. Codes
    * with no mapping contribute nothing (they are unmapped glyphs). */
  private def decodeHexString(hex: String, cmap: Map[Int, String],
                              width: Option[Int]): String = {
    if (cmap.isEmpty) return ""
    val clean = hex.filterNot(_.isWhitespace)
    val w = width.getOrElse(inferredWidth(cmap)) * 2
    clean.grouped(w).filter(_.length == w)
      .map(g => cmap.getOrElse(Integer.parseInt(g, 16), "")).mkString
  }

  /** One master pattern over the three text-showing forms, so show
    * operations are emitted in DOCUMENT ORDER (separate per-operator
    * passes would group all literals before all hex and scramble
    * mixed-font text): group 1 = literal Tj, group 2 = TJ array,
    * group 3 = hex Tj. */
  private val ShowOp =
    ("""\(((?:[^()\\]|\\.)*)\)\s*Tj""" + "|" +
      """\[((?:[^\[\]\\]|\\.)*)\]\s*TJ""" + "|" +
      """<([0-9A-Fa-f\s]+)>\s*Tj""").r
  /** Inside a TJ array: literal or hex string, again in order. */
  private val ArrItem = """\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]+)>""".r

  /** Pull text from Tj / TJ operators in a decoded content stream:
    * literal strings directly, hex strings through the ToUnicode
    * CMap (code width from codespacerange when declared); all show
    * operations and array items keep document order. */
  private[sources] def extractTextOps(content: String, cmap: Map[Int, String] = Map.empty,
                                      width: Option[Int] = None): String =
    ShowOp.findAllMatchIn(content).map { m =>
      if (m.group(1) != null) unescapePdf(m.group(1))
      else if (m.group(2) != null)
        ArrItem.findAllMatchIn(m.group(2)).map { it =>
          if (it.group(1) != null) unescapePdf(it.group(1))
          else decodeHexString(it.group(2), cmap, width)
        }.mkString
      else decodeHexString(m.group(3), cmap, width)
    }.filter(_.nonEmpty).mkString(" ")

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
