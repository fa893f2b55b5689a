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
  *  text-showing operators `(…) Tj` / `[(…)…] TJ` and the
  *  next-line quote forms `(…) '` / `aw ac (…) "` with PDF
  *  string-escape handling; and CID/Type0 composite fonts via the
  *  embedded ToUnicode CMap — `<hex> Tj` / hex items in `TJ` arrays
  *  decode through parsed `bfchar`/`bfrange` mappings with the code
  *  width taken from `begincodespacerange` (the path a Korean corpus
  *  like the reference's needs, app.py:21-24).
  *
  *  REAL (round 4): standard-security-handler decryption (ISO 32000
  *  §7.6) for the empty-user-password case the reference's PyMuPDF
  *  opens transparently (app.py:21-24) — RC4-40/RC4-128 (/V 1|2,
  *  /R 2|3) and AES-128-CBC (/V 4 /CFM /AESV2, /R 4), with the /U
  *  entry verified (algorithm 6) before any stream is trusted; and
  *  PNG (/Predictor 10–15) and TIFF (/Predictor 2) predictor
  *  application after Flate/LZW per the stream's /DecodeParms.
  *
  *  REAL (round 5): AES-256 (/V 5, /R 5|6 /CFM /AESV3, ISO 32000-2
  *  §7.6.4) — the hardened 2.B password hash for R6, empty-password
  *  validation against /U's own receipt before the file key unwraps
  *  from /UE, AES-256-CBC object decryption with the file key.
  *
  *  LIMITS: password-protected files (non-empty user password) yield
  *  NO text rows, as do image-codec
  *  filters (DCT/JPX) — the per-file containment rule, reference
  *  app_callapi.py:62-63; CID text without a ToUnicode CMap
  *  (font-program-only mapping) cannot be recovered; all ToUnicode
  *  CMaps in a file are merged (per-font resource scoping is not
  *  tracked — collisions resolve first-wins, which is exact for the
  *  overwhelmingly common one-composite-font case).
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
        val hay = new String(bytes, "ISO-8859-1") // 1:1 byte↔char
        val enc = encryptionState(hay)
        if (enc == EncUnreadable) return Seq.empty
        val decoded = streamSegments(bytes, hay).map { seg =>
          val payload = enc match {
            // xref streams are never encrypted (ISO 32000 §7.5.8.2)
            case EncKey(key, info) if !seg.dict.exists(_.contains("/XRef")) =>
              decryptBytes(key, info, seg.objNum, seg.gen, seg.data)
                .getOrElse(Array.emptyByteArray)
            case _ => seg.data
          }
          new String(decodeStream(seg.dict, payload), "ISO-8859-1")
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
    * streams); declared Flate/LZW/ASCIIHex decode for real, with the
    * matching `/DecodeParms` predictor (PNG 10–15, TIFF 2) applied
    * after Flate/LZW; any other filter (DCT/JPX/Crypt/…) carries no
    * recoverable text — the stream is dropped rather than surfacing
    * binary junk as "text". */
  private[sources] def decodeStream(dict: Option[String], data: Array[Byte]): Array[Byte] = {
    val filters = dict.toSeq.flatMap(filterChain)
    if (filters.isEmpty) tryInflate(data).getOrElse(data)
    else {
      val (parmsIsArray, parms0) =
        dict.map(decodeParmsInfo).getOrElse((false, Seq.empty))
      // a LONE (non-array) parms dict against a /Filter array attaches
      // to the filter that takes parameters (first Flate/LZW), not
      // blindly to position 0 — `/Filter [/AHx /Fl] /DecodeParms
      // <</Predictor…>>` means the predictor runs after the Flate
      // stage (lenient-reader behavior). Array-form /DecodeParms —
      // even a single-element `[<<…>>]` — keeps strict positional
      // pairing per the spec.
      val parms =
        if (!parmsIsArray && parms0.length == 1 && parms0.head.isDefined
            && filters.length > 1) {
          val idx = filters.indexWhere(f =>
            f == "FlateDecode" || f == "Fl" || f == "LZWDecode" || f == "LZW") match {
            case -1 => 0
            case i  => i
          }
          Seq.tabulate(filters.length)(i => if (i == idx) parms0.head else None)
        } else parms0.padTo(filters.length, None)
      filters.zip(parms).foldLeft(Option(data)) { case (acc, (f, parm)) =>
        acc.flatMap(d => f match {
          case "FlateDecode" | "Fl"      => tryInflate(d).flatMap(applyPredictor(parm, _))
          case "LZWDecode" | "LZW"       => lzwDecode(d).flatMap(applyPredictor(parm, _))
          case "ASCIIHexDecode" | "AHx"  => asciiHexDecode(d)
          case "ASCII85Decode" | "A85"   => ascii85Decode(d)
          case "RunLengthDecode" | "RL"  => runLengthDecode(d)
          case _                         => None
        })
      }.getOrElse(Array.emptyByteArray)
    }
  }

  // single name (`/Filter /FlateDecode`) or array (`/Filter [/AHx /Fl]`)
  private val FilterEntry = """/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)""".r
  private val NameToken = """/([A-Za-z0-9]+)""".r
  private def filterChain(dict: String): Seq[String] =
    FilterEntry.findFirstMatchIn(dict).toSeq.flatMap(m =>
      NameToken.findAllMatchIn(m.group(1)).map(_.group(1)).toSeq)

  /** Per-filter `/DecodeParms` (alias `/DP`): a single dict applies to
    * the first filter; an array pairs element-for-element with the
    * `/Filter` array (`null` = no parms for that position). Returns
    * the raw parm-dict text per filter position. */
  private[sources] def decodeParmsChain(dict: String): Seq[Option[String]] =
    decodeParmsInfo(dict)._2

  /** [[decodeParmsChain]] plus whether the entry used the ARRAY form —
    * the caller's lenient single-dict reattachment must never fire on
    * `[<<…>>]`, whose single element is positionally bound by spec. */
  private[sources] def decodeParmsInfo(dict: String): (Boolean, Seq[Option[String]]) = {
    val key = """/(?:DecodeParms|DP)(?![A-Za-z])""".r
    key.findFirstMatchIn(dict) match {
      case None => (false, Seq.empty)
      case Some(m) =>
        var i = skipWs(dict, m.end)
        if (dict.startsWith("<<", i)) (false, Seq(Some(parseObjectAt(dict, i)._1)))
        else if (i < dict.length && dict.charAt(i) == '[') {
          val out = ArrayBuffer.empty[Option[String]]
          i += 1
          var done = false
          while (!done) {
            i = skipWs(dict, i)
            if (i >= dict.length || dict.charAt(i) == ']') done = true
            else {
              val (raw, next) = parseObjectAt(dict, i)
              out += (if (raw.startsWith("<<")) Some(raw) else None)
              i = next
            }
          }
          (true, out.toSeq)
        } else (false, Seq.empty)
    }
  }

  private def intEntry(dict: String, name: String): Option[Int] =
    (name.replace("/", "") match { case n => s"/$n\\s+(-?\\d+)".r })
      .findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Undo the row predictor declared in a filter's `/DecodeParms`
    * (ISO 32000 §7.4.4.4): /Predictor 2 = TIFF horizontal
    * differencing (8-bit components), 10–15 = PNG row filters
    * (None/Sub/Up/Average/Paeth, chosen per row by the leading tag
    * byte). Returns None on malformed input — containment, like the
    * filters themselves. */
  private[sources] def applyPredictor(parm: Option[String], data: Array[Byte]): Option[Array[Byte]] =
    parm match {
      case None => Some(data)
      case Some(p) =>
        val pred = intEntry(p, "Predictor").getOrElse(1)
        if (pred <= 1) Some(data)
        else
          try {
            val colors = intEntry(p, "Colors").getOrElse(1)
            val bpc = intEntry(p, "BitsPerComponent").getOrElse(8)
            val columns = intEntry(p, "Columns").getOrElse(1)
            val bpp = math.max(1, colors * bpc / 8)
            val rowLen = (columns * colors * bpc + 7) / 8
            if (pred == 2) {
              if (bpc != 8) None // sub-byte TIFF differencing: not text-bearing
              else {
                val out = data.clone()
                var r = 0
                while (r < out.length) {
                  val end = math.min(r + rowLen, out.length)
                  var i = r + bpp
                  while (i < end) { out(i) = (out(i) + out(i - bpp)).toByte; i += 1 }
                  r += rowLen
                }
                Some(out)
              }
            } else pngPredictor(data, bpp, rowLen)
          } catch { case _: Exception => None }
    }

  /** PNG unfiltering: each row is `tag || rowLen bytes`; tags 0–4 =
    * None/Sub/Up/Average/Paeth against the previous (unfiltered) row. */
  private def pngPredictor(data: Array[Byte], bpp: Int, rowLen: Int): Option[Array[Byte]] = {
    if (rowLen <= 0) return None
    val out = new java.io.ByteArrayOutputStream()
    val prev = new Array[Int](rowLen)
    var pos = 0
    while (pos < data.length) {
      val tag = data(pos) & 0xff
      val n = math.min(rowLen, data.length - pos - 1)
      if (n <= 0) return Some(out.toByteArray) // trailing tag w/o payload
      val row = new Array[Int](rowLen)
      var i = 0
      while (i < n) {
        val x = data(pos + 1 + i) & 0xff
        val left = if (i >= bpp) row(i - bpp) else 0
        val up = prev(i)
        val ul = if (i >= bpp) prev(i - bpp) else 0
        row(i) = tag match {
          case 0 => x
          case 1 => (x + left) & 0xff
          case 2 => (x + up) & 0xff
          case 3 => (x + (left + up) / 2) & 0xff
          case 4 =>
            val pp = left + up - ul
            val pa = math.abs(pp - left); val pb = math.abs(pp - up); val pc = math.abs(pp - ul)
            val pr = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            (x + pr) & 0xff
          case _ => return None
        }
        out.write(row(i))
        i += 1
      }
      System.arraycopy(row, 0, prev, 0, rowLen)
      pos += 1 + n
    }
    Some(out.toByteArray)
  }

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
        // ISO 32000 §7.4.3: a group whose base-85 value exceeds
        // 2^32−1 is a decode error — contain it rather than silently
        // truncating to the low 32 bits (e.g. 'uuuuu')
        if (v > 0xFFFFFFFFL) throw new IllegalArgumentException("ascii85 group > 2^32-1")
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

  /** One located stream: its dict, the enclosing `N G obj` numbers
    * (needed for per-object decryption keys), and the payload. */
  private[sources] case class StreamSeg(dict: Option[String], objNum: Int,
                                        gen: Int, data: Array[Byte])

  private val ObjHeader = """(\d+)\s+(\d+)\s+obj\b""".r

  /** Locate stream payloads. For each `stream` keyword the preceding
    * dict's `/Length` (direct, or indirect resolved against the
    * file's integer objects) gives the exact byte count — required
    * for binary payloads that contain `endstream` as literal bytes.
    * Falls back to the `endstream` scan when `/Length` is missing or
    * fails its sanity check (an `endstream` keyword must follow the
    * claimed extent). */
  private def streamSegments(bytes: Array[Byte], hay: String): Seq[StreamSeg] = {
    // integer objects (`7 0 obj 1234 endobj`) for indirect /Length
    val intObjs: Map[Int, Int] =
      """(\d+)\s+\d+\s+obj\s+(\d+)\s+endobj""".r.findAllMatchIn(hay)
        .map(m => m.group(1).toInt -> m.group(2).toInt).toMap
    // `N G obj` header positions in order; the enclosing object of a
    // stream at position s is the last header starting before s
    val headers = ObjHeader.findAllMatchIn(hay)
      .map(m => (m.start, m.group(1).toInt, m.group(2).toInt)).toArray
    var hdrIdx = 0
    def enclosing(pos: Int): (Int, Int) = {
      while (hdrIdx + 1 < headers.length && headers(hdrIdx + 1)._1 < pos) hdrIdx += 1
      if (headers.nonEmpty && headers(hdrIdx)._1 < pos)
        (headers(hdrIdx)._2, headers(hdrIdx)._3)
      else (0, 0)
    }
    val out = ArrayBuffer.empty[StreamSeg]
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
        val (objNum, gen) = enclosing(s)
        endByLen match {
          case Some(e) =>
            out += StreamSeg(dict, objNum, gen, java.util.Arrays.copyOfRange(bytes, dataStart, e))
            from = hay.indexOf("endstream", e) + "endstream".length
          case None =>
            val e = hay.indexOf("endstream", dataStart)
            if (e < 0) from = hay.length
            else {
              out += StreamSeg(dict, objNum, gen, java.util.Arrays.copyOfRange(bytes, dataStart, e))
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

  // ---- Minimal PDF object tokenizer (dict entries, strings) ----
  // Regexes over dict text break down once values nest (the /Encrypt
  // dict's /CF sub-dict carries its own /Length) or carry binary
  // string bytes, so encryption parsing uses a real tokenizer.

  /** Skip whitespace AND `%`-to-EOL comments — comments are legal
    * between any two tokens (ISO 32000 §7.2.4) and count as a single
    * whitespace character. (Never called inside string literals, so
    * `%` bytes in string data are unaffected.) */
  private def skipWs(s: String, from: Int): Int = {
    var i = from
    var moved = true
    while (moved) {
      moved = false
      while (i < s.length && (s.charAt(i).isWhitespace || s.charAt(i) == 0)) { i += 1; moved = true }
      if (i < s.length && s.charAt(i) == '%') {
        while (i < s.length && s.charAt(i) != '\r' && s.charAt(i) != '\n') i += 1
        moved = true
      }
    }
    i
  }

  /** Parse one PDF object starting at `start` (which must not be
    * whitespace): literal/hex string, dict, array, name, or bare
    * token (number / bool / null / `N G R` indirect ref). Returns the
    * raw text and the index one past it. */
  private[sources] def parseObjectAt(s: String, start: Int): (String, Int) = {
    val c = s.charAt(start)
    if (c == '(') {
      var depth = 1
      var i = start + 1
      while (i < s.length && depth > 0) {
        s.charAt(i) match {
          case '\\' => i += 1 // skip escaped char
          case '(' => depth += 1
          case ')' => depth -= 1
          case _ =>
        }
        i += 1
      }
      (s.substring(start, i), i)
    } else if (s.startsWith("<<", start)) {
      var depth = 1
      var i = start + 2
      while (i < s.length && depth > 0) {
        if (s.charAt(i) == '(') i = parseObjectAt(s, i)._2 // strings may hold << >>
        else if (s.startsWith("<<", i)) { depth += 1; i += 2 }
        else if (s.startsWith(">>", i)) { depth -= 1; i += 2 }
        else i += 1
      }
      (s.substring(start, i), i)
    } else if (c == '<') {
      val e = s.indexOf('>', start + 1)
      val end = if (e < 0) s.length else e + 1
      (s.substring(start, end), end)
    } else if (c == '[') {
      var i = start + 1
      var done = false
      while (!done && i < s.length) {
        i = skipWs(s, i)
        if (i >= s.length || s.charAt(i) == ']') { done = true; if (i < s.length) i += 1 }
        else i = parseObjectAt(s, i)._2
      }
      (s.substring(start, i), i)
    } else if (c == '/') {
      var i = start + 1
      while (i < s.length && !isDelim(s.charAt(i))) i += 1
      (s.substring(start, i), i)
    } else {
      var i = start
      while (i < s.length && !isDelim(s.charAt(i))) i += 1
      // `start` sits ON a delimiter that opens nothing (')', '}', '{',
      // stray '>'…): consume it as a one-char junk token — a zero-width
      // return would spin every caller that loops on the end index
      // (untrusted corpus: `/DecodeParms [ ) ]` must terminate, not
      // hang the executor task)
      if (i == start) return (s.substring(start, start + 1), start + 1)
      val tok = s.substring(start, i)
      // `N G R` indirect reference: consume all three tokens
      if (tok.nonEmpty && tok.forall(_.isDigit)) {
        val j = skipWs(s, i)
        var k = j
        while (k < s.length && s.charAt(k).isDigit) k += 1
        if (k > j) {
          val l = skipWs(s, k)
          if (l < s.length && s.charAt(l) == 'R' &&
            (l + 1 >= s.length || isDelim(s.charAt(l + 1))))
            return (s.substring(start, l + 1), l + 1)
        }
      }
      (tok, i)
    }
  }

  private def isDelim(c: Char): Boolean =
    c.isWhitespace || c == 0 || "()<>[]{}/%".indexOf(c) >= 0

  /** Top-level `/Name value` entries of a `<< … >>` dict (raw value
    * text); nested dict values come back as their full `<< … >>`. */
  private[sources] def dictEntries(dict: String): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    val open = dict.indexOf("<<")
    if (open < 0) return Map.empty
    var i = open + 2
    var done = false
    while (!done) {
      i = skipWs(dict, i)
      if (i >= dict.length || dict.startsWith(">>", i)) done = true
      else if (dict.charAt(i) == '/') {
        val (name, afterName) = parseObjectAt(dict, i)
        val j = skipWs(dict, afterName)
        if (j >= dict.length || dict.startsWith(">>", j)) {
          out(name.drop(1)) = ""; done = true
        } else {
          val (v, after) = parseObjectAt(dict, j)
          out(name.drop(1)) = v; i = after
        }
      } else i += 1 // skip junk
    }
    out.toMap
  }

  /** PDF string token (`(…)` with escapes or `<hex>`) → raw bytes. */
  private[sources] def pdfStringBytes(raw: String): Option[Array[Byte]] = {
    val t = raw.trim
    if (t.startsWith("(")) {
      val out = new java.io.ByteArrayOutputStream()
      var i = 1
      var depth = 1
      while (i < t.length && depth > 0) {
        val c = t.charAt(i)
        if (c == '\\' && i + 1 < t.length) {
          t.charAt(i + 1) match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case '\n' => i += 2 // line continuation
            case '\r' => i += (if (i + 2 < t.length && t.charAt(i + 2) == '\n') 3 else 2)
            case d if d >= '0' && d <= '7' =>
              val end = math.min(i + 4, t.length)
              var j = i + 1
              while (j < end && t.charAt(j) >= '0' && t.charAt(j) <= '7') j += 1
              out.write(Integer.parseInt(t.substring(i + 1, j), 8) & 0xff)
              i = j
            case other => out.write(other & 0xff); i += 2
          }
        } else if (c == '(') { depth += 1; out.write(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); i += 1 }
        else { out.write(c & 0xff); i += 1 }
      }
      Some(out.toByteArray)
    } else if (t.startsWith("<") && !t.startsWith("<<")) {
      val hex0 = t.drop(1).takeWhile(_ != '>').filterNot(_.isWhitespace)
      if (!hex0.forall(c => Character.digit(c, 16) >= 0)) None
      else {
        val hex = if (hex0.length % 2 == 1) hex0 + "0" else hex0
        Some(hex.grouped(2).map(p => Integer.parseInt(p, 16).toByte).toArray)
      }
    } else None
  }

  // ---- Standard security handler (ISO 32000 §7.6.3) ----
  // The reference opens encrypted PDFs transparently when the user
  // password is empty (PyMuPDF default, app.py:21-24). Same contract
  // here: derive the file key from the empty user password, verify it
  // against /U, and decrypt streams per-object (per-file for AESV3);
  // anything else (a non-empty password) is contained as no-rows.

  private val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[sources] case class EncryptInfo(v: Int, r: Int, keyBytes: Int,
    o: Array[Byte], u: Array[Byte], p: Int, id0: Array[Byte],
    encryptMetadata: Boolean, aes: Boolean, streamsEncrypted: Boolean,
    ue: Array[Byte] = Array.emptyByteArray)

  private[sources] sealed trait EncState
  private[sources] case object EncNone extends EncState
  /** Encrypted and readable: the verified file key plus dict info. */
  private[sources] case class EncKey(key: Array[Byte], info: EncryptInfo) extends EncState
  /** Encrypted but not readable with an empty user password (or an
    * unsupported scheme) — the whole file yields no rows. */
  private[sources] case object EncUnreadable extends EncState

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (hand-rolled: no provider/policy dependency). */
  private[sources] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(identity)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    i = 0; j = 0
    var k = 0
    while (k < data.length) {
      i = (i + 1) & 0xff
      j = (j + s(i)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      out(k) = (data(k) ^ s((s(i) + s(j)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private val EncryptRef = """/Encrypt\s+(\d+)\s+(\d+)\s+R""".r
  private val IdEntry = """/ID\s*\[""".r

  /** Detect and classify the file's encryption: None / readable with
    * the empty user password (key attached) / unreadable. */
  private[sources] def encryptionState(hay: String): EncState = {
    // last trailer wins (incremental updates append)
    val ref = EncryptRef.findAllMatchIn(hay).toSeq.lastOption
    val inline = if (ref.isEmpty) {
      // rare inline form: `/Encrypt <<…>>`
      val m = """/Encrypt\s*(?=<<)""".r.findAllMatchIn(hay).toSeq.lastOption
      m.map(mm => parseObjectAt(hay, skipWs(hay, mm.end))._1)
    } else None
    if (ref.isEmpty && inline.isEmpty) return EncNone
    try {
      val dictText = inline.getOrElse {
        val Seq(num, gen) = Seq(ref.get.group(1), ref.get.group(2))
        val hdr = s"""(?<![0-9])$num\\s+$gen\\s+obj\\b""".r
          .findFirstMatchIn(hay).getOrElse(return EncUnreadable)
        parseObjectAt(hay, skipWs(hay, hdr.end))._1
      }
      parseEncryptInfo(dictText, hay) match {
        case Some(info) if info.v == 5 =>
          // AES-256: /U carries its own validation receipt; the file
          // key only unwraps from /UE once that receipt checks out
          fileKeyV5(info).map(k => EncKey(k, info)).getOrElse(EncUnreadable)
        case Some(info) =>
          val key = fileKey(info)
          if (emptyUserPasswordMatches(key, info)) EncKey(key, info) else EncUnreadable
        case None => EncUnreadable
      }
    } catch { case _: Exception => EncUnreadable }
  }

  /** Parse the /Encrypt dict (+ first /ID element from the trailer).
    * None = unsupported scheme. */
  private[sources] def parseEncryptInfo(dictText: String, hay: String): Option[EncryptInfo] = {
    val e = dictEntries(dictText)
    if (!e.get("Filter").forall(_ == "/Standard")) return None
    val v = e.get("V").map(_.trim.toInt).getOrElse(0)
    val r = e.get("R").map(_.trim.toInt).getOrElse(return None)
    val supported = (v >= 1 && v <= 4 && r >= 2 && r <= 4) ||
      (v == 5 && (r == 5 || r == 6)) // AES-256 (ISO 32000-2)
    if (!supported) return None
    val o = e.get("O").flatMap(pdfStringBytes).getOrElse(return None)
    val u = e.get("U").flatMap(pdfStringBytes).getOrElse(return None)
    if (v == 5) { if (u.length < 48) return None } // 32 hash + 2×8 salts
    else if (o.length < 32 || u.length < 16) return None
    val p = e.get("P").map(_.trim.toLong.toInt).getOrElse(return None)
    val encMeta = e.get("EncryptMetadata").forall(_.trim != "false")
    // V4/V5: the /StmF crypt filter (through /CF) decides stream
    // handling; its dict may also carry the key /Length (see below)
    val stmF = e.get("StmF").map(_.drop(1)).getOrElse("Identity")
    def cfEntry(name: String): Option[String] = for {
      cf <- e.get("CF")
      std <- dictEntries(cf).get(stmF)
      x <- dictEntries(std).get(name)
    } yield x
    val (aes, streamsEnc) =
      if (v < 4) (false, true)
      else if (stmF == "Identity") (false, false)
      else cfEntry("CFM").map(_.drop(1)) match {
        case Some("AESV2") if v == 4 => (true, true)
        case Some("V2") if v == 4    => (false, true)
        case Some("AESV3") if v == 5 => (true, true)
        case Some("None") | None     => (false, false)
        case _ => return None
      }
    val keyBytes =
      if (v == 1) 5
      else if (v == 5) 32
      else e.get("Length").map(_.trim.toInt / 8).getOrElse {
        if (v < 4) 5
        else
          // V4 writers may declare the length only on the crypt filter
          // — in BYTES per ISO 32000 Table 25, though some emit bits
          // (values ≥ 40 read as bits); AESV2 keys are always 16
          cfEntry("Length").map(_.trim.toInt)
            .map(n => if (n >= 40) n / 8 else n)
            .getOrElse(if (aes) 16 else 5)
      }
    val ue =
      if (v != 5) Array.emptyByteArray
      else e.get("UE").flatMap(pdfStringBytes).filter(_.length >= 32)
        .getOrElse(return None)
    // first /ID element from the last trailer that declares one
    val id0 = IdEntry.findAllMatchIn(hay).toSeq.lastOption.flatMap { m =>
      val i = skipWs(hay, m.end - 0) // m ends right after '['
      try pdfStringBytes(parseObjectAt(hay, i)._1) catch { case _: Exception => None }
    }.getOrElse(Array.emptyByteArray)
    Some(EncryptInfo(v, r, keyBytes, o.take(if (v == 5) 48 else 32), u, p,
      id0, encMeta, aes, streamsEnc, ue))
  }

  /** ISO 32000-2 §7.6.4.3.4 Algorithm 2.B — the R6 password hash:
    * SHA-256 over (password ‖ salt ‖ udata) seeds K, then rounds of
    * "repeat (password ‖ K ‖ udata) 64×, AES-128-CBC-encrypt with
    * key=K[0..16)/iv=K[16..32), rehash with SHA-256/384/512 chosen by
    * the first 16 ciphertext bytes mod 3" until at least 64 rounds ran
    * AND the last ciphertext byte ≤ round − 32. (big-endian-int mod 3
    * ≡ byte-sum mod 3, since 256 ≡ 1 mod 3.) */
  private[sources] def hash2B(pwd: Array[Byte], salt: Array[Byte],
                              udata: Array[Byte]): Array[Byte] = {
    def sha(bits: Int, data: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance(s"SHA-$bits").digest(data)
    var k = sha(256, pwd ++ salt ++ udata)
    var round = 0
    var lastByte = 256 // > any real byte: enforces the 64-round floor
    while (round < 64 || lastByte > round - 32) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOfRange(k, 16, 32)))
      val enc = c.doFinal(k1)
      var s = 0
      i = 0
      while (i < 16) { s += enc(i) & 0xff; i += 1 }
      k = sha(s % 3 match { case 0 => 256; case 1 => 384; case _ => 512 }, enc)
      lastByte = enc(enc.length - 1) & 0xff
      round += 1
    }
    k.take(32)
  }

  /** /V 5 (AES-256) empty-user-password path, ISO 32000-2
    * §7.6.4.4.10/§7.6.4.3.3: hash the empty password with the /U
    * VALIDATION salt (R6 via [[hash2B]], R5 via plain SHA-256) and
    * require it to equal /U[0..32) BEFORE trusting anything; then
    * rehash with the KEY salt and unwrap the 32-byte file key from
    * /UE (AES-256-CBC, zero IV, no padding). None = wrong password /
    * malformed dict — the file yields no rows. */
  private[sources] def fileKeyV5(info: EncryptInfo): Option[Array[Byte]] =
    try {
      val valSalt = java.util.Arrays.copyOfRange(info.u, 32, 40)
      val keySalt = java.util.Arrays.copyOfRange(info.u, 40, 48)
      val empty = Array.emptyByteArray
      def h(salt: Array[Byte]): Array[Byte] =
        if (info.r == 6) hash2B(empty, salt, empty)
        else java.security.MessageDigest.getInstance("SHA-256").digest(salt)
      if (!java.util.Arrays.equals(h(valSalt), info.u.take(32))) None
      else {
        val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(h(keySalt), "AES"),
          new javax.crypto.spec.IvParameterSpec(new Array[Byte](16)))
        Some(c.doFinal(info.ue.take(32)))
      }
    } catch { case _: Exception => None }

  /** Algorithm 2: file encryption key from the (empty) user password. */
  private[sources] def fileKey(info: EncryptInfo): Array[Byte] = {
    val n = if (info.r == 2) 5 else info.keyBytes
    val pLE = Array[Byte]((info.p & 0xff).toByte, ((info.p >> 8) & 0xff).toByte,
      ((info.p >> 16) & 0xff).toByte, ((info.p >> 24) & 0xff).toByte)
    val noMeta: Array[Byte] =
      if (info.r >= 4 && !info.encryptMetadata) Array(-1, -1, -1, -1) else Array.emptyByteArray
    var h = md5(PasswordPad, info.o, pLE, info.id0, noMeta)
    if (info.r >= 3) for (_ <- 0 until 50) h = md5(h.take(n))
    h.take(n)
  }

  /** Algorithm 6 (via 4/5): does the derived key reproduce /U? */
  private[sources] def emptyUserPasswordMatches(key: Array[Byte], info: EncryptInfo): Boolean =
    if (info.r == 2)
      java.util.Arrays.equals(rc4(key, PasswordPad), info.u.take(32))
    else {
      var x = md5(PasswordPad, info.id0)
      for (i <- 0 to 19) x = rc4(key.map(b => (b ^ i).toByte), x)
      java.util.Arrays.equals(x, info.u.take(16))
    }

  /** Algorithm 1: per-object key (MD5 of key ‖ objNum LE3 ‖ gen LE2,
    * plus the `sAlT` marker for AESV2). */
  private[sources] def objectKey(key: Array[Byte], objNum: Int, gen: Int,
                                 aes: Boolean): Array[Byte] = {
    val ext = Array[Byte]((objNum & 0xff).toByte, ((objNum >> 8) & 0xff).toByte,
      ((objNum >> 16) & 0xff).toByte, (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salt: Array[Byte] = if (aes) Array(0x73, 0x41, 0x6C, 0x54) else Array.emptyByteArray
    md5(key, ext, salt).take(math.min(key.length + 5, 16))
  }

  /** Decrypt one stream payload: RC4, or AES-CBC with the leading
    * 16 bytes as IV and PKCS#5 padding. AESV3 (/V 5) uses the file key
    * directly — ISO 32000-2 drops the per-object MD5 derivation. None
    * on malformed ciphertext (containment) or when /StmF is Identity. */
  private[sources] def decryptBytes(key: Array[Byte], info: EncryptInfo,
                                    objNum: Int, gen: Int, data: Array[Byte]): Option[Array[Byte]] =
    try {
      if (!info.streamsEncrypted) Some(data)
      else {
        val ok = if (info.v == 5) key else objectKey(key, objNum, gen, info.aes)
        if (!info.aes) Some(rc4(ok, data))
        else if (data.length < 32 || (data.length - 16) % 16 != 0) None
        else {
          val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
          c.init(javax.crypto.Cipher.DECRYPT_MODE,
            new javax.crypto.spec.SecretKeySpec(ok, "AES"),
            new javax.crypto.spec.IvParameterSpec(java.util.Arrays.copyOf(data, 16)))
          Some(c.doFinal(data, 16, data.length - 16))
        }
      }
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

  /** One master pattern over the text-showing forms, so show
    * operations are emitted in DOCUMENT ORDER (separate per-operator
    * passes would group all literals before all hex and scramble
    * mixed-font text): group 1 = literal Tj, group 2 = TJ array,
    * group 3 = hex Tj, group 4/5 = literal/hex shown by the
    * move-to-next-line quote operators `'` and `"` (ISO 32000
    * §9.4.3 — `"` takes two leading numbers; the string sits right
    * before the operator either way). The quote alternatives demand
    * a PDF token boundary after the operator (whitespace, a
    * delimiter, or end of stream): unlike the named Tj/TJ operators
    * a lone punctuation character has real false-positive odds in
    * binary-ish streams, e.g. `(x)'s` inside non-text operands. */
  private val ShowOp =
    ("""\(((?:[^()\\]|\\.)*)\)\s*Tj""" + "|" +
      """\[((?:[^\[\]\\]|\\.)*)\]\s*TJ""" + "|" +
      """<([0-9A-Fa-f\s]+)>\s*Tj""" + "|" +
      """\(((?:[^()\\]|\\.)*)\)\s*["'](?![^\s()<>\[\]{}/%])""" + "|" +
      """<([0-9A-Fa-f\s]+)>\s*["'](?![^\s()<>\[\]{}/%])""").r
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
      else if (m.group(3) != null) decodeHexString(m.group(3), cmap, width)
      else if (m.group(4) != null) unescapePdf(m.group(4))
      else decodeHexString(m.group(5), cmap, width)
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
