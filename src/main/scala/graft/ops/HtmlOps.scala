package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorMath.roundn

/** HTML → text extraction with a text-density boilerplate gate — the
  * first stage every web-corpus training pipeline runs, and the HTML
  * analog of the reference's `read_document_paragraphs` (app.py:17-39
  * turns PDF/DOCX bytes into clean paragraph text; this turns markup
  * into clean block text). jusText-shaped (Pomikálek 2011): segment
  * the page into blocks at block-level tag boundaries, score each
  * block by content length and link density, keep the content-dense
  * blocks and drop chrome (nav bars, footers, link farms).
  *
  * Everything is Catalyst string/regex/HOF expressions with an exact
  * DuckDB twin — no UDFs, no parser object: at 100 TB this runs
  * map-only inside whole-stage codegen, shuffling nothing until the
  * optional per-doc reassembly agg (one doc_id-keyed groupBy with
  * map-side partials).
  *
  * Deliberate containment semantics for malformed markup (regexes,
  * not a recovering parser — spec-pinned):
  *  - an UNCLOSED <script>/<style> is not removed as a pair; its tag
  *    is stripped and its body survives as (low-scoring) text — the
  *    pipeline never throws, garbage is gated, not fatal;
  *  - a stray '<' with no closing '>' swallows to the next '>' or
  *    survives verbatim if none exists;
  *  - attribute values containing '>' end the tag early (RE2 and Java
  *    regex agree — the mis-parse is deterministic and identical on
  *    both engines, which is what the oracle contract needs).
  */
object HtmlOps {

  /** Tags that end a text block (jusText's block-level set, the
    * common subset every browser treats as flow breaks). */
  val BlockTagPattern =
    "(?i)</?(?:p|div|h[1-6]|li|br|td|tr|ul|ol|section|article)[^>]*>"

  /** Drop non-content subtrees: script/style bodies and comments.
    * Lazy spans so adjacent elements don't merge; (?is) so tags span
    * lines and match any case — identical inline-flag semantics in
    * Java regex and RE2. */
  def removeNonContent(html: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")

  /** Strip remaining tags to spaces (so `a</td><td>b` keeps a word
    * boundary), decode the six ubiquitous entities (&amp; LAST so
    * `&amp;lt;` decodes to the literal `&lt;`, not `<`), collapse
    * whitespace. Tag-strip runs BEFORE entity decode — the standard
    * order that keeps `&lt;script&gt;` inert text. */
  def htmlToText(c: Column): Column = {
    val stripped = regexp_replace(c, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(stripped) { case (acc, (e, ch)) => regexp_replace(acc, e, ch) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Inner text of all anchors, normalized the same way as the block
    * text — the numerator of link density. */
  private def anchorText(raw: Column): Column =
    htmlToText(array_join(
      regexp_extract_all(raw, lit("(?is)<a[^>]*>(.*?)</a>"), lit(1)), " "))

  /** Per-block extraction: (doc_id, block_idx, n_chars, link_density,
    * stop_ratio, keep, block_text) — one row per non-empty block.
    * `keep` is the boilerplate gate: content length ≥ `minChars` and
    * link density ≤ `maxLinkDensity`, both compared on RAW doubles of
    * exact integer lengths (bit-identical across engines; the emitted
    * density/ratio are rounded display copies). stop_ratio is emitted
    * as the third jusText feature for downstream gating; the default
    * gate doesn't use it (the synthetic corpus' stopword profile is
    * too uniform to threshold honestly). */
  def htmlBlocks(pages: DataFrame, minChars: Int = 25,
                 maxLinkDensity: Double = 0.3): DataFrame = {
    val content = pages.select(col("doc_id"), removeNonContent(col("html")).as("content"))
    val blocks = content
      .select(col("doc_id"),
        posexplode(split(col("content"), BlockTagPattern)).as(Seq("block_idx", "raw")))
      .withColumn("txt", htmlToText(col("raw")))
      .filter(col("txt") =!= "")
      .withColumn("ltxt", anchorText(col("raw")))
    val toks = filter(split(col("txt"), " "), t => t =!= "")
    val sw = typedLit(TextOps.EnStopwords)
    val linkDensity = length(col("ltxt")).cast("double") /
      greatest(length(col("txt")), lit(1)).cast("double")
    blocks
      .withColumn("n_chars", length(col("txt")).cast("long"))
      .withColumn("n_tok", size(toks).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => array_contains(sw, t))).cast("long"))
      .select(
        col("doc_id"), col("block_idx").cast("long").as("block_idx"),
        col("n_chars"),
        roundn(least(lit(1.0), linkDensity), 6).as("link_density"),
        roundn(col("n_stop") / greatest(col("n_tok"), lit(1L)).cast("double"), 6)
          .as("stop_ratio"),
        (col("n_chars") >= minChars && linkDensity <= maxLinkDensity).as("keep"),
        col("txt").as("block_text"))
  }

  /** Per-doc reassembly: kept blocks in document order joined into
    * the main text, plus block/kept counts — the row shape a curation
    * pipeline feeds downstream (dedup, quality, tokenization). One
    * doc_id-keyed agg; collect_list drops the when()'s nulls, so only
    * kept blocks ride the shuffle. */
  def htmlExtract(pages: DataFrame, minChars: Int = 25,
                  maxLinkDensity: Double = 0.3): DataFrame =
    htmlBlocks(pages, minChars, maxLinkDensity)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_blocks"),
        coalesce(sum(when(col("keep"), 1L)), lit(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("keep"), struct(col("block_idx"), col("block_text"))))),
            b => b.getField("block_text")),
          " ").as("main_text"))

  /** Deterministic HTML page synthesis from the plain-text corpus —
    * the testdata has no markup column, so the declared queries wrap
    * each document in a fixed page skeleton (title, style+script to
    * drop, a link-dense nav, the real text as the content block, a
    * sub-threshold snippet block, a link-heavy footer). Pure string
    * concat, mirrored verbatim in the oracle. */
  def synthesizePages(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      concat(
        lit("<html><head><title>Doc "), col("doc_id").cast("string"),
        lit("</title><style>p{margin:0}</style><script>var x=1;</script></head>" +
          "<body><div><a href=\"/\">Home</a> <a href=\"/about\">About</a> " +
          "<a href=\"/contact\">Contact</a></div><p>"),
        col("text"),
        lit("</p><p>"), substring(col("text"), 1, 15),
        lit("</p><div>© 2026 <a href=\"/terms\">Terms</a> " +
          "<a href=\"/privacy\">Privacy</a></div></body></html>")).as("html"))

  /** The web front door END TO END, as one query — the composition a
    * crawl-corpus user actually runs, built from this round's pieces:
    * (1) canonical-URL dedup keeps one page per canonical
    * ([[UrlOps.urlDedup]] — tracking-param/case variants collapse
    * before any extraction is paid); (2) survivors go through the
    * jusText-shaped boilerplate gate ([[htmlExtract]]); (3) a
    * cleanliness gate keeps pages with ≥1 kept block and ≥
    * `minCleanChars` extracted chars; (4) the per-source funnel
    * report (pages → unique → clean + clean chars) — the crawl
    * dashboard row. Every stage is the already-oracle-pinned kernel;
    * this pins their COMPOSITION.
    *
    * Scale shape: inherits each stage's (all uniform-key joins /
    * map-only extraction); the funnel agg keys on the bounded source
    * axis. At 100 TB the natural physical order is exactly this
    * logical order — URL dedup first removes rows before the
    * expensive parse. */
  def webIngest(docs: DataFrame, minCleanChars: Int = 50): DataFrame = {
    val parsed = UrlOps.parseUrls(UrlOps.synthesizeUrls(docs))
    val surv = UrlOps.urlDedup(parsed)
      .select(col("keep_id").as("doc_id"), lit(1L).as("is_surv"))
    val clean = htmlExtract(synthesizePages(docs))
      .join(surv.select(col("doc_id")), "doc_id")
      .filter(col("n_kept") >= 1 && length(col("main_text")) >= minCleanChars)
      .select(col("doc_id"), lit(1L).as("is_clean"),
        length(col("main_text")).cast("long").as("clean_chars"))
    docs.select(col("doc_id"), col("source"))
      .join(surv, Seq("doc_id"), "left")
      .join(clean, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_pages"),
        coalesce(sum(col("is_surv")), lit(0L)).as("n_unique"),
        coalesce(sum(col("is_clean")), lit(0L)).as("n_clean"),
        coalesce(sum(col("clean_chars")), lit(0L)).as("clean_chars"))
  }
}
