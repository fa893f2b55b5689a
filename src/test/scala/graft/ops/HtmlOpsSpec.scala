package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def pages(html: String*) =
    html.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("doc_id", "html")

  private val longText =
    "the quick brown fox jumps over the lazy dog and keeps on running far away"

  test("synthesized page: content block kept, title/nav/snippet/footer gated out") {
    val docs = Seq((7L, longText)).toDF("doc_id", "text")
    val blocks = HtmlOps.htmlBlocks(HtmlOps.synthesizePages(docs))
      .orderBy("block_idx").collect()
    // title, nav, content, snippet, footer — all non-empty blocks
    assert(blocks.length === 5)
    val kept = blocks.filter(_.getAs[Boolean]("keep"))
    assert(kept.map(_.getAs[String]("block_text")).toSeq === Seq(longText))
    // nav and footer are link-dense
    val nav = blocks(1)
    assert(nav.getAs[String]("block_text") === "Home About Contact")
    assert(nav.getAs[Double]("link_density") === 1.0)
    val main = HtmlOps.htmlExtract(HtmlOps.synthesizePages(docs)).collect()(0)
    assert(main.getAs[Long]("n_blocks") === 5L)
    assert(main.getAs[Long]("n_kept") === 1L)
    assert(main.getAs[String]("main_text") === longText)
  }

  test("script/style/comment bodies are removed; encoded markup stays inert text") {
    val h = "<div><p>real content that is long enough to pass the gate here</p>" +
      "<script type='x'>var boiler = 'plate';</script><style>.x{}</style>" +
      "<!-- hidden comment --><p>&lt;script&gt;alert(1)&lt;/script&gt; plus " +
      "more words to pass the length gate</p></div>"
    val b = HtmlOps.htmlBlocks(pages(h)).collect()
    val texts = b.map(_.getAs[String]("block_text"))
    assert(!texts.exists(_.contains("boiler")))
    assert(!texts.exists(_.contains("hidden")))
    // &lt;script&gt; decodes AFTER tag-strip — survives as literal text
    assert(texts.exists(_.startsWith("<script>alert(1)</script>")))
  }

  test("entity decode: &amp; decodes last, so &amp;lt; yields the literal entity") {
    val d = pages("<p>a &amp;lt; b &amp; c &quot;q&quot; &#39;s&#39; x&nbsp;y " +
      "padding words to clear the length gate</p>")
    val t = HtmlOps.htmlBlocks(d).collect()(0).getAs[String]("block_text")
    assert(t.contains("a &lt; b"))
    assert(t.contains("& c"))
    assert(t.contains("\"q\" 's'"))
    assert(t.contains("x y"))
  }

  test("malformed markup is contained, never fatal") {
    val cases = pages(
      // unclosed script: tag stripped, body survives as gated text
      "<div><script>var x = unterminated</div>",
      // stray '<' swallows to the next '>', then text continues
      "<p>broken < tag soup> but the sentence keeps going long enough to keep</p>",
      // '>' inside an attribute value ends the tag early — deterministic
      "<p><a href=\"/x?a>b\">link</a> and surrounding prose that is long enough</p>",
      // nested/unclosed anchors
      "<p><a href='/'><a href='/2'>double</a> open anchor text that runs long enough</p>",
      // no markup at all
      "plain text with no tags at all but comfortably past the length gate")
    val rows = HtmlOps.htmlBlocks(cases).collect()
    assert(rows.nonEmpty) // no exception anywhere in the pipeline
    val byDoc = rows.groupBy(_.getLong(0))
    // doc 1: the stray-< text survives past the swallowed span
    assert(byDoc(1L).exists(_.getAs[String]("block_text").contains("keeps going")))
    // doc 4: plain text passes through verbatim
    assert(byDoc(4L).exists(_.getAs[String]("block_text").startsWith("plain text")))
  }

  test("link density gates a mixed block at the 0.3 boundary semantics") {
    // link text 10 chars of 60 → ~0.17 kept; 30 of 60 → 0.5 dropped
    val ok = "<p><a href='/'>ten chars!</a> followed by fifty more characters of prose</p>"
    val bad = "<p><a href='/'>thirty characters of link text</a> short tail here</p>"
    val r = HtmlOps.htmlBlocks(pages(ok, bad)).collect()
    val keepByDoc = r.map(x => x.getLong(0) -> x.getAs[Boolean]("keep")).toMap
    assert(keepByDoc(0L))
    assert(!keepByDoc(1L))
  }

  test("webIngest: funnel counts — URL dups drop at stage 1, short docs at the clean gate") {
    import spark.implicits._
    val long = ("spark " * 30).trim // extracts well past the 50-char gate
    // ids 0 and 27300 share every residue class synthesizeUrls uses
    // (27300 = lcm(3,4,13,2,5,7,50,20,6)) → identical URLs
    val docs = Seq(
      (0L, long, "en", "s1", long.length.toLong),
      (27300L, long, "en", "s1", long.length.toLong), // exact URL twin of 0
      (1L, "tiny", "en", "s2", 4L) // survives URL dedup, fails clean gate
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = HtmlOps.webIngest(docs).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r("s1") === ((2L, 1L, 1L)), "URL twin collapses: 2 pages → 1 unique → 1 clean")
    assert(r("s2") === ((1L, 1L, 0L)), "short doc passes dedup, fails the clean gate")
  }
}
