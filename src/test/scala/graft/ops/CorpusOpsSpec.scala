package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases lifted from the reference (SURVEY.md §5.2): lock files
  * (app.py:35), wrong extensions (app.py:121), blank paragraphs
  * (app.py:24), duplicate (file,i) (app.py:98), changed-file upsert
  * (app_callapi.py:140). */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta\n\ngamma", "en", "report.docx", 16L),
    (1L, "  ", "en", "blank.docx", 2L),
    (2L, "alpha beta\n\ngamma", "en", "~$report.docx", 16L),
    (3L, "hello", "en", "notes.txt", 5L),
    (4L, "alpha beta\n\ngamma", "en", "report.docx", 16L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("filterSources drops ~$ lock files and non-pdf/docx extensions") {
    val srcs = CorpusOps.filterSources(corpus).select("source").as[String].collect().toSet
    assert(srcs === Set("report.docx", "blank.docx"))
  }

  test("filterSources admits extension-less sources (testdata shape)") {
    val df = Seq((0L, "src0")).toDF("doc_id", "source")
    assert(CorpusOps.filterSources(df).count() === 1)
  }


  test("chunkOverlap: stride starts, boundary token shared, no contained tail") {
    import spark.implicits._
    val docs = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = CorpusOps.chunkOverlap(docs, chunkSize = 8, stride = 4).collect()
      .map(x => x.getAs[Long]("chunk_idx") ->
        ((x.getAs[Long]("start"), x.getAs[Long]("n_tok"), x.getAs[String]("chunk")))).toMap
    // 10 tokens, stride 4 → starts 1, 5 only: the start=5 chunk already
    // covers t5..t10, so a start=9 chunk would be a pure sub-span of it
    // (every token duplicated) and is NOT emitted
    assert(r.keySet === Set(0L, 1L))
    assert(r(0L) === ((1L, 8L, (1 to 8).map(i => s"t$i").mkString(" "))))
    assert(r(1L) === ((5L, 6L, (5 to 10).map(i => s"t$i").mkString(" "))))
    // the overlap property: token t8 (a boundary token) appears in
    // BOTH chunk 0 and chunk 1 — what disjoint windows cannot give
    assert(r(0L)._3.contains("t8") && r(1L)._3.contains("t8"))
    // a genuinely-new-token tail IS kept: 13 tokens → starts 1, 5, 9,
    // and the start=9 chunk carries t13, which no earlier chunk holds
    val r13 = CorpusOps.chunkOverlap(
      Seq((3L, (1 to 13).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"),
      chunkSize = 8, stride = 4).collect().map(_.getAs[Long]("start")).sorted
    assert(r13.toSeq === Seq(1L, 5L, 9L))
    // every chunk covers at least one token index no predecessor covers
    // (starts ascend by stride; last start ≤ size - chunkSize + stride)
    assert(CorpusOps.chunkOverlap(docs, chunkSize = 4, stride = 2)
      .collect().map(_.getAs[Long]("start")).max <= 10L - 4L + 2L)
    // empty doc yields no chunks
    assert(CorpusOps.chunkOverlap(Seq((2L, "   ")).toDF("doc_id", "text")).count() === 0L)
  }

  test("segmentParagraphs splits, trims, drops blanks, numbers by position") {
    val rows = CorpusOps
      .segmentParagraphs(corpus.filter($"doc_id" === 0), delim = "\n")
      .orderBy("para_idx")
      .collect()
    assert(rows.map(_.getString(2)).toSeq === Seq("alpha beta", "gamma"))
    assert(rows.map(_.getInt(1)).toSeq === Seq(0, 2)) // positional index keeps gaps
  }

  test("segmentParagraphs on whitespace-only text yields no rows") {
    assert(CorpusOps.segmentParagraphs(corpus.filter($"doc_id" === 1)).count() === 0)
  }

  test("dedupDocuments keeps smallest doc_id per (source, text) with copy count") {
    val r = CorpusOps.dedupDocuments(corpus)
      .filter($"source" === "report.docx").head()
    assert(r.getLong(0) === 0L) // min doc_id
    assert(r.getLong(2) === 2L) // two copies
  }

  test("dedupParagraphs groups identical paragraphs with first position") {
    val r = CorpusOps.dedupParagraphs(corpus, delim = "\n")
      .filter($"para" === "alpha beta").head()
    assert(r.getAs[Long]("n_copies") === 3L) // docs 0, 2, 4
    assert(r.getAs[Long]("first_doc_id") === 0L)
    assert(r.getAs[Long]("first_para_idx") === 0L)
  }

  test("segmentParagraphs treats the delimiter literally, not as regex") {
    val df = Seq((0L, "a.b.c")).toDF("doc_id", "text")
    val parts = CorpusOps.segmentParagraphs(df, delim = ".")
      .orderBy("para_idx").select("para").as[String].collect()
    assert(parts.toSeq === Seq("a", "b", "c"))
  }

  test("contentHash equals sha-256 hex of the text") {
    val h = CorpusOps.contentHash(corpus.filter($"doc_id" === 3)).head().getString(1)
    assert(h === "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
  }

  test("incrementalAntiJoin keeps only docs whose hash is not in state") {
    val state = CorpusOps.contentHash(corpus.filter($"doc_id" === 0))
    val kept = CorpusOps.incrementalAntiJoin(corpus, state)
      .select("doc_id").as[Long].collect().toSet
    // docs 0, 2, 4 share text → all filtered; 1 and 3 survive
    assert(kept === Set(1L, 3L))
  }

  test("upsertSource = delete + append without touching other sources") {
    val replacement = Seq((9L, "new text", "en", "report.docx", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = CorpusOps.upsertSource(corpus, "report.docx", replacement)
    assert(out.filter($"source" === "report.docx").count() === 1)
    assert(out.count() === 4) // 3 others + 1 replacement
  }

  test("snapshotDiff classifies added/removed/changed and drops unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val newSnap = Seq((2L, "b2"), (3L, "c"), (4L, "d")).toDF("doc_id", "text")
    val r = CorpusOps.snapshotDiff(oldSnap, newSnap).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r === Map(1L -> "removed", 2L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff of identical snapshots is an empty change feed") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(CorpusOps.snapshotDiff(snap, snap).count() === 0)
  }

  test("cdcApply: latest-wins merge with delete, override, resurrection, and a fresh insert") {
    def sha(s: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (1L, 1L, "U", "one-v1"), (1L, 2L, "U", "one-v2"), // override
      (2L, 1L, "D", null),                              // delete stays deleted
      (3L, 1L, "D", null), (3L, 2L, "I", "three-back"), // resurrection
      (9L, 1L, "I", "nine"))                            // fresh insert
      .toDF("doc_id", "version", "op", "text")
    val r = CorpusOps.cdcApply(base, changes).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("content_hash")).toMap
    assert(r.keySet === Set(1L, 3L, 4L, 9L))
    assert(r(1L) === sha("one-v2"), "v2 update must override v1")
    assert(r(3L) === sha("three-back"), "re-insert must resurrect a deleted key")
    assert(r(4L) === sha("four"), "untouched key passes through")
    assert(r(9L) === sha("nine"), "fresh insert lands")
  }

  test("corpusStats aggregates per language") {
    val r = CorpusOps.corpusStats(corpus).head()
    assert(r.getAs[Long]("n_docs") === 5L)
    assert(r.getAs[Long]("total_chars") === 55L)
  }

  test("chunkParagraphs groups tokens into ordered fixed windows") {
    val docs = Seq((0L, "a b c d e f g", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val paras = CorpusOps.chunkParagraphs(docs, window = 3)
      .orderBy("para_idx").collect()
      .map(r => r.getAs[Long]("para_idx") -> r.getAs[String]("para"))
    assert(paras.toSeq === Seq(0L -> "a b c", 1L -> "d e f", 2L -> "g"))
  }

  test("chunkParagraphs restores in-chunk token order regardless of shuffle") {
    val text = (0 until 64).map(i => s"t$i").mkString(" ")
    val docs = Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(8)
    val paras = CorpusOps.chunkParagraphs(docs, window = 8).collect()
      .map(r => r.getAs[Long]("para_idx") -> r.getAs[String]("para")).toMap
    assert(paras(0L) === (0 until 8).map(i => s"t$i").mkString(" "))
    assert(paras(7L) === (56 until 64).map(i => s"t$i").mkString(" "))
  }

  test("ingestPipeline: changed docs only, dedup before embed, unit-norm output") {
    val docs = Seq(
      (0L, "alpha beta gamma delta", "en", "s0", 22L), // in state → skipped
      (1L, "epsilon zeta eta theta", "en", "s1", 22L), // new → embedded
      (2L, "epsilon zeta eta theta", "en", "s2", 22L), // dup of 1 → deduped
      (3L, "", "en", "s3", 0L) // empty → no tokens, no rows
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val state = CorpusOps.contentHash(docs.filter($"doc_id" === 0))
    val out = CorpusOps.ingestPipeline(docs, state, window = 8)
    val byDoc = out.collect().groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet === Set(1L)) // 0 unchanged, 2 deduped, 3 empty
    assert(byDoc(1L).forall(_.getAs[Long]("para_idx") === 0L))
    // L2 norm of the paragraph's weights = 1 (4 distinct tokens)
    val norm = math.sqrt(byDoc(1L).map(r => math.pow(r.getAs[Double]("weight"), 2)).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("sourceOverlap: near-dup families pair sources; containment exact per side") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = Seq(
      (0L, base, "a"),
      (1L, "totally unrelated first words that shingle without overlap here", "a"),
      (2L, base + " with a tiny edit", "b"), // near-dups doc 0 across sources
      (3L, "separate second text with its own distinct shingle vocabulary", "b"),
      (4L, "third unrelated body of words keeping source b at three docs", "b"),
      (5L, "a lonely source c document sharing nothing with anyone else", "c")
    ).toDF("doc_id", "text", "source")
    val r = CorpusOps.sourceOverlap(d).collect()
    assert(r.length === 1, "only (a,b) share a near-dup family; c pairs with nobody")
    val x = r.head
    assert(x.getAs[String]("src_a") === "a" && x.getAs[String]("src_b") === "b")
    assert(x.getAs[Long]("n_shared_families") === 1L)
    assert(x.getAs[Long]("n_shared_docs_a") === 1L)
    assert(x.getAs[Long]("n_shared_docs_b") === 1L)
    assert(x.getAs[Long]("cont_a_micro") === 500000L, "1 of a's 2 docs mirrored")
    assert(x.getAs[Long]("cont_b_micro") === 333333L, "1 of b's 3 docs mirrored")
  }

  test("corpusDiff: churn, volume, dup rate, and facet drift in one exact row") {
    // old: 4 docs (one exact-dup pair), all lang=en, sources a/b
    // new: drops doc 0, adds docs 4+5 (one lang=de), source c appears
    val oldD = Seq(
      (0L, "same text", "en", "a", 9L), (1L, "same text", "en", "a", 9L),
      (2L, "unique two", "en", "b", 10L), (3L, "unique three", "en", "b", 12L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val newD = Seq(
      (1L, "same text", "en", "a", 9L), (2L, "unique two", "en", "b", 10L),
      (3L, "unique three", "en", "b", 12L), (4L, "fresh four", "de", "c", 10L),
      (5L, "fresh five", "en", "c", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = CorpusOps.corpusDiff(oldD, newD).collect().head
    assert(r.getAs[Long]("n_docs_old") === 4L)
    assert(r.getAs[Long]("n_docs_new") === 5L)
    assert(r.getAs[Long]("n_added") === 2L)
    assert(r.getAs[Long]("n_removed") === 1L)
    assert(r.getAs[Long]("n_chars_old") === 40L)
    assert(r.getAs[Long]("n_chars_new") === 51L)
    assert(r.getAs[Long]("dup_micro_old") === 250000L, "1 of 4 docs is a copy")
    assert(r.getAs[Long]("dup_micro_new") === 0L)
    // lang: en 1000000 -> 800000, de 0 -> 200000: L1 = 400000
    assert(r.getAs[Long]("lang_l1_micro") === 400000L)
    // source shares: a 500000->200000, b 500000->400000, c 0->400000
    assert(r.getAs[Long]("source_l1_micro") === 800000L)
  }
}
