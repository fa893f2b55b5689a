package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SearchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark engine spark engine spark", "en", "a.docx", 30L),
    (1L, "spark appears once here only today", "en", "b.docx", 33L),
    (2L, "nothing relevant in this document at all", "en", "c.docx", 40L),
    (3L, "engine engine engine engine engine engine", "en", "d.docx", 41L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("proposalFlow: hits ranked, keywords accumulate in hit-rank order, prompt capped at 6") {
    val d = Seq(
      (0L, "spark spark spark alpha beta", "en", "a.docx", 28L),
      (1L, "spark spark gamma delta epsilon zeta", "en", "b.docx", 36L),
      (2L, "unrelated words entirely different topic", "en", "c.docx", 40L),
      (3L, "spark alpha", "en", "d.docx", 11L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.proposalFlow(d, "spark", k = 3, notes = "n").orderBy("hit_rank").collect()
    assert(r.length === 3)
    // every row carries the SAME prompt; hits are score-ordered
    assert(r.map(_.getAs[String]("prompt")).distinct.length === 1)
    val ranks = r.map(_.getAs[Long]("hit_rank")).toSeq
    assert(ranks === Seq(1L, 2L, 3L))
    val scores = r.map(_.getAs[Double]("score")).toSeq
    assert(scores === scores.sorted.reverse)
    // rank-1 hit's keywords lead the prompt's keyword list (first-seen
    // order is hit-rank order, the reference's all_kw accumulation)
    val prompt = r.head.getAs[String]("prompt")
    val kw1 = r.head.getAs[String]("keywords").split(", ").head
    assert(prompt.startsWith(
      s"Write a project proposal covering the following keywords: $kw1"))
    assert(prompt.endsWith(". Additional notes: n"))
    // cap: the prompt never carries more than 6 keywords
    val kwSection = prompt
      .stripPrefix("Write a project proposal covering the following keywords: ")
      .takeWhile(_ != '.')
    assert(kwSection.split(", ").length <= 6)
  }

  test("bm25HardNegatives: positive excluded, lexical overlap required, ranks deterministic") {
    val d = Seq(
      (0L, "alpha beta gamma", "en", "a", 1L),      // probe: query = its keywords
      (1L, "alpha beta unrelatedword", "en", "b", 1L), // strong lexical negative
      (2L, "alpha only here", "en", "c", 1L),       // weaker negative
      (3L, "nothing shared at all", "en", "d", 1L)  // no overlap: absent
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.bm25HardNegatives(d, nQueries = 1, qTerms = 3, k = 5)
      .orderBy("query_doc", "rank").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("query_doc") === 0L))
    val negs = r.map(_.getAs[Long]("neg_id")).toSeq
    assert(!negs.contains(0L), "the positive must never be its own negative")
    assert(!negs.contains(3L), "a doc sharing no query term cannot score")
    assert(negs.head === 1L, "the two-term overlap out-scores the one-term overlap")
    assert(r.map(_.getAs[Long]("rank")).toSeq === (1L to r.length).toSeq)
    val scores = r.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("searchBm25: tf raises score, irrelevant docs absent, ranks deterministic") {
    val r = SearchOps.searchBm25(docs, "spark", k = 3).orderBy("rank").collect()
    // only docs containing 'spark' score
    assert(r.map(_.getAs[Long]("doc_id")).toSet === Set(0L, 1L))
    // higher tf wins rank 1
    assert(r.head.getAs[Long]("doc_id") === 0L)
    assert(r.head.getAs[Double]("score") > r(1).getAs[Double]("score"))
  }

  test("bm25Index: merged (base ∪ batch) index scores ≡ from-scratch searchBm25") {
    // base = docs 0,1,2; batch = doc 3 — the batch only indexes
    // itself, yet the merged index must reproduce the full corpus's
    // BM25 (df, N, avgdl all shift with the add; they derive from
    // the merged postings at query time, so the identity is exact)
    val base = docs.filter($"doc_id" < 3)
    val batch = docs.filter($"doc_id" === 3)
    val merged = SearchOps.bm25Index(base)
      .unionByName(SearchOps.bm25Index(batch))
    val inc = SearchOps.searchBm25FromIndex(merged, docs, "spark engine", k = 4)
      .collect().map(_.toString).sorted.toSeq
    val scratch = SearchOps.searchBm25(docs, "spark engine", k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(inc === scratch)
    assert(inc.nonEmpty)
  }

  test("bm25Index: sentinel rows keep token-less docs in N; parquet round-trip is exact") {
    val withEmpty = docs.unionByName(
      Seq((9L, "", "en", "e.docx", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val idx = SearchOps.bm25Index(withEmpty)
    // 5 docs → 5 distinct doc_ids in the index even though doc 9 has no tokens
    assert(idx.select("doc_id").distinct().count() === 5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25idx").toString
    idx.write.mode("overwrite").parquet(tmp)
    val re = SearchOps.searchBm25FromIndex(spark.read.parquet(tmp), withEmpty,
        "spark engine", k = 4).collect().map(_.toString).sorted.toSeq
    val fresh = SearchOps.searchBm25(withEmpty, "spark engine", k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(re === fresh)
  }

  test("contextPack: ranked prefix under the token budget, cut exactly at overflow") {
    // every doc mentions 'spark' so all rank; 6 ws-tokens each
    val d = Seq(
      (0L, "spark spark spark spark spark spark", "en", "a", 1L),
      (1L, "spark spark spark spark spark one", "en", "b", 1L),
      (2L, "spark spark spark spark two three", "en", "c", 1L),
      (3L, "spark spark spark four five six", "en", "d", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    // budget 15 fits exactly two 6-token docs (12), not three (18)
    val packed = SearchOps.contextPack(d, "spark", tokenBudget = 15, k = 10)
      .orderBy("rank").collect()
    assert(packed.length === 2)
    assert(packed.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L)) // contiguous prefix
    assert(packed.last.getAs[Long]("cum_tokens") === 12L)
    // budget below the first doc → empty pack, not an error
    assert(SearchOps.contextPack(d, "spark", tokenBudget = 5, k = 10).count() === 0L)
    // a huge budget returns every ranked candidate
    assert(SearchOps.contextPack(d, "spark", tokenBudget = 1000, k = 10).count() === 4L)
  }

  test("phraseSearch: counts adjacency matches, not bag-of-words hits") {
    val d = Seq(
      (0L, "big data merge wins big data merge", "en", "a", 1L), // 2 matches
      (1L, "data big merge", "en", "b", 1L), // all terms, wrong order → 0
      (2L, "big data x merge", "en", "c", 1L), // gap breaks adjacency → 0
      (3L, "big data merge", "en", "d", 1L) // 1 match
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.phraseSearch(d, "big data merge", k = 10).collect()
    assert(r.map(_.getAs[Long]("doc_id")).toSeq === Seq(0L, 3L))
    assert(r.map(_.getAs[Long]("n_matches")).toSeq === Seq(2L, 1L))
    assert(r.map(_.getAs[Long]("rank")).toSeq === Seq(1L, 2L))
  }

  test("phraseSearch: seq index survives blank-dropped tokens and overlaps") {
    val d = Seq(
      (0L, "x  x   x", "en", "a", 1L), // double spaces; overlapping "x x" → 2
      (1L, "y x", "en", "b", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.phraseSearch(d, "x x", k = 5).collect()
    assert(r.map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("n_matches"))).toSeq
      === Seq((0L, 2L)))
  }


  test("moreLikeThis: the near-copy ranks first, the seed is excluded") {
    val d = Seq(
      (0L, "spark engine shuffle broadcast join", "en", "s", 35L),
      (1L, "spark engine shuffle broadcast join extra", "en", "s", 41L), // near copy
      (2L, "spark appears once", "en", "s", 18L),
      (3L, "totally unrelated words here", "en", "s", 28L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.moreLikeThis(d, seedDocId = 0L, k = 3).collect()
    assert(!r.map(_.getAs[Long]("doc_id")).contains(0L), "seed must not retrieve itself")
    assert(r.head.getAs[Long]("doc_id") === 1L)
    assert(r.head.getAs[Double]("score") > r(1).getAs[Double]("score"))
  }

  test("proximitySearch: within-gap pairs only, pair count ranks, min gap breaks ties") {
    val d = Seq(
      (1L, "alpha x beta", "en", "s", 12L),                    // 1 pair, gap 2
      (2L, "alpha x x x x x x beta", "en", "s", 22L),          // gap 7 > 5: absent
      (3L, "alpha beta alpha", "en", "s", 16L),                // 2 pairs, min gap 1
      (4L, "beta z alpha", "en", "s", 12L)                     // order-free: 1 pair, gap 2
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.proximitySearch(d, "alpha", "beta", maxGap = 5, k = 10).collect()
    val byDoc = r.map(x => x.getAs[Long]("doc_id") ->
      ((x.getAs[Long]("rank"), x.getAs[Long]("n_pairs"), x.getAs[Long]("min_gap")))).toMap
    assert(!byDoc.contains(2L), "7-apart pair must not qualify at maxGap=5")
    assert(byDoc(3L) === ((1L, 2L, 1L)))
    // docs 1 and 4 tie on (n_pairs=1, min_gap=2) -> doc_id breaks
    assert(byDoc(1L) === ((2L, 1L, 2L)))
    assert(byDoc(4L) === ((3L, 1L, 2L)))
  }
  test("searchBm25: idf favors rarer terms at equal tf") {
    // 'spark' (df 2) vs 'engine' (df 2)… make 'engine' common: df 2 vs 3
    val d = Seq(
      (0L, "spark one", "en", "a", 1L), (1L, "engine one", "en", "b", 1L),
      (2L, "engine two", "en", "c", 1L), (3L, "engine spark", "en", "d", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = SearchOps.searchBm25(d, "spark engine", k = 4).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    // doc 0 (rare 'spark') outscores doc 1 (common 'engine'), equal tf & length
    assert(r(0L) > r(1L))
    // doc 3 has both terms: highest
    assert(r(3L) > r(0L))
  }

  test("searchExpanded: a collocate-only doc is found; expansion weighs half") {
    import spark.implicits._
    // "vector" habitually co-occurs with "faiss" (5 training docs);
    // doc 100 mentions ONLY faiss — invisible to plain term match,
    // reachable through the expansion at half weight
    val docs = ((1L to 5L).map(i => (i, "vector faiss index build", "s")) ++ Seq(
      (100L, "faiss faiss faiss", "s"),
      (200L, "unrelated words entirely here", "s"))).toDF("doc_id", "text", "source")
    val r = SearchOps.searchExpanded(docs, queryText = "vector", k = 10)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    assert(r.contains(100L), "collocate-only doc must surface via expansion")
    assert(!r.contains(200L), "unrelated doc stays invisible")
    // doc 100: tf(faiss)=3 at w=0.5 → 1.5; training docs: vector 1.0 +
    // their own expansion hits
    assert(r(100L) === 1.5)
    assert(r(1L) >= 1.0 + 0.5, "original term plus at least one expansion hit")
  }

  test("maxsimSearch: full coverage beats one-term repetition (cosine ranks the opposite way)") {
    import spark.implicits._
    // doc 1 covers all three query tokens once, diluted by 13 fillers;
    // doc 2 spams the single token "sort"
    val fillers = (1 to 13).map(j => s"filler$j").mkString(" ")
    val docs = Seq(
      (1L, s"sort merge spark $fillers", "s"),
      (2L, "sort sort sort sort sort sort sort sort", "s"))
      .toDF("doc_id", "text", "source")
    val q = "sort merge spark"
    val maxsim = SearchOps.maxsimSearch(docs, q, k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(maxsim(1L) === 1L, "coverage must win under MaxSim")
    assert(maxsim(2L) === 2L)
    // the bag-of-words cosine prefers the spammer: doc 2's whole mass
    // sits on the one query dim, doc 1's is diluted across 16 dims
    val cos = SearchOps.searchText(docs, q, k = 2)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rank")).toMap
    assert(cos(2L) === 1L, "fixture must be one where cosine ranks the spammer first")
  }

  test("searchMmr: diversification picks one duplicate, cosine picks both") {
    import spark.implicits._
    // docs 1/2 are identical strong matches (pairwise sim 1.0, so the
    // duplicate's penalty is maximal); doc 3 matches a DIFFERENT part
    // of the query with zero overlap with doc 1; doc 4 is filler
    val docs = Seq(
      (1L, "spark merge sort join junk1 junk2", "s"),
      (2L, "spark merge sort join junk1 junk2", "s"),
      (3L, "filter scan other words", "s"),
      (4L, "unrelated filler entirely", "s")).toDF("doc_id", "text", "source")
    val q = "spark merge sort join filter scan"
    val cosTop2 = SearchOps.searchText(docs, q, k = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(cosTop2 === Set(1L, 2L), "cosine must return the duplicate pair")
    val mmr = SearchOps.searchMmr(docs, q, k = 2)
      .collect().sortBy(_.getAs[Long]("sel_rank"))
    assert(mmr.head.getAs[Long]("doc_id") === 1L, "seed = relevance argmax, doc_id tie-break")
    assert(mmr(1).getAs[Long]("doc_id") === 3L,
      "second pick must skip the duplicate for the diverse doc")
    assert(mmr(1).getAs[Double]("mmr_score") < mmr.head.getAs[Double]("mmr_score"))
  }

  test("searchSnippet: densest window wins, text reconstructs in order") {
    import spark.implicits._
    // doc 1: hits at seqs 1, 12, 13, 14 → the window anchored at 12
    // holds 3 hits; doc 2: one isolated hit; doc 3: no hits
    val d1 = "spark " + (1 to 10).map(j => s"f$j").mkString(" ") +
      " spark sort join tail words here"
    val docs = Seq(
      (1L, d1, "s"),
      (2L, "before spark after", "s"),
      (3L, "nothing relevant here", "s")).toDF("doc_id", "text", "source")
    val rows = SearchOps.searchSnippet(docs, "spark sort join", window = 10, k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("win_start"), r.getAs[Long]("n_hits"), r.getAs[String]("snippet"))))
      .toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L)._1 === 12L && rows(1L)._2 === 3L)
    assert(rows(1L)._3.startsWith("spark sort join"))
    assert(rows(1L)._3 === "spark sort join tail words here",
      "window clipped at doc end")
    assert(rows(2L) === ((2L, 1L, "spark after")))
  }

  test("searchRrf: cross-ranker agreement outranks any single-leg win") {
    import spark.implicits._
    // doc 1 is a balanced match every leg surfaces; doc 2 is a
    // one-term spammer that tops cosine but is weak elsewhere;
    // doc 3 is pure filler
    val docs = Seq(
      (1L, "spark merge sort join pipeline notes", "s"),
      (2L, "spark spark spark spark spark spark spark spark", "s"),
      (3L, "unrelated filler text entirely elsewhere", "s"))
      .toDF("doc_id", "text", "source")
    val rows = SearchOps.searchRrf(docs, "spark merge sort join", k = 3).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("rank"), r.getAs[Long]("n_lists"))).toMap
    assert(byDoc(1L)._1 === 1L, s"full coverage must fuse to rank 1: ${byDoc}")
    assert(byDoc(1L)._2 === 3L, "doc 1 must appear on all three legs")
    assert(byDoc(2L)._1 === 2L)
    assert(!byDoc.contains(3L) || byDoc(3L)._1 > 2L)
  }

  test("maxsimSearch: surface variants reach through shared trigrams") {
    import spark.implicits._
    val docs = Seq(
      (1L, "sort algorithms run here", "s"),
      (2L, "table widths vary here", "s")).toDF("doc_id", "text", "source")
    // "sorting" appears in NEITHER doc — bag-of-words has nothing to
    // match; MaxSim reaches "sort" through the shared sor/ort trigrams
    val r = SearchOps.maxsimSearch(docs, "sorting", k = 2)
      .collect().map(x => x.getAs[Long]("doc_id") -> x.getAs[Double]("score")).toMap
    assert(r.getOrElse(1L, 0.0) > 0.3, s"subword match must score: $r")
    assert(r.getOrElse(2L, 0.0) < r(1L) * 0.5, s"unrelated doc must trail: $r")
  }

  test("ndcgAudit: the self leg scores exactly 1, the bm25 leg is measured in (0, 1]") {
    val r = SearchOps.ndcgAudit(docs, "spark engine").collect()
      .map(x => x.getAs[String]("system") ->
        ((x.getAs[Long]("n_overlap"), x.getAs[Double]("dcg"),
          x.getAs[Double]("idcg"), x.getAs[Double]("ndcg")))).toMap
    assert(r.size === 2)
    val self = r("cosine_self")
    assert(self._4 === 1.0, s"ground truth vs itself must be exactly 1: $self")
    assert(self._2 === self._3, "self DCG is the ideal DCG")
    val bm = r("bm25")
    assert(bm._4 > 0.0 && bm._4 <= 1.0, s"bm25 nDCG must be a valid grade: $bm")
    assert(bm._3 === self._3, "one shared normalizer")
    // all 4 docs score under HASHED cosine (doc 2 shares no term but
    // its hashed dims collide with the query's): grades 10, 9, 8, 7
    // at positions 1..4 — the ideal DCG is the analytic fold
    val k = 10L
    val expectedIdcg = (1 to 4).map { i =>
      val rel = (k + 1 - i).toDouble
      math.round(rel * math.log(2.0) / math.log(i + 1.0) * 1e6) / 1e6
    }.sum
    assert(math.abs(self._3 - expectedIdcg) < 2e-6, s"${self._3} vs $expectedIdcg")
  }
}
