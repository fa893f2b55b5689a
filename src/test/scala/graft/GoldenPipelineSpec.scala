package graft

import graft.functions.VectorMath
import graft.ops._
import org.apache.spark.sql.functions._

/** Golden end-to-end test (SURVEY.md §5.2 #4): the full reference
  * lifecycle — ingest with hash-state anti-join (§3.1) → embed →
  * search (§3.2) → keywords → prompt (§3.3) — on a fixed corpus with
  * checked expectations at every stage. */
class GoldenPipelineSpec extends SparkSpec {
  import spark.implicits._

  // fixed corpus: doc 3 duplicates doc 0's content (incremental
  // re-upload), doc 4 is the reference's empty-text edge case
  private def corpus = Seq(
    (0L, "vector search engine with spark catalyst", "en", "a.docx", 40L),
    (1L, "keyword extraction ranks candidate phrases", "en", "b.docx", 43L),
    (2L, "vector search engine with flink gelly", "en", "c.docx", 37L),
    (3L, "vector search engine with spark catalyst", "en", "a2.docx", 40L),
    (4L, "", "en", "empty.docx", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("golden: ingest → embed → knn → keywords → prompt") {
    // --- ingest: state holds doc 0's hash; anti-join must drop 0 AND
    // its re-upload 3 (same content), keep 1, 2, 4 (§3.1 / J2)
    val state = CorpusOps.contentHash(corpus.filter($"doc_id" === 0))
    val fresh = CorpusOps.incrementalAntiJoin(corpus, state)
    assert(fresh.select("doc_id").as[Long].collect().toSet === Set(1L, 2L, 4L))

    // --- embed: dense vectors; empty doc = zero vector (E1)
    val emb = EmbedOps.embedDense(corpus, dim = 32)
    val zero = emb.filter($"doc_id" === 4).head().getSeq[Float](1)
    assert(zero.forall(_ === 0f))

    // --- search: query with doc 0's vector; duplicate doc 3 must be
    // the exact-match neighbor (distance 0) and doc 2 (shared prefix)
    // must beat doc 1 (unrelated) (§3.2 / J3+W1)
    val vecs = emb.select($"doc_id".as("vec_id"), $"embedding", lit(0).as("label"))
    val q = vecs.filter($"vec_id" === 0)
      .select(VectorMath.asDouble($"embedding").as("qe"))
    // k=5: the zero vector (distance 1.0 from any unit query) ranks
    // ABOVE disjoint-vocabulary docs (distance 2.0) — so k=4 would
    // exclude doc 1, not doc 4
    val hits = VectorOps.knnSearch(vecs, q, 5).orderBy("rank").collect()
    assert(hits.map(_.getAs[Long]("vec_id")).take(2).toSet === Set(0L, 3L))
    assert(hits(0).getAs[Double]("l2_sq") === 0.0 && hits(1).getAs[Double]("l2_sq") === 0.0)
    val rankOf = hits.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("rank")).toMap
    assert(rankOf(2L) < rankOf(1L))

    // --- keywords on the hit docs → ordered distinct → prompt (§3.3)
    val topn = KeywordOps.keywordTopN(corpus.filter($"doc_id".isin(0L, 2L, 3L)), n = 3)
    val dk = KeywordOps.distinctKeywords(topn, cap = 4)
    val prompt = KeywordOps.assemblePrompt(dk, "golden run").head().getString(0)
    assert(prompt.startsWith("Write a project proposal covering the following keywords: "))
    assert(prompt.contains("vector") || prompt.contains("search"))
    assert(prompt.endsWith("Additional notes: golden run"))

    // --- stability: the whole pipeline is deterministic
    val prompt2 = KeywordOps.assemblePrompt(
      KeywordOps.distinctKeywords(
        KeywordOps.keywordTopN(corpus.filter($"doc_id".isin(0L, 2L, 3L)), n = 3), cap = 4),
      "golden run").head().getString(0)
    assert(prompt === prompt2)
  }

  test("golden: upload sink accepts pdf/docx, drops lock and foreign files, bytes survive (S5)") {
    val dir = java.nio.file.Files.createTempDirectory("uploads").resolve("corpus").toString
    val uploads = Seq(
      ("report.docx", "docx-bytes".getBytes("UTF-8")),
      ("deck.pdf", "pdf-bytes".getBytes("UTF-8")),
      ("~$report.docx", "lock".getBytes("UTF-8")), // Office lock file (app.py:144)
      ("notes.txt", "txt".getBytes("UTF-8")) // unsupported extension
    ).toDF("source", "content")
    val accepted = CorpusOps.uploadSink(uploads, dir)
    assert(accepted.select("source").as[String].collect().toSet
      === Set("report.docx", "deck.pdf"))
    val back = spark.read.parquet(dir)
      .collect().map(r => r.getString(0) -> new String(r.getAs[Array[Byte]](1), "UTF-8")).toMap
    assert(back === Map("report.docx" -> "docx-bytes", "deck.pdf" -> "pdf-bytes"))
  }
}
