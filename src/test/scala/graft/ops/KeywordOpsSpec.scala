package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KeywordOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark spark spark catalyst tungsten"),
    (1L, "flink flink beam")
  ).toDF("doc_id", "text")

  test("keywordTopN ranks by tf then length, caps at n") {
    val r = KeywordOps.keywordTopN(docs, n = 2)
    assert(r.filter($"doc_id" === 0).count() === 2)
    val top = r.filter($"doc_id" === 0 && $"rank" === 1).head()
    assert(top.getAs[String]("keyword") === "spark")
    assert(top.getAs[Long]("tf") === 3L)
  }

  test("distinctKeywords: first-occurrence order, capped (app_callapi.py:213)") {
    val dk = KeywordOps.distinctKeywords(KeywordOps.keywordTopN(docs, 2), cap = 3)
      .orderBy("first_seen").select("keyword").as[String].collect()
    assert(dk.head === "spark") // doc 0 rank 1 comes first
    assert(dk.length === 3)
    assert(dk.distinct.length === dk.length)
  }

  test("assemblePrompt joins keywords in first-seen order with notes") {
    val p = KeywordOps.assemblePrompt(
      KeywordOps.distinctKeywords(KeywordOps.keywordTopN(docs, 1), cap = 2), "n1")
      .head().getString(0)
    assert(p.startsWith("Write a project proposal covering the following keywords: spark"))
    assert(p.endsWith("Additional notes: n1"))
  }

  test("keywordExtract produces 1- and 2-gram candidates ranked per doc") {
    val r = KeywordOps.keywordExtract(docs, n = 5)
    val kws = r.filter($"doc_id" === 0).select("keyword").as[String].collect().toSet
    assert(kws.exists(_.contains(" "))) // bigram present
    assert(r.filter($"doc_id" === 0).count() <= 5)
    // corpus-distinctive tokens outrank cross-doc ones
    assert(r.filter($"rank" === 1 && $"doc_id" === 0).head().getAs[String]("keyword").contains("spark"))
  }

  test("F4 stopword filter: English exact-match + Korean containment (app.py:70-71,108-110)") {
    val d = Seq(
      (0L, "the spark engine is the best engine"),
      (1L, "데이터는 스파크의 엔진 엔진 엔진") // 는/의 are particle-containing
    ).toDF("doc_id", "text")
    val top = KeywordOps.keywordTopN(d, n = 10)
    val kw0 = top.filter($"doc_id" === 0).select("keyword").as[String].collect().toSet
    assert(!kw0.contains("the") && !kw0.contains("is")) // English exact-match dropped
    assert(kw0.contains("engine") && kw0.contains("spark"))
    val kw1 = top.filter($"doc_id" === 1).select("keyword").as[String].collect().toSet
    assert(!kw1.contains("데이터는") && !kw1.contains("스파크의")) // particle containment dropped
    assert(kw1.contains("엔진"))
    // keywordExtract: bigram containing a stopword token is dropped
    val ext = KeywordOps.keywordExtract(d, n = 20)
      .filter($"doc_id" === 0).select("keyword").as[String].collect().toSet
    assert(!ext.exists(_.split(" ").exists(KeywordOps.StopwordsEn.contains)))
    assert(ext.contains("spark engine"))
  }
}
