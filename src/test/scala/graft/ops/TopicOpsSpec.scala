package graft.ops

import graft.SparkSpec

class TopicOpsSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies in two doc blocks — the planted
  // structure EM should discover
  private def blockDocs = {
    val va = Seq("alpha", "bravo", "charlie", "delta", "echo")
    val vb = Seq("zulu", "yankee", "xray", "whiskey", "victor")
    ((1 to 12).map(i => (i.toLong, Seq.fill(4)(va((i + 0) % 5)).mkString(" ") + " " +
        va((i + 1) % 5) + " " + va((i + 2) % 5))) ++
      (13 to 24).map(i => (i.toLong, Seq.fill(4)(vb(i % 5)).mkString(" ") + " " +
        vb((i + 1) % 5) + " " + vb((i + 2) % 5))))
      .toDF("doc_id", "text")
  }

  test("plsaTopics: shape contract — dense ranks, weights in (0,1], descending per topic") {
    val r = TopicOps.plsaTopics(blockDocs, k = 4, rounds = 2, topN = 5).collect()
    val byTopic = r.groupBy(_.getAs[Long]("topic"))
    assert(byTopic.keySet === Set(0L, 1L, 2L, 3L))
    byTopic.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq === (1L to sorted.length))
      val ws = sorted.map(_.getAs[Double]("weight"))
      assert(ws.forall(w => w > 0 && w <= 1))
      assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
        "rank order must follow weight order")
    }
  }

  test("plsaTopics: EM separates the two planted vocabularies") {
    val va = Set("alpha", "bravo", "charlie", "delta", "echo")
    val r = TopicOps.plsaTopics(blockDocs, k = 4, rounds = 6, topN = 5).collect()
    // for each topic, measure block purity of its top-5 words; at
    // least two topics (one per block) must be ≥ 4/5 pure
    val purities = r.groupBy(_.getAs[Long]("topic")).map { case (_, rows) =>
      val words = rows.map(_.getAs[String]("tok"))
      val inA = words.count(va.contains)
      math.max(inA, words.length - inA)
    }.toSeq
    assert(purities.count(_ >= 4) >= 2,
      s"expected block-pure topics, purities over top-5: $purities")
  }

  test("plsaTopics: deterministic — identical output across recomputation") {
    val a = TopicOps.plsaTopics(blockDocs, k = 4, rounds = 2, topN = 5).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getDouble(3))).toSeq
    val b = TopicOps.plsaTopics(blockDocs, k = 4, rounds = 2, topN = 5).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getDouble(3))).toSeq
    assert(a === b)
  }

  test("plsaAssignFromPhi: every tokened doc gets ONE topic; the planted blocks separate; reload ≡ fresh") {
    val docs = blockDocs
    val phi = TopicOps.plsaPhi(docs, k = 4, rounds = 2)
    val a = TopicOps.plsaAssignFromPhi(docs, phi, k = 4)
    val rows = a.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("topic"))
    assert(rows.length === 24 && rows.map(_._1).distinct.length === 24)
    // fold-in agreement with the planted structure: with k=4 over 2
    // blocks EM may split a block across two topics, but the two
    // blocks' topic SETS must be disjoint — no topic serves both
    // vocabularies
    val blockA = rows.filter(_._1 <= 12).map(_._2).toSet
    val blockB = rows.filter(_._1 > 12).map(_._2).toSet
    assert(blockA.intersect(blockB).isEmpty, s"blocks share topics: $blockA vs $blockB")
    // the parquet-reloaded artifact assigns bit-identically
    val tmp = java.nio.file.Files.createTempDirectory("graft_phi").toString
    phi.write.mode("overwrite").parquet(tmp)
    val re = TopicOps.plsaAssignFromPhi(docs, spark.read.parquet(tmp), k = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(re === a.collect().map(_.toString).sorted.toSeq)
  }

  test("topicCoherence: block-pure topics score strongly positive NPMI") {
    // the planted blocks make every within-topic word pair a genuine
    // co-occurrence pattern — coherence must be clearly positive for
    // every discovered topic, and pairs = C(5,2) per topic
    val r = TopicOps.topicCoherence(blockDocs, k = 4, rounds = 6, topN = 5)
      .collect()
    assert(r.length === 4)
    r.foreach { x =>
      assert(x.getAs[Long]("n_pairs") === 10L)
      // each doc carries a rotating 3-of-5 subset of its block's
      // vocabulary, so pairwise NPMI is moderate — the claim is
      // CLEARLY POSITIVE coherence on every topic, not near-1
      assert(x.getAs[Long]("mean_npmi_micro") > 50000L,
        s"block-pure topic should cohere: $x")
      assert(x.getAs[Long]("mean_npmi_micro") ===
        math.floor(x.getAs[Long]("npmi_sum6").toDouble /
          x.getAs[Long]("n_pairs")).toLong)
    }
  }
}
