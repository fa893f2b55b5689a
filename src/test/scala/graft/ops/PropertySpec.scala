package graft.ops

import graft.SparkSpec
import graft.functions.VectorMath
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariants (SURVEY.md §5.2 #3) over seeded random
  * inputs: KNN result size = min(k,n) with non-decreasing distances,
  * dedup idempotence, embedder unit-norm. Plain seeded trials rather
  * than ScalaCheck's runner — build.sbt deliberately has no
  * scalatest/scalacheck bridge artifact and the offline resolver
  * cannot fetch one. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  // one Random PER TEST (seeded in the test body): a suite-shared
  // mutable RNG makes each test's data depend on execution order, so
  // a CI failure can't be reproduced by running that test alone

  test("property: knn returns min(k,n) rows with non-decreasing distances") {
    val rnd = new Random(101)
    for (_ <- 1 to 5) {
      val n = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(15)
      val rows = (0 until n).map(i =>
        (i.toLong, Seq.fill(4)(rnd.nextFloat() * 10 - 5), i % 3))
      val emb = rows.toDF("vec_id", "embedding", "label")
      val q = emb.filter($"vec_id" === 0)
        .select(VectorMath.asDouble($"embedding").as("qe"))
      val res = VectorOps.knnSearch(emb, q, k).orderBy("rank").collect()
      assert(res.length === math.min(k, n))
      val d = res.map(_.getAs[Double]("l2_sq"))
      assert(d.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
      assert(d.head === 0.0) // query is in the corpus
    }
  }

  private def randText(rnd: Random): String =
    Seq.fill(rnd.nextInt(12))(
      Seq("alpha", "beta", "gamma", "delta", "the", "a")(rnd.nextInt(6))).mkString(" ")

  test("property: dedupDocuments key set equals distinct (source, text)") {
    val rnd = new Random(102)
    for (_ <- 1 to 5) {
      val docs = (0 until 6).map(i =>
        (i.toLong, randText(rnd), "en", s"s${i % 2}", i.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val once = CorpusOps.dedupDocuments(docs)
      assert(once.count() === docs.select("source", "text").distinct().count())
    }
  }

  test("property: embedSparse weights always form (rounded) unit vectors") {
    val rnd = new Random(103)
    for (_ <- 1 to 5) {
      val docs = (0 until 4).map(i => (i.toLong, randText(rnd)))
        .filter(_._2.nonEmpty).toDF("doc_id", "text")
      val norms = EmbedOps.embedSparse(docs, dim = 8)
        .groupBy("doc_id").agg(sum($"weight" * $"weight").as("n2"))
        .select("n2").as[Double].collect()
      assert(norms.forall(n => math.abs(n - 1.0) < 1e-3))
    }
  }

  test("property: chunkParagraphs loses no tokens and keeps order") {
    val rnd = new Random(104)
    for (_ <- 1 to 5) {
      val text = Seq.fill(1 + rnd.nextInt(40))(s"w${rnd.nextInt(20)}").mkString(" ")
      val w = 1 + rnd.nextInt(7)
      val docs = Seq((0L, text)).toDF("doc_id", "text")
      val rebuilt = CorpusOps.chunkParagraphs(docs, window = w)
        .orderBy("para_idx").select("para").as[String].collect().mkString(" ")
      assert(rebuilt === text) // concatenating chunks reproduces the token stream
    }
  }

  test("property: hashSplit is a total function with content-determined assignment") {
    val rnd = new Random(105)
    for (_ <- 1 to 3) {
      val docs = (0 until 30).map(i => (i.toLong, randText(rnd) + s" tail${i % 10}"))
        .toDF("doc_id", "text")
      val out = TextOps.hashSplit(docs).collect()
      assert(out.length === 30) // total: every doc assigned
      assert(out.forall(r => Set("train", "val", "test")(r.getAs[String]("split"))))
      val byText = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val splitOf = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
      // same text ⇒ same split, for every colliding pair
      for (a <- byText.keys; b <- byText.keys if a < b && byText(a) == byText(b))
        assert(splitOf(a) === splitOf(b))
    }
  }

  test("property: edit similarity is symmetric, in [0,1], and 1 iff equal") {
    val rnd = new Random(106)
    for (_ <- 1 to 3) {
      val texts = (0 until 6).map(i => (i.toLong, randText(rnd) + " x")).toDF("doc_id", "text")
      val pairs = (for (a <- 0 until 6; b <- 0 until 6 if a < b)
        yield (a.toLong, b.toLong)).toDF("a_id", "b_id")
      val flipped = pairs.select($"b_id".as("a_id"), $"a_id".as("b_id"))
      val f = DedupOps.editDistanceVerify(texts, pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getAs[Long]("edit_dist"), r.getAs[Double]("edit_sim"))).toMap
      val g = DedupOps.editDistanceVerify(texts, flipped).collect()
        .map(r => (r.getLong(1), r.getLong(0)) -> (r.getAs[Long]("edit_dist"), r.getAs[Double]("edit_sim"))).toMap
      assert(f === g) // symmetric
      val t = texts.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for (((a, b), (d, s)) <- f) {
        assert(s >= 0.0 && s <= 1.0)
        assert((d == 0L) === (t(a) == t(b)))
      }
    }
  }

  test("property: orderedSum equals plain sum on exactly-representable values") {
    val rnd = new Random(107)
    for (_ <- 1 to 3) {
      val rows = (0 until 50).map(i => (i % 7, i.toLong, rnd.nextInt(1000).toDouble))
        .toDF("g", "k", "v").repartition(8)
      val a = rows.groupBy($"g")
        .agg(VectorMath.orderedSum($"k", $"v").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val b = rows.groupBy($"g").agg(sum($"v").as("s"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      assert(a === b) // integer-valued doubles: order can't matter
    }
  }

  test("property: upsert ≡ delete + insert (app_callapi.py:140-153)") {
    val rnd = new Random(108)
    for (_ <- 1 to 3) {
      val docs = (0 until 6).map(i =>
        (i.toLong, randText(rnd), "en", s"s${i % 3}", i.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val repl = Seq((99L, "new", "en", "s1", 3L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val up = CorpusOps.upsertSource(docs, "s1", repl)
      val manual = docs.filter($"source" =!= "s1").unionByName(repl)
      assert(up.exceptAll(manual).count() === 0 && manual.exceptAll(up).count() === 0)
    }
  }

  test("property: snapshotDiff classification equals set algebra on random snapshots") {
    val rnd = new Random(106)
    for (_ <- 1 to 5) {
      val oldRows = (0 until 8).map(i => (i.toLong, randText(rnd) + " x")).toMap
      // new snapshot: drop some, mutate some, add some
      val newRows = oldRows.collect {
        case (id, t) if id % 3 != 0 => id -> (if (id % 3 == 1) t + " v2" else t)
      } ++ (10 until 10 + rnd.nextInt(3)).map(i => i.toLong -> randText(rnd))
      val oldDf = oldRows.toSeq.toDF("doc_id", "text")
      val newDf = newRows.toSeq.toDF("doc_id", "text")
      val got = CorpusOps.snapshotDiff(oldDf, newDf).collect()
        .map(x => x.getLong(0) -> x.getString(1)).toMap
      val want =
        (oldRows.keySet -- newRows.keySet).map(_ -> "removed") ++
          (newRows.keySet -- oldRows.keySet).map(_ -> "added") ++
          (oldRows.keySet & newRows.keySet)
            .filter(id => oldRows(id) != newRows(id)).map(_ -> "changed")
      assert(got === want.toMap)
    }
  }

  test("property: packSequences is invariant under input repartitioning") {
    val rnd = new Random(107)
    for (_ <- 1 to 3) {
      val docs = (0 until 12).map(i => (i.toLong, randText(rnd) + " t"))
        .toDF("doc_id", "text")
      val base = TextOps.packSequences(docs, tokenBudget = 5, nStreams = 3)
        .collect().toSet
      val shuffled = TextOps.packSequences(docs.repartition(7), tokenBudget = 5, nStreams = 3)
        .collect().toSet
      assert(base === shuffled)
      // offsets always inside the budget
      assert(base.forall { r =>
        val off = r.getAs[Long]("seq_offset"); off >= 0 && off < 5
      })
    }
  }

  test("property: domainMix keep decision is invariant under repartitioning and rates <= 1") {
    val rnd = new Random(108)
    for (_ <- 1 to 3) {
      val docs = (0 until 20).map(i =>
        (i.toLong, randText(rnd) + s" u$i", if (i % 4 == 0) "de" else "en"))
        .toDF("doc_id", "text", "lang")
      val a = TextOps.domainMix(docs).collect().toSet
      val b = TextOps.domainMix(docs.repartition(5)).collect().toSet
      assert(a === b)
      assert(a.forall(_.getAs[Double]("rate") <= 1.0))
    }
  }

  test("property: CMS estimate >= exact for every key at any width") {
    val rnd = new Random(109)
    for (trial <- 1 to 3) {
      val keys = (0 until 60).map(_ => rnd.nextInt(8).toLong)
      val df = keys.toDF("user_id")
      val width = Seq(1, 4, 4096)(trial - 1)
      val r = SketchOps.countMinHeavyHitters(df, depth = 2, width = width, k = 8).collect()
      assert(r.nonEmpty)
      assert(r.forall(x => x.getAs[Long]("cms_est") >= x.getAs[Long]("exact_cnt")))
      if (width == 4096) // collision-free regime: estimates exact
        assert(r.forall(_.getAs[Long]("overcount") == 0L))
    }
  }

  test("property: Morton interleave is a bijection (decode returns the inputs)") {
    val rnd = new Random(110)
    val pairs = (0 until 30).map(_ => (rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val df = pairs.toDF("a", "b")
    def deinterleave(bits: Int, odd: Boolean) = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftright($"z", 2 * i + (if (odd) 1 else 0)).bitwiseAND(lit(1L)) * lit(1L << i)
    }
    val rt = df
      .withColumn("z", PersistOps.interleaveBits($"a", $"b"))
      .select($"a", $"b", deinterleave(16, odd = true).as("a2"),
        deinterleave(16, odd = false).as("b2"))
      .collect()
    assert(rt.forall(r => r.getLong(0) === r.getLong(2) && r.getLong(1) === r.getLong(3)))
  }

  test("property: prefix filter never misses a pair with Jaccard >= t") {
    val rnd = new Random(111)
    for (_ <- 1 to 3) {
      // overlapping random docs: shared base + per-doc mutations
      val words = Seq("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
      def doc() = Seq.fill(8 + rnd.nextInt(6))(words(rnd.nextInt(words.length))).mkString(" ")
      val base = doc()
      val docs = (0 until 8).map { i =>
        val t = if (i % 2 == 0) base + " " + doc().split(" ").take(3).mkString(" ") else doc()
        (i.toLong, t)
      }.toDF("doc_id", "text")
      val ids = docs.select("doc_id").as[Long].collect().sorted
      val allPairs = (for (a <- ids; b <- ids if a < b) yield (a, b)).toSeq.toDF("a_id", "b_id")
      val truth = DedupOps.jaccardVerify(docs, allPairs, minJaccard = 0.5)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val got = DedupOps.prefixFilterNearDup(docs)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      assert(got === truth) // no false negatives (and verify kills false positives)
    }
  }

  test("property: sessionsOverlap equals the naive theta join on random streams") {
    val rnd = new Random(113)
    for (_ <- 1 to 3) {
      val m = 60L * 1000 * 1000 * 1000 // minute in nanos
      val events = (0 until 60).map { i =>
        (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(600) * m + rnd.nextInt(1000000).toLong)
      }.toDF("event_id", "user_id", "ts")
      val got = RelationalOps.sessionsOverlap(events)
        .select("a_user", "a_session", "b_user", "b_session", "overlap_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val sess = RelationalOps.sessionIntervals(
        events.withColumn("ts", expr("ts div 1000")), gapTicks = 1800L * 1000 * 1000)
      val a = sess.filter($"n_events" >= 3).select($"user_id".as("au"),
        $"session_idx".as("asx"), $"start_ts".as("ast"), $"end_ts".as("aen"))
      val naive = a.crossJoin(sess)
        .filter($"au" =!= $"user_id" && $"ast" <= $"end_ts" && $"start_ts" <= $"aen")
        .select($"au", $"asx", $"user_id", $"session_idx",
          (least($"aen", $"end_ts") - greatest($"ast", $"start_ts")).as("ov"))
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(got === naive)
    }
  }

  test("property: dsirSelect equals the global (weight desc, id) top-quarter") {
    val rnd = new Random(114)
    for (_ <- 1 to 3) {
      val words = Seq("x", "y", "z", "w", "v")
      def doc() = Seq.fill(3 + rnd.nextInt(5))(words(rnd.nextInt(words.length))).mkString(" ")
      val raw = (0 until 10 + rnd.nextInt(6)).map(i => (i.toLong, doc())).toDF("doc_id", "text")
      val target = Seq((99L, doc())).toDF("doc_id", "text")
      val sel = TextOps.dsirSelect(raw, target).select("doc_id").as[Long].collect().toSet
      val w = TextOps.dsirWeights(raw, target).collect()
        .map(r => (r.getLong(0), r.getAs[Double]("dsir_weight")))
      val k = (w.length + 3) / 4
      val topk = w.sortBy { case (id, dw) => (-dw, id) }.take(k).map(_._1).toSet
      assert(sel === topk)
      assert(sel.size === k)
    }
  }

  test("property: charEntropy bounded by ln of the distinct-char count") {
    val rnd = new Random(115)
    val docs = (0 until 12).map { i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(('a' + rnd.nextInt(5)).toChar).mkString)
    }.toDF("doc_id", "text")
    TextOps.charEntropy(docs).collect().foreach { r =>
      val h = r.getAs[Double]("entropy")
      val d = r.getAs[Long]("n_distinct_chars")
      assert(h >= 0.0 && h <= math.log(d.toDouble) + 1e-4,
        s"H=$h outside [0, ln($d)]")
    }
  }

  test("property: star contraction labels a 200-node path in O(log n) rounds") {
    // the worst case for min-label propagation: a path 1-2-…-200 has
    // diameter 199, so label propagation needs ~200 rounds; alternating
    // large/small-star roughly halves every node's distance to the
    // component minimum per round → ~log₂(200) ≈ 8 rounds
    val n = 200
    val pairs = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a_id", "b_id")
    val (comp, rounds) = DedupOps.connectedComponentsWithRounds(pairs)
    val labels = comp.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === n)
    assert(labels.values.forall(_ == 1L), "every path node labels to the min id")
    assert(rounds <= 10, s"path-200 took $rounds rounds; contraction must be O(log n)")
  }

  test("property: connectedComponents equals in-memory union-find on random graphs") {
    val rnd = new Random(116)
    for (_ <- 1 to 3) {
      val n = 12 + rnd.nextInt(8)
      val edges = (0 until n).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (a, b) // self-pairs allowed: node joins output as a singleton
      }
      val got = DedupOps.connectedComponents(edges.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference union-find with min-id representative
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val m = math.min(ra, rb); parent(math.max(ra, rb)) = m }
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      assert(got === want)
    }
  }

  test("property: pageRank conserves total rank mass across rounds") {
    val rnd = new Random(112)
    for (_ <- 1 to 3) {
      val n = 6 + rnd.nextInt(5)
      // random connected-ish graph: a path backbone plus random chords
      val backbone = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong))
      val chords = (0 until n / 2).map { _ =>
        val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)
      val pairs = (backbone ++ chords).distinct.toDF("a_id", "b_id")
      val pr = DedupOps.pageRank(pairs, iters = 3).collect()
        .map(_.getAs[Double]("pagerank"))
      // sum(pr) = 0.15·n + 0.85·sum(prev) stays n to rounding error
      assert(math.abs(pr.sum - pr.length) < 1e-3)
      assert(pr.forall(_ > 0))
    }
  }

  test("property: KMV buffer is a mergeable summary — order/split invariant") {
    import graft.functions.SketchAggregators.{kmvInsert, kmvMerge}
    val rnd = new Random(401)
    def fold(xs: Seq[Long], k: Int) =
      xs.foldLeft(Array.emptyLongArray)((b, v) => kmvInsert(b, v, k))
    for (trial <- 1 to 8) {
      val k = 2 + rnd.nextInt(30)
      val n = rnd.nextInt(400)
      val xs = Seq.fill(n)(rnd.nextLong().abs % 5000L)
      val truth = xs.distinct.sorted.take(k)
      // insert order must not matter
      assert(fold(rnd.shuffle(xs), k).toSeq === truth, s"trial $trial: order")
      // any 3-way split merged in any association must equal the fold
      val (p1, rest) = xs.splitAt(rnd.nextInt(n + 1))
      val (p2, p3) = rest.splitAt(rnd.nextInt(rest.length + 1))
      val (a, b, c) = (fold(p1, k), fold(p2, k), fold(p3, k))
      assert(kmvMerge(kmvMerge(a, b, k), c, k).toSeq === truth, s"trial $trial: assoc-l")
      assert(kmvMerge(a, kmvMerge(b, c, k), k).toSeq === truth, s"trial $trial: assoc-r")
      assert(kmvMerge(b, a, k).toSeq === kmvMerge(a, b, k).toSeq, s"trial $trial: comm")
      // idempotence: re-merging a sketch with itself changes nothing
      assert(kmvMerge(a, a, k).toSeq === a.toSeq, s"trial $trial: idem")
    }
  }

  test("property: wordpiece segmentation reassembles to the word, piece count consistent") {
    val rnd = new Random(107)
    for (trial <- 1 to 3) {
      val alphabet = "abcdexyz"
      val words = (0 until 20).map(_ =>
        (1 to (1 + rnd.nextInt(12))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
      val enc = TextOps.wordpieceEncode(docs, vocabSize = 8, topWords = 1000).collect()
      assert(enc.nonEmpty, s"trial $trial: no output")
      for (r <- enc) {
        val word = r.getString(0)
        val nPieces = r.getLong(2)
        val pieces = r.getString(3)
        // lossless: concatenating the greedy pieces rebuilds the word
        assert(pieces.replace(" ", "") === word,
          s"trial $trial: pieces '$pieces' must reassemble to '$word'")
        assert(pieces.split(" ").length.toLong === nPieces,
          s"trial $trial: n_pieces mismatch for '$word'")
      }
      // every census word is segmented exactly once
      assert(enc.map(_.getString(0)).distinct.length === enc.length)
      assert(enc.map(_.getString(0)).toSet === words.toSet.filter(_.length <= 16))
    }
  }

  test("property: q21 decorrelation equals brute-force EXISTS / NOT EXISTS semantics") {
    val rnd = new Random(112)
    val dayMs = 86400000L
    for (trial <- 1 to 5) {
      val nOrders = 3 + rnd.nextInt(10)
      val orders = (1 to nOrders).map(o => (o.toLong,
        if (rnd.nextBoolean()) "F" else "O",
        java.sql.Timestamp.valueOf(f"1996-01-${1 + rnd.nextInt(28)}%02d 00:00:00")))
      val lines = orders.flatMap { case (o, _, od) =>
        (0 until 1 + rnd.nextInt(4)).map { _ =>
          val supp = 1L + rnd.nextInt(3)
          // +100d / +10d keeps every ship date far from the 60-day cut
          val late = rnd.nextBoolean()
          (o, supp, new java.sql.Timestamp(
            od.getTime + (if (late) 100L else 10L) * dayMs))
        }
      }
      val odate = orders.map(o => o._1 -> o._3.getTime).toMap
      val status = orders.map(o => o._1 -> o._2).toMap
      val lateInc = lines
        .filter { case (o, _, ship) =>
          status(o) == "F" && ship.getTime > odate(o) + 60L * dayMs }
        .map { case (o, s, _) => (o, s) }.distinct
      val kept = lateInc.filter { case (o, s) =>
        lines.exists { case (o2, s2, _) => o2 == o && s2 != s } &&
          !lateInc.exists { case (o2, s2) => o2 == o && s2 != s }
      }
      val expected = kept.groupBy(_._2)
        .map { case (s, xs) => s"S$s" -> xs.size.toLong }
      val supplier = (1L to 3L).map(s => (s, s"S$s", 1L))
        .toDF("s_suppkey", "s_name", "s_nationkey")
      val nation = Seq((1L, "N1")).toDF("n_nationkey", "n_name")
      val res = RelationalOps.q21SuppliersKeptWaiting(supplier,
          orders.toDF("o_orderkey", "o_orderstatus", "o_orderdate"),
          lines.toDF("l_orderkey", "l_suppkey", "l_shipdate"), nation, k = 10)
        .collect()
        .map(x => x.getAs[String]("s_name") -> x.getAs[Long]("numwait")).toMap
      assert(res === expected, s"trial $trial")
    }
  }

  test("property: q13 decorrelation equals the correlated count, zero buckets included") {
    val rnd = new Random(113)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW")
    for (trial <- 1 to 5) {
      val nCust = 2 + rnd.nextInt(8)
      val custs = (1 to nCust).map(_.toLong)
      val orders = (1 to rnd.nextInt(20)).map(o =>
        (o.toLong, custs(rnd.nextInt(nCust)), prios(rnd.nextInt(4))))
      val perCust = custs.map(c =>
        c -> orders.count(x => x._2 == c && x._3 != "1-URGENT").toLong).toMap
      val expected = perCust.values.groupBy(identity)
        .map { case (cnt, xs) => cnt -> xs.size.toLong }
      val res = RelationalOps.q13CustomerDistribution(
          custs.toDF("c_custkey"),
          orders.toDF("o_orderkey", "o_custkey", "o_orderpriority"))
        .collect()
        .map(x => x.getAs[Long]("c_count") -> x.getAs[Long]("custdist")).toMap
      assert(res === expected, s"trial $trial")
    }
  }

  test("property: q17's integer threshold equals the correlated 0.2*avg semantics") {
    val rnd = new Random(114)
    for (trial <- 1 to 5) {
      val nParts = 1 + rnd.nextInt(4)
      val lines = (1 to nParts).flatMap { p =>
        (0 until 1 + rnd.nextInt(8)).map { _ =>
          (p.toLong, (1 + rnd.nextInt(50)).toDouble, (1 + rnd.nextInt(10000)) / 100.0)
        }
      }
      val part = (1 to nParts).map(p => (p.toLong, "Brand#1"))
        .toDF("p_partkey", "p_brand")
      // brute force: qty < 0.2 * part average, exact rational form
      val byPart = lines.groupBy(_._1)
      val expected = byPart.map { case (p, xs) =>
        val qsum = xs.map(_._2.toLong).sum; val cnt = xs.length
        p -> xs.filter(x => 5L * x._2.toLong * cnt < qsum)
      }.values.flatten
      val expCents = expected.map(x => math.round(x._3 * 100)).sum
      val res = RelationalOps.q17SmallQuantityRevenue(
          lines.toDF("l_partkey", "l_quantity", "l_extendedprice"), part,
          brands = Seq("Brand#1")).collect()
      val (n, cents) =
        if (res.isEmpty) (0L, 0L)
        else (res.head.getAs[Long]("n_small"), res.head.getAs[Long]("revenue_cp"))
      assert(n === expected.size.toLong, s"trial $trial count")
      assert(cents === expCents, s"trial $trial revenue")
    }
  }

  test("property: URL canonicalization is idempotent — parsing a canonical returns itself") {
    val rnd = new Random(108)
    for (trial <- 1 to 3) {
      val docs = (0 until 40).map { i =>
        (rnd.nextInt(100000).toLong, "t", Seq("en", "es", "de")(rnd.nextInt(3)))
      }.toDF("doc_id", "text", "lang")
      val first = UrlOps.parseUrls(UrlOps.synthesizeUrls(docs))
        .select($"doc_id", $"canonical").distinct()
      val again = UrlOps.parseUrls(first.select($"doc_id", $"canonical".as("url")))
      val changed = again.filter($"canonical" =!= $"url").count()
      assert(changed === 0L, s"trial $trial: canonicalization must be a fixpoint")
    }
  }

  test("property: softDedupSample census conserves docs and bounds kept") {
    val rnd = new Random(108)
    for (trial <- 1 to 3) {
      // random dup structure: copies of a few base texts + singletons
      val bases = Seq(
        "the quick brown fox jumps over the lazy dog again and again",
        "completely different words about spark query engines at scale ok",
        "a third body of text with its own distinct shingle vocabulary here")
      val docs = (0 until 10).map { i =>
        val t = if (rnd.nextBoolean()) bases(rnd.nextInt(3))
                else s"unique text number $i with filler words ${"pad " * (i + 3)}"
        (i.toLong, t)
      }.toDF("doc_id", "text")
      val rows = DedupOps.softDedupSample(docs).collect()
      val total = rows.map(_.getAs[Long]("n_docs")).sum
      assert(total === 10L, s"trial $trial: every doc lands in exactly one size row")
      rows.foreach { x =>
        assert(x.getAs[Long]("n_docs") ===
          x.getAs[Long]("n_clusters") * x.getAs[Long]("size"))
        assert(x.getAs[Long]("n_kept") >= 0L &&
          x.getAs[Long]("n_kept") <= x.getAs[Long]("n_docs"))
        if (x.getAs[Long]("size") === 1L)
          assert(x.getAs[Long]("n_kept") === x.getAs[Long]("n_docs"),
            "p = 1: singletons always keep")
      }
    }
  }

  test("property: minhashBBit widths score one pair set, errors bounded") {
    val rnd = new Random(109)
    for (trial <- 1 to 3) {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      val docs = (0 until 6).map { i =>
        val t = if (i < 3) base + (" extra" * rnd.nextInt(3))
                else s"unrelated document body $i ${"word " * (i + 5)}"
        (i.toLong, t)
      }.toDF("doc_id", "text")
      val rows = DedupOps.minhashBBit(docs).collect()
      if (rows.nonEmpty) {
        assert(rows.length === 4, s"trial $trial: one row per width")
        assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length === 1)
        rows.foreach { x =>
          // |est - true| <= est range bound: est in [-1, 1] scaled, true in [0,1]
          assert(x.getAs[Long]("mae_micro") >= 0L &&
            x.getAs[Long]("mae_micro") <= 2000000L)
          assert(x.getAs[Long]("storage_bits") === x.getAs[Long]("b_bits") * 12L)
        }
      }
    }
  }
}
