package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  private def keyed(counts: Map[Long, Int]) =
    counts.toSeq.flatMap { case (u, n) => Seq.fill(n)(u) }
      .toDF("user_id")

  test("countMinTable: at most depth×width cells; total mass = depth × rows") {
    val df = keyed(Map(1L -> 5, 2L -> 3, 3L -> 2))
    val cells = SketchOps.countMinTable(df, "user_id", depth = 3, width = 8).collect()
    assert(cells.length <= 3 * 8)
    assert(cells.map(_.getAs[Long]("c")).sum === 3L * 10)
  }

  test("bootstrapCI: constant values give a degenerate CI; varied values bracket the mean") {
    val const = (1L to 50L).map(i => (i, 10L, i, "a", 7.5, "{}"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val c = SketchOps.bootstrapCI(const).collect().head
    // every resample of a constant sample has the same mean
    assert(c.getDouble(2) === 7.5 && c.getDouble(3) === 7.5 && c.getDouble(4) === 7.5)
    val rnd = new scala.util.Random(23)
    val varied = (1L to 400L).map(i => (i, 10L, i, "b", 10.0 + rnd.nextInt(100), "{}"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val v = SketchOps.bootstrapCI(varied).collect().head
    val (mean, lo, hi) = (v.getDouble(2), v.getDouble(3), v.getDouble(4))
    assert(lo < hi, "varied sample must produce a non-degenerate interval")
    assert(lo <= mean && mean <= hi, "95% order-statistic CI must bracket the sample mean")
    // CI width should be a few standard errors, not the data range
    assert(hi - lo < 20.0)
  }

  test("cmsErrorCurve: one-sided guarantee at every width; error shrinks as width grows") {
    val rnd = new scala.util.Random(17)
    val df = keyed((1L to 120L).map(u => u -> (1 + rnd.nextInt(20))).toMap)
    val r = SketchOps.cmsErrorCurve(df, widths = Seq(4, 32, 1024)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getBoolean(4)))).toMap
    assert(r.keySet === Set(4L, 32L, 1024L))
    // every key probed at every width, guarantee holds everywhere
    assert(r.values.forall { case (n, _, _, ge) => n == 120L && ge })
    // total overcount must strictly shrink from the collision-heavy
    // width to the collision-free one (1024 buckets, 120 keys, 3 rows
    // → expect zero or near-zero overcount)
    val (_, _, t4, _) = r(4L); val (_, _, t32, _) = r(32L); val (_, _, t1024, _) = r(1024L)
    assert(t4 > t32 && t32 >= t1024)
    assert(r(1024L)._2 === 0L, "collision-free width must report zero max overcount")
  }

  test("heavy hitters: one-sided guarantee est ≥ exact; wide sketch is collision-free") {
    val df = keyed(Map(1L -> 50, 2L -> 30, 3L -> 10, 4L -> 5, 5L -> 5))
    val r = SketchOps.countMinHeavyHitters(df, depth = 3, width = 4096, k = 5).collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
    assert(r.forall(_.getAs[Boolean]("est_ge_exact")))
    // 5 keys into 3×4096 buckets: no collisions → exact estimates
    assert(r.forall(x => x.getAs[Long]("overcount") === 0L))
    assert(r.map(_.getAs[Long]("rank")).toSeq === (1L to 5L))
  }

  test("heavy hitters: width 1 collapses every estimate to the stream length") {
    val df = keyed(Map(1L -> 7, 2L -> 3))
    val r = SketchOps.countMinHeavyHitters(df, depth = 2, width = 1, k = 2).collect()
    assert(r.forall(x => x.getAs[Long]("cms_est") === 10L))
    assert(r.forall(_.getAs[Boolean]("est_ge_exact")))
  }

  import graft.functions.SketchAggregators.{kmvInsert, kmvMerge}

  test("kmv buffer ops: sorted-distinct take-k, any insert/merge order") {
    val rnd = new scala.util.Random(7)
    val vals = Seq.fill(500)(rnd.nextLong().abs % 100000L)
    val k = 16
    val expect = vals.distinct.sorted.take(k)
    // sequential insert
    val seqBuf = vals.foldLeft(Array.emptyLongArray)((b, v) => kmvInsert(b, v, k))
    assert(seqBuf.toSeq === expect)
    // arbitrary two-way split, merged
    val (a, b) = vals.splitAt(137)
    val m = kmvMerge(
      a.foldLeft(Array.emptyLongArray)((x, v) => kmvInsert(x, v, k)),
      b.foldLeft(Array.emptyLongArray)((x, v) => kmvInsert(x, v, k)), k)
    assert(m.toSeq === expect)
    // duplicates never inflate the sketch
    val dup = kmvInsert(seqBuf, expect.head, k)
    assert(dup.toSeq === expect)
  }

  import graft.functions.SketchAggregators.{pairInsert, pairMerge}

  test("bottom-k pair buffer ops: sorted-distinct take-k pairs, any insert/merge order") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(400)((rnd.nextLong().abs % 5000L, rnd.nextLong().abs % 100L))
    val k = 12
    val expect = pairs.distinct.sorted.take(k)
    def ins(b: Array[Long], p: (Long, Long)) = pairInsert(b, p._1, p._2, k)
    val seqBuf = pairs.foldLeft(Array.emptyLongArray)(ins)
    assert(seqBuf.grouped(2).map(a => (a(0), a(1))).toSeq === expect)
    // arbitrary split, merged — same k smallest pairs
    val (a, b) = pairs.splitAt(251)
    val m = pairMerge(
      a.foldLeft(Array.emptyLongArray)(ins),
      b.foldLeft(Array.emptyLongArray)(ins), k)
    assert(m.grouped(2).map(x => (x(0), x(1))).toSeq === expect)
    // hash ties break on VALUE, not arrival order
    val t1 = ins(ins(Array.emptyLongArray, (7L, 9L)), (7L, 2L))
    val t2 = ins(ins(Array.emptyLongArray, (7L, 2L)), (7L, 9L))
    assert(t1.toSeq === Seq(7L, 2L, 7L, 9L) && t2.toSeq === t1.toSeq)
    // duplicate pairs never inflate the sketch
    assert(ins(seqBuf, expect.head).toSeq === seqBuf.toSeq)
  }

  private def valuedEvents(n: Int, seed: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, 1L, i.toLong, "t", rnd.nextGaussian() * 10, "{}"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
  }

  test("quantileSketch: under-filled sketch reproduces exact percentiles; filled sketch within DKW bound") {
    // 60 rows < k=128 ⇒ the sample IS the population ⇒ zero error
    val small = SketchOps.quantileSketch(valuedEvents(60, 3)).collect()
    assert(small.length === 4)
    assert(small.forall(_.getAs[Double]("abs_err") === 0.0))
    assert(small.forall(r => r.getAs[Long]("n_sample") === 60L))
    // 4000 rows, k=128: DKW rank error ε ≈ √(ln(2/δ)/2k) ≈ 0.17 at
    // δ=0.01 — value error bounded via the quantile spacing; assert
    // the observed rank-space error generously (4σ-ish)
    val big = SketchOps.quantileSketch(valuedEvents(4000, 5)).collect()
    assert(big.forall(r => r.getAs[Long]("n_sample") === 128L))
    // N(0,10): p25↔p75 span ≈ 13.5; a 0.2-rank-error estimate stays
    // within a few value units of exact
    assert(big.forall(_.getAs[Double]("abs_err") < 6.0),
      big.map(r => (r.getAs[Long]("pct"), r.getAs[Double]("abs_err"))).mkString(","))
  }

  test("quantileErrorCurve: error shrinks as the sample budget grows") {
    val events = valuedEvents(4000, 7)
    val r = SketchOps.quantileErrorCurve(events, ks = Seq(8, 64, 512)).collect()
      .map(x => x.getAs[Long]("k") ->
        ((x.getAs[Long]("n_cells"), x.getAs[Double]("avg_abs_err")))).toMap
    assert(r.keySet === Set(8L, 64L, 512L))
    assert(r.values.forall(_._1 == 4L)) // 1 type × 4 pcts at every k
    // avg error must drop substantially from the 8-row sample to the
    // 512-row sample (σ ∝ 1/√k — expect ~8× shrink, assert 2×)
    assert(r(8L)._2 > 2 * r(512L)._2,
      s"k=8 err ${r(8L)._2} should dominate k=512 err ${r(512L)._2}")
  }

  test("bloomFprCurve: no false negatives, FPR shrinks with width and tracks theory") {
    val ev = (1L to 120L).map(u => (u, u, u, "a", 1.0, "{}"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = SketchOps.bloomFprCurve(ev, ms = Seq(128, 1024, 8192), nProbe = 500)
      .collect().map(x => x.getAs[Long]("m_bits") ->
        ((x.getAs[Double]("fpr"), x.getAs[Double]("theory_fpr")))).toMap
    // monotone: more bits, fewer false positives
    assert(r(128L)._1 >= r(1024L)._1 && r(1024L)._1 >= r(8192L)._1)
    // measured within a few points of theory at each width
    r.foreach { case (m, (fpr, th)) =>
      assert(math.abs(fpr - th) < 0.08, s"m=$m fpr=$fpr theory=$th")
    }
    // NO FALSE NEGATIVES: every inserted key must re-probe positive.
    // Rebuild the m=1024 bit set and probe the inserted keys.
    import graft.functions.PortableHash
    val keys = ev.select(col("user_id").cast("string").as("key")).distinct()
    val bits = (0 until 3).map(j => keys.select(
        PortableHash.bucket(concat(lit(s"bf$j:"), col("key")), 1024).as("pos")))
      .reduce(_ union _).distinct()
    val selfHits = (0 until 3).map(j => keys.select(col("key"), lit(j).as("j"),
        PortableHash.bucket(concat(lit(s"bf$j:"), col("key")), 1024).as("pos")))
      .reduce(_ union _)
      .join(bits, "pos").groupBy("key").agg(countDistinct("j").as("nh"))
      .filter(col("nh") === 3).count()
    assert(selfHits === 120L, "a Bloom filter must never miss an inserted key")
  }

  test("joinSizeSketch: wide sketch estimates the join size exactly; guarantee is one-sided") {
    import spark.implicits._
    val customer = (1L to 20L).map(k => (k, s"c$k", 0L, 0.0, "m"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    // orders: customer k gets k orders → join size = Σk = 210
    val orders = (1L to 20L).flatMap(k => (1L to k).map(i =>
        (k * 100 + i, k, "O", 1.0, "1996-01-01", "p")))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val lineitem = orders.select(col("o_orderkey").as("l_orderkey"))
      .withColumn("l_partkey", lit(1L)).withColumn("l_suppkey", lit(1L))
      .withColumn("l_linenumber", lit(1L)).withColumn("l_quantity", lit(1.0))
      .withColumn("l_extendedprice", lit(1.0)).withColumn("l_discount", lit(0.0))
      .withColumn("l_tax", lit(0.0)).withColumn("l_returnflag", lit("N"))
      .withColumn("l_linestatus", lit("O")).withColumn("l_shipdate", lit("1996-01-02"))
    val r = SketchOps.joinSizeSketch(customer, orders, lineitem, depth = 3, width = 4096)
      .collect().map(x => x.getAs[String]("join_name") ->
        ((x.getAs[Long]("exact_size"), x.getAs[Long]("cms_est"),
          x.getAs[Boolean]("est_ge_exact")))).toMap
    assert(r("orders_customer")._1 === 210L)
    // 20 + 210 keys into 3×4096 buckets: collision-free → exact
    assert(r("orders_customer")._2 === 210L)
    assert(r.values.forall(_._3), "CMS inner product must never underestimate")
    assert(r("lineitem_orders")._1 === 210L) // 1 lineitem per order
  }

  test("kmvUnionReceipt: day-sketch union equals the whole-period sketch, filled or not") {
    val day = 86400L * 1000 * 1000 * 1000
    val rnd = new scala.util.Random(31)
    // type 'a': 30 users spread over 3 days with overlap (< k ⇒ exact);
    // type 'b': 500 users over 4 days (fills the k=64 sketch)
    val rows =
      (1 to 60).map { i => (i.toLong, (i % 30).toLong + 1, (i % 3) * day + i, "a", 1.0, "{}") } ++
      (1 to 900).map { i =>
        (1000L + i, 100L + rnd.nextInt(500), (i % 4) * day + i, "b", 1.0, "{}")
      }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = SketchOps.kmvUnionReceipt(ev).collect()
      .map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_days"), x.getAs[Long]("size_merged"),
          x.getAs[Boolean]("merged_eq_whole"), x.getAs[Long]("n_kmv")))).toMap
    assert(r("a")._1 === 3L && r("b")._1 === 4L)
    assert(r.values.forall(_._3), "merge-of-partials must equal sketch-of-union")
    assert(r("a")._2 === 30L && r("a")._4 === 30L, "under-filled union stays exact")
    assert(r("b")._2 === 64L)
  }

  test("kmv distinct: under-filled sketch is exact; filled sketch is within bound") {
    // 40 distinct users of type 'a' (< k=64 → exact); 3000 of type 'b'
    val rows =
      (1L to 40L).map(u => ("a", u)) ++ (1L to 3000L).map(u => ("b", u))
    val df = rows.toDF("event_type", "user_id")
    val r = SketchOps.kmvDistinct(df, "user_id", k = 64)
      .collect().map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("n_exact"), x.getAs[Long]("n_kmv"))).toMap
    assert(r("a") === ((40L, 40L))) // sketch never filled ⇒ exact
    val (exact, est) = r("b")
    assert(exact === 3000L)
    // KMV σ ≈ 1/√(k−2) ≈ 12.7%; allow 4σ
    assert(math.abs(est - 3000.0) / 3000.0 < 0.51, s"estimate $est too far")
  }

  test("kmvIntersect: under-filled sketches are exact; filled estimate within bound") {
    // overlap of 'view' users {1..200} and 'purchase' users {101..300}
    // = 100; both sides exceed k=64 so theta-estimation engages
    val rows = (1L to 200L).map(u => (u, u, u, "view", 0.0, "{}")) ++
      (101L to 300L).map(u => (u + 1000, u, u, "purchase", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = SketchOps.kmvIntersect(ev).collect()(0)
    assert(r.getAs[Long]("n_exact_inter") === 100L)
    val est = r.getAs[Long]("n_inter_est")
    assert(math.abs(est - 100.0) / 100.0 < 0.6, s"estimate $est too far from 100")
    // tiny sets: sketches under-filled ⇒ theta = 2^48 ⇒ exact
    val small = (1L to 10L).map(u => (u, u, u, "view", 0.0, "{}")) ++
      (6L to 15L).map(u => (u + 100, u, u, "purchase", 0.0, "{}"))
    val r2 = SketchOps.kmvIntersect(
      small.toDF("event_id", "user_id", "ts", "event_type", "value", "props"))
      .collect()(0)
    assert(r2.getAs[Long]("theta") === 281474976710656L)
    assert(r2.getAs[Long]("n_inter_est") === 5L)
    assert(r2.getAs[Double]("rel_err") === 0.0)
  }

  test("hllErrorCurve: more registers give a tighter estimate; registers stay bounded") {
    val rows = (1L to 5000L).map(u => (u, u, u, "a", 0.0, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = SketchOps.hllErrorCurve(ev).collect()
      .map(x => x.getAs[Long]("m_regs") -> x).toMap
    assert(r.keySet === Set(16L, 64L, 256L))
    r.foreach { case (m, x) => assert(x.getAs[Long]("n_regs") <= m) }
    // 4 sigma envelopes: 1.04/sqrt(m)
    assert(r(256L).getAs[Double]("rel_err") < 4 * 1.04 / 16)
    assert(r(256L).getAs[Double]("rel_err") < r(16L).getAs[Double]("rel_err") + 0.1,
      "the wide sketch must not be meaningfully worse than the narrow one")
  }

  test("bloomJoin: prunes non-matching probes, never drops a join row") {
    // 100 customers, 10 in the target segment; 500 orders spread
    // uniformly — ~90% of probe rows should fail the filter
    val cust = (1L to 100L)
      .map(c => (c, if (c <= 10) "BUILDING" else "OTHER"))
      .toDF("c_custkey", "c_mktsegment")
    val ords = (1L to 500L).map(o => (o, o % 100 + 1)).toDF("o_orderkey", "o_custkey")
    val r = SketchOps.bloomJoin(ords, cust).collect()(0)
    assert(r.getAs[Boolean]("join_unchanged"), "Bloom must not drop join rows")
    assert(r.getAs[Long]("n_build_keys") === 10L)
    assert(r.getAs[Long]("n_join_rows") === 50L) // 5 orders per custkey
    // every true match passes; false positives only ever ADD rows
    assert(r.getAs[Long]("n_pass") >= 50L)
    assert(r.getAs[Double]("pass_frac") < 0.3, s"filter too weak: $r")
  }

  test("rangeBoundaries: partitions cover all rows, respect value order, stay balanced") {
    // uniform values 1..4000 → 8 sample-planned ranges should be
    // roughly even and strictly ordered
    val rows = (1L to 4000L).map(i => (i, 1L, i, "a", i.toDouble, "{}"))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
    val r = SketchOps.rangeBoundaries(ev, nParts = 8, k = 256)
      .collect().sortBy(_.getAs[Long]("part_idx"))
    assert(r.map(_.getAs[Long]("part_idx")).toSeq === (0L to 7L))
    assert(r.map(_.getAs[Long]("n_rows")).sum === 4000L)
    // ranges are disjoint and ordered: each partition's min exceeds
    // the previous partition's max
    r.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("max_v") < b.getAs[Double]("min_v"))
    }
    // sample-planned balance: every partition within 2× of even
    r.foreach(x => assert(x.getAs[Double]("balance") < 2.0 &&
      x.getAs[Double]("balance") > 0.3, s"unbalanced: $x"))
  }

  test("hll distinct: small cardinality exact-ish via linear counting, large within bound") {
    val rows =
      (1L to 30L).map(u => ("a", u)) ++ (1L to 4000L).map(u => ("b", u))
    val df = rows.toDF("event_type", "user_id")
    val r = SketchOps.hllDistinct(df, "user_id")
      .collect().map(x => x.getAs[String]("event_type") ->
        ((x.getAs[Long]("n_exact"), x.getAs[Long]("n_regs"),
          x.getAs[Double]("n_hll")))).toMap
    val (exA, regsA, estA) = r("a")
    assert(exA === 30L && regsA <= 64L)
    // linear-counting regime: 64·ln(64/v0) is tight at n ≪ m
    assert(math.abs(estA - 30.0) / 30.0 < 0.35, s"small-n estimate $estA")
    val (exB, regsB, estB) = r("b")
    assert(exB === 4000L && regsB <= 64L)
    // HLL σ ≈ 1.04/√64 ≈ 13%; allow 4σ
    assert(math.abs(estB - 4000.0) / 4000.0 < 0.52, s"estimate $estB too far")
  }

  test("hll union receipt: day-partial max-merge equals whole-stream registers") {
    val day = 86400L * 1000 * 1000 * 1000
    // users spread over 5 days, with overlap across days
    val rows = (0 until 5).flatMap(d =>
      (1L to 200L).map(u => (d * 40 + u, 1L, d * day + u, "a", 1.0, "{}")))
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("user_id", col("event_id") % 300) // cross-day repeats
    val r = SketchOps.hllUnionReceipt(ev, "user_id").collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Boolean]("merged_eq_whole"),
        "register-wise max merge must equal the one-pass registers")
      assert(x.getAs[Long]("n_regs_merged") <= 64L)
      assert(x.getAs[Long]("n_days") === 5L)
    }
  }
}
