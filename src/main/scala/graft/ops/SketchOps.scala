package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash

/** Sketch-tier operators beyond Spark's built-ins: a relational
  * count-min sketch (Cormode/Muthukrishnan '05) for heavy-hitter
  * counting. `approx_stats_check` (RelationalOps) covers Spark's own
  * HLL++/quantile sketches, which a DuckDB oracle can only bound with
  * tolerance booleans; the CMS here is built from PORTABLE integer
  * arithmetic (sha-derived bucket hashes + integer counts), so every
  * cell and every estimate is bit-reproducible and the oracle checks
  * exact values, not tolerances.
  *
  * Scale shape — why CMS at 100 TB: the sketch table is depth×width
  * cells regardless of input size. The build is one groupBy over
  * (row, bucket) with map-side partial counts, so each executor sends
  * at most depth·width rows into the shuffle no matter how many
  * billions of events it scanned; the merged sketch fits on a
  * postcard and broadcasts to wherever estimates are probed.
  */
object SketchOps {

  /** CMS bucket for one hash row: sha-derived, row-salted so the
    * depth hash functions are independent. */
  private def cmsBucket(key: Column, row: Int, width: Int): Column =
    PortableHash.bucket(concat(lit(s"cms$row:"), key.cast("string")), width)

  /** Count-min cell counts: (j, bucket, c) — depth·width rows. Each
    * input row contributes one increment per hash row; partial
    * aggregation compresses every map task's contribution to ≤
    * depth·width update rows before the shuffle. */
  def countMinTable(keyed: DataFrame, key: String, depth: Int, width: Int): DataFrame =
    (0 until depth)
      .map(j => keyed.select(lit(j).as("j"), cmsBucket(col(key), j, width).as("bucket")))
      .reduce(_ union _)
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Heavy hitters with CMS verification: the exact top-`k` keys by
    * frequency, each carrying its count-min estimate (the min over
    * the sketch's depth rows — CMS guarantees est ≥ exact, with
    * overcount bounded by collisions at ~N/width per row). The exact
    * side is the verification twin: a drifting sketch shows up as a
    * changed `cms_est`/`overcount`, and `est_ge_exact` pins the
    * one-sided error guarantee into the hash-checked output.
    *
    * All integer arithmetic on portable hashes — deterministic on any
    * engine, any partitioning (integer min/sum are merge-order-free).
    */
  def countMinHeavyHitters(events: DataFrame, key: String = "user_id",
                           depth: Int = 3, width: Int = 64, k: Int = 10): DataFrame = {
    val keyed = events.select(col(key))
    val cms = countMinTable(keyed, key, depth, width)
    val top = keyed
      .groupBy(col(key))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col(key))
      .limit(k)
    val est = (0 until depth)
      .map(j => top.select(col(key), lit(j).as("j"), cmsBucket(col(key), j, width).as("bucket")))
      .reduce(_ union _)
      .join(cms, Seq("j", "bucket"))
      .groupBy(col(key))
      .agg(min(col("c")).as("cms_est"))
    top
      .join(est, key)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("exact_cnt").desc, col(key))).cast("long"))
      .select(col("rank"), col(key), col("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("exact_cnt")).as("overcount"),
        (col("cms_est") >= col("exact_cnt")).as("est_ge_exact"))
  }

  /** CMS error-vs-width curve as a DECLARED receipt — the sketch-tier
    * twin of `ann_recall`'s recall-vs-nProbe curve: for each width
    * (depth fixed), probe EVERY distinct key against a freshly built
    * sketch and report the achieved error profile — key count, max
    * and total overcount, and the one-sided guarantee (est ≥ exact)
    * as a pinned boolean. The curve makes the ε ≈ e/width capacity
    * trade a replayable measurement: a hash change, a width
    * misconfiguration, or a broken merge shows up as a hash mismatch
    * on the error numbers themselves, not a tolerance flake —
    * everything is integer arithmetic on portable hashes.
    *
    * Scale shape: the exact census is the ground-truth cost (same
    * role as ann_recall's brute-force side, bounded by the key
    * domain); each width's sketch build partial-aggregates to
    * depth·width cells per map task; the probe is a census×depth
    * equi-join on (j, bucket). */
  def cmsErrorCurve(events: DataFrame, key: String = "user_id", depth: Int = 3,
                    widths: Seq[Int] = Seq(16, 64, 256)): DataFrame = {
    val keyed = events.select(col(key))
    val census = keyed.groupBy(col(key))
      .agg(count(lit(1)).as("exact_cnt")).localCheckpoint(true)
    widths.map { w =>
      val cms = countMinTable(keyed, key, depth, w)
      (0 until depth)
        .map(j => census.select(col(key), col("exact_cnt"),
          lit(j).as("j"), cmsBucket(col(key), j, w).as("bucket")))
        .reduce(_ union _)
        .join(cms, Seq("j", "bucket"))
        .groupBy(col(key), col("exact_cnt"))
        .agg(min(col("c")).as("est"))
        .agg(
          count(lit(1)).as("n_keys"),
          max(col("est") - col("exact_cnt")).as("max_overcount"),
          sum(col("est") - col("exact_cnt")).cast("long").as("total_overcount"),
          min((col("est") >= col("exact_cnt")).cast("int")).cast("boolean")
            .as("all_ge_exact"))
        .withColumn("width", lit(w.toLong))
        .select(col("width"), col("n_keys"), col("max_overcount"),
          col("total_overcount"), col("all_ge_exact"))
    }.reduce(_ unionByName _)
  }

  /** Poisson(1) inverse-CDF thresholds on the 48-bit uniform hash —
    * exact Long constants shared VERBATIM with the oracle (k = 0..5;
    * the >t(5) tail, ~0.06%, draws 6). */
  private[graft] val PoissonT = Seq(103548857136060L, 207097714272121L,
    258872142840152L, 276130285696162L, 280444821410164L, 281307728552965L)

  /** Deterministic POISSON BOOTSTRAP confidence intervals — the
    * distributed bootstrap (each row's resample-r multiplicity drawn
    * Poisson(1) instead of multinomial, the standard big-data form
    * since exact n-out-of-n resampling needs global coordination):
    * per event type, the mean of `value` with a 95% order-statistic
    * CI over `b` resamples. Every draw derives from the portable
    * 48-bit hash of (resample, event_id) through fixed integer CDF
    * thresholds, and resample means sum in fixed-point micros — so
    * the whole stochastic procedure is bit-reproducible and the
    * oracle pins the CI bounds EXACTLY, the `cms_error_curve`
    * discipline applied to resampling statistics.
    *
    * Scale shape: one b-way row explode with map-side partial aggs
    * onto the bounded (type, resample) key — b× map work, tiny
    * shuffle; order statistics rank b rows per type. At 100 TB the
    * explode factor is the knob (b=40 ⇒ 40× map cost, same one
    * shuffle). */
  def bootstrapCI(events: DataFrame, b: Int = 40): DataFrame = {
    val t = PoissonT
    val base = events
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000000).cast("long").as("v_mu"), col("value"))
      .withColumn("r", explode(sequence(lit(0), lit(b - 1))))
      .withColumn("u", PortableHash.hash48(
        concat(lit("boot:"), col("r"), lit(":"), col("event_id"))))
      .withColumn("w",
        when(col("u") < t(0), 0L).when(col("u") < t(1), 1L)
          .when(col("u") < t(2), 2L).when(col("u") < t(3), 3L)
          .when(col("u") < t(4), 4L).when(col("u") < t(5), 5L).otherwise(6L))
    val means = base
      .groupBy(col("event_type"), col("r"))
      .agg(sum(col("w")).as("sw"), sum(col("w") * col("v_mu")).as("swv"))
      .withColumn("mean_r", graft.functions.VectorMath.roundn(
        col("swv").cast("double") /
          (greatest(col("sw"), lit(1L)).cast("double") * 1000000.0), 6))
    val rk = means.withColumn("rn", row_number().over(
      Window.partitionBy(col("event_type")).orderBy(col("mean_r"), col("r"))))
    val stats = events.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.VectorMath.roundn(avg(col("value")), 6).as("mean_value"))
    stats
      .join(rk.filter(col("rn") === 2)
        .select(col("event_type"), col("mean_r").as("ci_lo")), "event_type")
      .join(rk.filter(col("rn") === b - 1)
        .select(col("event_type"), col("mean_r").as("ci_hi")), "event_type")
  }

  /** KMV distinct-count estimate per event type, verified against the
    * exact count (Beyer et al. SIGMOD'07 unbiased estimator
    * (k−1)·H/U(k) over the 48-bit portable hash range H = 2^48; when
    * the sketch never fills, its size IS the exact distinct count).
    *
    * Scale shape: one groupBy over event_type where BOTH aggregates
    * partial-aggregate map-side — the exact count via count-distinct's
    * two-phase expansion, the sketch via
    * [[graft.functions.SketchAggregators.kmv]]'s ≤k-element
    * mergeable buffer. At 100 TB the exact twin is the expensive half
    * (it shuffles every distinct key); a production pipeline keeps
    * only the sketch column, whose shuffle volume is k·8 bytes per
    * (task × group) regardless of input rows. The estimate itself is
    * pure Long arithmetic ((k−1)·2^48 via 63·2^48 < 2^63, then
    * integer div), so the oracle reproduces it exactly.
    *
    * Estimator variance is ~1/√(k−2) ≈ 13% at k=64 — `rel_err` in the
    * output lets the oracle pin the achieved error, and the spec
    * asserts the theoretical bound on random inputs. */
  def kmvDistinct(events: DataFrame, key: String = "user_id", k: Int = 64): DataFrame = {
    val H = 281474976710656L // 2^48, the PortableHash.hash48 range
    val h = events.select(col("event_type"), col(key),
      PortableHash.hash48(concat(lit("kmv:"), col(key).cast("string"))).as("h"))
    h.groupBy(col("event_type"))
      .agg(
        countDistinct(col(key)).as("n_exact"),
        graft.functions.SketchAggregators.kmvUdaf(k)(col("h")).as("sk"))
      .withColumn("n_kmv",
        // greatest(…, 1): hash48's range includes 0, so the k-th
        // smallest hash can be 0 with probability ~k/2^48 — without
        // the guard that corner divides by zero on both engines
        when(size(col("sk")) < k, size(col("sk")).cast("long"))
          .otherwise(expr(s"(${k - 1}L * ${H}L) div greatest(element_at(sk, $k), 1L)")))
      .withColumn("rel_err",
        graft.functions.VectorMath.roundn(
          abs(col("n_kmv") - col("n_exact")).cast("double") / col("n_exact"), 6))
      .select(col("event_type"), col("n_exact"), col("n_kmv"), col("rel_err"))
  }
}
