package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed sketch aggregators (SURVEY §2.11 policy #2 — a custom
  * `Aggregator` where the partial state is the whole point).
  *
  * [[kmv]] is the K-Minimum-Values distinct-count sketch (Bar-Yossef
  * et al. 2002; Beyer et al. SIGMOD'07 unbiased estimator): keep the
  * k smallest DISTINCT hash values seen; if fewer than k hashes
  * exist the sketch IS the exact distinct set, otherwise the k-th
  * smallest value U(k) estimates the distinct count as
  * (k−1)·H / U(k) for a hash range [0, H).
  *
  * Scale shape: the buffer is a sorted ≤k-element Long array, so a
  * map task scanning billions of rows ships at most k·8 bytes into
  * the shuffle per group — partial aggregation (map-side combine)
  * applies to `reduce`, executor buffers fold associatively in
  * `merge`, and the result is order-free because min-k of a set is
  * order-free. This is the mergeable-summary contract every
  * distributed sketch needs (same reason `SketchOps.countMinTable`
  * partial-aggregates its cell increments).
  *
  * Determinism: hashes come from [[PortableHash.hash48]] (sha-derived
  * integers), so engine and DuckDB oracle agree bit-for-bit — unlike
  * Spark's own `approx_count_distinct` HLL++, whose estimate a
  * foreign oracle can only bound (see `approx_stats_check`).
  */
object SketchAggregators {

  /** Insert `h` into sorted-distinct `b`, keeping at most `k`
    * smallest. Returns `b` unchanged (no copy) when `h` is already
    * present or too large to matter. */
  private[graft] def kmvInsert(b: Array[Long], h: Long, k: Int): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(b, h)
    if (pos >= 0) b // already in the sketch
    else {
      val ins = -pos - 1
      if (ins >= k) b // larger than the current k-th smallest
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(b, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Merge two sorted-distinct arrays, keeping the k smallest. */
  private[graft] def kmvMerge(x: Array[Long], y: Array[Long], k: Int): Array[Long] = {
    if (y.isEmpty) return x
    if (x.isEmpty) return y
    val out = new Array[Long](math.min(x.length + y.length, k))
    var (i, j, n) = (0, 0, 0)
    while (n < out.length && (i < x.length || j < y.length)) {
      val v =
        if (j >= y.length || (i < x.length && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** KMV sketch over pre-hashed Long inputs: the aggregate value is
    * the sorted array of the ≤k smallest distinct hashes. */
  def kmv(k: Int): Aggregator[Long, Array[Long], Array[Long]] = {
    require(k >= 2, s"kmv needs k >= 2, got $k")
    new Aggregator[Long, Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray
      override def reduce(b: Array[Long], h: Long): Array[Long] = kmvInsert(b, h, k)
      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = kmvMerge(x, y, k)
      override def finish(b: Array[Long]): Array[Long] = b
      override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }
  }

  /** Untyped-DataFrame form: `df.groupBy(...).agg(kmvUdaf(64)(col("h")))`. */
  def kmvUdaf(k: Int): Column => Column = {
    val fn = udaf(kmv(k), ExpressionEncoder[Long]())
    (c: Column) => fn(c)
  }

  // ---- bottom-k (hash, value) pairs: the uniform-sample sketch ----

  /** Lexicographic (h, v) compare over interleaved pairs:
    * b(2i) = hash, b(2i+1) = value. */
  private def pairLt(h1: Long, v1: Long, h2: Long, v2: Long): Boolean =
    h1 < h2 || (h1 == h2 && v1 < v2)

  /** Insert pair (h, v) into interleaved sorted-distinct `b`, keeping
    * at most `k` smallest pairs by (h, v) order. Mirrors [[kmvInsert]]
    * with a value payload riding each hash. */
  private[graft] def pairInsert(b: Array[Long], h: Long, v: Long, k: Int): Array[Long] = {
    val n = b.length / 2
    // binary search over pair slots for the insertion point
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (pairLt(b(2 * mid), b(2 * mid + 1), h, v)) lo = mid + 1 else hi = mid
    }
    if (lo < n && b(2 * lo) == h && b(2 * lo + 1) == v) b // duplicate pair
    else if (lo >= k) b // larger than the current k-th smallest
    else {
      val m = math.min(n + 1, k)
      val out = new Array[Long](2 * m)
      System.arraycopy(b, 0, out, 0, 2 * lo)
      out(2 * lo) = h; out(2 * lo + 1) = v
      System.arraycopy(b, 2 * lo, out, 2 * lo + 2, 2 * (m - lo - 1))
      out
    }
  }

  /** Merge two interleaved sorted-distinct pair arrays, keeping the k
    * smallest pairs. */
  private[graft] def pairMerge(x: Array[Long], y: Array[Long], k: Int): Array[Long] = {
    if (y.isEmpty) return x
    if (x.isEmpty) return y
    val out = new Array[Long](math.min(x.length + y.length, 2 * k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < x.length || j < y.length)) {
      val takeX = j >= y.length ||
        (i < x.length && !pairLt(y(j), y(j + 1), x(i), x(i + 1)))
      val (h, v) = if (takeX) { val p = (x(i), x(i + 1)); i += 2; p }
                   else { val p = (y(j), y(j + 1)); j += 2; p }
      if (n == 0 || out(n - 2) != h || out(n - 1) != v) { out(n) = h; out(n + 1) = v; n += 2 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Bottom-k PAIR sketch: keep the k smallest distinct (hash, value)
    * pairs in (h, v) lexicographic order, interleaved
    * [h0,v0,h1,v1,…]. With a uniform hash over row identity this is a
    * mergeable UNIFORM ROW SAMPLE of the group — the value payload
    * turns the KMV distinct-counter into a quantile/statistics sketch
    * (bottom-k sampling: Cohen & Kaplan, PODS'07). Same scale shape as
    * [[kmv]]: ≤2k Longs per group through the shuffle regardless of
    * input rows; merge is order-free because min-k of a set is
    * order-free; ties on hash (48-bit collisions) stay deterministic
    * because the VALUE breaks the order, not arrival order. */
  def bottomKPairs(k: Int): Aggregator[(Long, Long), Array[Long], Array[Long]] = {
    require(k >= 2, s"bottomKPairs needs k >= 2, got $k")
    new Aggregator[(Long, Long), Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray
      override def reduce(b: Array[Long], p: (Long, Long)): Array[Long] =
        pairInsert(b, p._1, p._2, k)
      override def merge(x: Array[Long], y: Array[Long]): Array[Long] = pairMerge(x, y, k)
      override def finish(b: Array[Long]): Array[Long] = b
      override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }
  }

  /** Untyped form: `agg(bottomKPairsUdaf(128)(col("h"), col("v")))`. */
  def bottomKPairsUdaf(k: Int): (Column, Column) => Column = {
    val fn = udaf(bottomKPairs(k), ExpressionEncoder[(Long, Long)]())
    (h: Column, v: Column) => fn(h, v)
  }
}
