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
}
