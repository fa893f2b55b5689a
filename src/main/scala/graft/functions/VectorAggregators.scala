package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A1 (vector mean-pool) in its TYPED form — the
  * `Aggregator[IN, BUF, OUT]` shape SURVEY §2.11 policy #2 reserves
  * for vector aggregation (reference app.py:66
  * `last_hidden_state.mean(dim=1)`).
  *
  * Complementary to [[graft.ops.VectorOps.meanPoolByLabel]] (the
  * exploded relational form, which stays the oracle-checked declared
  * surface): this form keeps vectors WHOLE through the aggregation —
  * the group's partial state is ONE (sums, count) buffer instead of
  * `dims` exploded rows, so the shuffle carries k·1 buffers rather
  * than k·dims rows. The right shape when dims is large and groups
  * are few; partial aggregation (map-side combine) applies to
  * `reduce`, and `merge` combines executor-local buffers.
  */
object VectorAggregators {

  type MeanBuf = (Array[Double], Long)

  val meanPool: Aggregator[Array[Float], MeanBuf, Array[Float]] =
    new Aggregator[Array[Float], MeanBuf, Array[Float]] {
      override def zero: MeanBuf = (Array.emptyDoubleArray, 0L)

      // grow-to-max accumulation: ragged inputs pad with implicit
      // zeros instead of silently truncating to the first-seen
      // length (which would make results depend on encounter order)
      private def addInto(sums: Array[Double], v: Array[Double]): Array[Double] = {
        val acc = if (v.length > sums.length) java.util.Arrays.copyOf(sums, v.length)
                  else sums
        var i = 0
        while (i < v.length) { acc(i) += v(i); i += 1 }
        acc
      }

      // null/empty vectors contribute NOTHING and are not counted —
      // the same semantics as the relational explode/avg form, where
      // a row with no dims never reaches the aggregate.
      // RAGGED inputs (unequal non-zero lengths) are where the two
      // forms deliberately DIVERGE: here every dim divides by the
      // TOTAL vector count (short vectors contribute implicit zeros),
      // while the exploded form averages each dim over only the
      // vectors that carry it. Zero-padding is the token-pooling
      // semantics (a padded position is a zero contribution, the
      // reference's mean(dim=1) over a padded batch); per-dim counts
      // would silently up-weight dims that few vectors have. Equal-
      // length inputs — every real embedding corpus — agree exactly.
      override def reduce(b: MeanBuf, a: Array[Float]): MeanBuf =
        if (a == null || a.isEmpty) b
        else (addInto(b._1, a.map(_.toDouble)), b._2 + 1)

      override def merge(x: MeanBuf, y: MeanBuf): MeanBuf =
        if (y._2 == 0L) x
        else if (x._2 == 0L) y
        else (addInto(x._1, y._1), x._2 + y._2)

      override def finish(b: MeanBuf): Array[Float] =
        if (b._2 == 0L) Array.emptyFloatArray
        else b._1.map(s => (s / b._2).toFloat)

      override def bufferEncoder: Encoder[MeanBuf] = ExpressionEncoder[MeanBuf]()
      override def outputEncoder: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
    }

  /** Untyped-DataFrame form: `df.groupBy("label").agg(meanPoolUdaf(col("embedding")))`. */
  def meanPoolUdaf: Column => Column = {
    val fn = udaf(meanPool, ExpressionEncoder[Array[Float]]())
    (c: Column) => fn(c)
  }

  /** Exact Long outer-product sum: folds each row's centered
    * integer-micro vector x into a d²-cell buffer as
    * buf[i·d + j] += x(i)·x(j) — the covariance numerator of
    * [[graft.ops.VectorOps.embeddingPca]] WITHOUT materializing the
    * d² products as rows. The explode+hash-agg form generated n·d²
    * (200 M at sf0.1) struct rows just to reduce them onto 4096
    * keys (3.0 s measured); this buffer does the same multiply-adds
    * in place — partial aggregation ships one 4096-long buffer per
    * task. Exact Long arithmetic ⇒ order-free, bit-identical to the
    * exploded sum (parity spec-pinned). Ragged inputs pad to the
    * longest seen (implicit zero products), mirroring [[meanPool]]'s
    * grow-to-max stance. */
  val outerProductSum: Aggregator[Array[Long], Array[Long], Array[Long]] =
    new Aggregator[Array[Long], Array[Long], Array[Long]] {
      override def zero: Array[Long] = Array.emptyLongArray

      private def grown(buf: Array[Long], cells: Int): Array[Long] =
        if (buf.length >= cells) buf else java.util.Arrays.copyOf(buf, cells)

      override def reduce(b: Array[Long], x: Array[Long]): Array[Long] =
        if (x == null || x.isEmpty) b
        else {
          val d = x.length
          val acc = grown(b, d * d)
          // a buffer grown from a shorter d is re-indexed on the
          // LONGEST d seen; mixed-length inputs would interleave —
          // real embedding corpora are fixed-length, and the parity
          // spec runs on fixed-length input (same caveat as meanPool)
          var i = 0
          while (i < d) {
            val xi = x(i); val off = i * d; var j = 0
            while (j < d) { acc(off + j) += xi * x(j); j += 1 }
            i += 1
          }
          acc
        }

      override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
        if (b.isEmpty) a
        else if (a.isEmpty) b
        else {
          val acc = grown(a, b.length)
          var i = 0
          while (i < b.length) { acc(i) += b(i); i += 1 }
          acc
        }

      override def finish(b: Array[Long]): Array[Long] = b
      override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
      override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    }

  /** Untyped form: `df.agg(outerProductSumUdaf(col("dx6")))`. */
  def outerProductSumUdaf: Column => Column = {
    val fn = udaf(outerProductSum, ExpressionEncoder[Array[Long]]())
    (c: Column) => fn(c)
  }
}
