package graft.functions

import graft.SparkSpec
import graft.ops.VectorOps
import org.apache.spark.sql.functions._

class VectorAggregatorsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Seq(1.0f, 2.0f, 3.0f), 0),
    (1L, Seq(3.0f, 2.0f, 1.0f), 0),
    (2L, Seq(10.0f, 0.0f, -2.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("typed mean-pool aggregator matches the relational explode/avg form") {
    val typed = emb.groupBy($"label")
      .agg(VectorAggregators.meanPoolUdaf($"embedding").as("centroid"))
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    assert(typed(0) === Seq(2.0f, 2.0f, 2.0f))
    assert(typed(1) === Seq(10.0f, 0.0f, -2.0f))
    // parity with the declared relational form, per (label, dim)
    val relational = VectorOps.meanPoolByLabel(emb).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for ((label, vec) <- typed; (v, dim) <- vec.zipWithIndex)
      assert(math.abs(relational((label, dim.toLong)) - v) < 1e-6)
  }

  test("empty vectors are uncounted and ragged vectors zero-pad, independent of partitioning") {
    val rows = Seq(
      (0L, Seq.empty[Float], 0),
      (1L, Seq(2.0f), 0),
      (2L, Seq(4.0f, 6.0f), 0) // longer than the first non-empty
    ).toDF("vec_id", "embedding", "label")
    for (parts <- Seq(1, 3)) {
      val out = rows.repartition(parts).groupBy($"label")
        .agg(VectorAggregators.meanPoolUdaf($"embedding").as("centroid"))
        .collect().head.getSeq[Float](1)
      // 2 counted rows; dim0 = (2+4)/2, dim1 = (0+6)/2 — same under
      // any partitioning (merge must not drop counts or truncate)
      assert(out === Seq(3.0f, 3.0f), s"parts=$parts")
    }
  }

  test("mean-pool aggregator survives repartitioned input (merge path) and empty groups") {
    val wide = (0 until 100).map(i => (i.toLong, Seq(i.toFloat, (i % 10).toFloat), i % 3))
      .toDF("vec_id", "embedding", "label").repartition(16)
    val out = wide.groupBy($"label")
      .agg(VectorAggregators.meanPoolUdaf($"embedding").as("centroid"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
    // label 0: vec_ids 0,3,...,99 → mean of arithmetic sequence
    val ids0 = (0 until 100).filter(_ % 3 == 0)
    assert(math.abs(out(0).head - ids0.sum.toFloat / ids0.size) < 1e-4)
    assert(out.keySet === Set(0, 1, 2))
  }

  test("outer-product sum equals the exploded form bit-for-bit across partitionings") {
    import org.apache.spark.sql.functions._
    val d = 5
    val rows = (0 until 200).map { i =>
      (0 until d).map(j => ((i * 31 + j * 17) % 101 - 50).toLong).toArray
    }
    val expected = Array.ofDim[Long](d * d)
    rows.foreach { x =>
      for (i <- 0 until d; j <- 0 until d) expected(i * d + j) += x(i) * x(j)
    }
    Seq(1, 7, 32).foreach { parts =>
      val got = rows.toDF("dx6").repartition(parts)
        .agg(VectorAggregators.outerProductSumUdaf($"dx6").as("cells"))
        .collect()(0).getSeq[Long](0).toArray
      assert(got.toSeq === expected.toSeq, s"parity failed at $parts partitions")
    }
    // empty input → empty buffer (no rows downstream)
    val empty = Seq.empty[Array[Long]].toDF("dx6")
      .agg(VectorAggregators.outerProductSumUdaf($"dx6").as("cells"))
      .collect()(0).getSeq[Long](0)
    assert(empty.isEmpty)
  }
}
