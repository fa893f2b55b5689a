package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around (0,0) and (10,10); labels deliberately
  // WRONG (mixed) so refinement has to fix the seed centroids
  private def emb = Seq(
    (0L, Seq(0.0f, 0.1f), 0), (1L, Seq(0.1f, 0.0f), 1), (2L, Seq(-0.1f, 0.0f), 0),
    (3L, Seq(10.0f, 10.1f), 1), (4L, Seq(10.1f, 9.9f), 0), (5L, Seq(9.9f, 10.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("lloyd iterations converge to the true cluster means") {
    val cent = VectorOps.kmeansCentroids(emb, iters = 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq)
      .toMap
    // the two refined centroids must be near (0,0) and (10,10),
    // regardless of which c_id landed where
    val cs = cent.values.toSeq.sortBy(_.head)
    assert(math.abs(cs.head.head) < 1.0 && math.abs(cs.head(1)) < 1.0)
    assert(math.abs(cs(1).head - 10.0) < 1.0 && math.abs(cs(1)(1) - 10.0) < 1.0)
  }

  test("refined centroids plug into ivfTopK and improve assignment") {
    val refined = VectorOps.kmeansCentroids(emb, iters = 3)
      .select(col("c_id").as("c_label"), col("dim"), col("cv"))
    val r = VectorOps.ivfTopK(emb, emb.filter($"vec_id" === 0), nProbe = 1, k = 2,
      centroids = Some(refined)).orderBy("rank").collect()
    // with refined cells, probing ONE cell finds the true neighbors
    // (1 and 2), which the mixed label-seeded cells cannot guarantee
    assert(r.map(_.getAs[Long]("vec_id")).toSet === Set(1L, 2L))
  }

  test("kmeansCells: first-k deterministic seeds refine to cluster means, ivfTopK shape") {
    // seeds are vec_id 0 (cluster A) and vec_id... k=2 → ids 0,1 both
    // in cluster A; Lloyd must still separate: one centroid captures
    // cluster B once any seed is nearest to it — with both seeds in A,
    // iteration keeps both in A, so use k=4 (ids 0-3 span clusters)
    val cells = VectorOps.kmeansCells(emb, k = 4, iters = 2)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq).toMap
    assert(cells.nonEmpty)
    // at least one cell centroid near each true cluster mean
    assert(cells.values.exists(c => math.abs(c.head) < 1.0 && math.abs(c(1)) < 1.0))
    assert(cells.values.exists(c => math.abs(c.head - 10.0) < 1.0 && math.abs(c(1) - 10.0) < 1.0))
    // output shape plugs straight into ivfTopK
    val r = VectorOps.ivfTopK(emb, emb.filter($"vec_id" === 5), nProbe = 1, k = 2,
      centroids = Some(VectorOps.kmeansCells(emb, 4, 2))).collect()
    assert(r.map(_.getAs[Long]("vec_id")).toSet === Set(3L, 4L))
  }

  test("sqrtCells derives k = ceil(sqrt(N)) from the data and is deterministic") {
    // N=6 → k=3: seeds vec_id 0..2 (all cluster A); Lloyd may keep
    // cells in A, but the OUTPUT CONTRACT is what matters — at most
    // k distinct cells of (c_label, dim, cv), same result every call
    val c1 = VectorOps.sqrtCells(emb, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val c2 = VectorOps.sqrtCells(emb, iters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(c1 === c2)
    assert(c1.map(_._1).size <= 3) // ceil(sqrt(6)) = 3 cells max
    assert(c1.map(_._2) === Set(0L, 1L)) // both dims present
  }

  test("kmeansClusterStats: counts cover the corpus, inertia is exact micros") {
    val stats = VectorOps.kmeansClusterStats(emb, iters = 2).collect()
    // every vector lands in exactly one cell
    assert(stats.map(_.getAs[Long]("n_vecs")).sum === emb.count())
    assert(stats.forall(_.getAs[Double]("inertia") >= 0.0))
    // inertia is a 6dp-quantized value (integer-micros sum underneath)
    assert(stats.forall { r =>
      val v = r.getAs[Double]("inertia") * 1e6
      math.abs(v - math.rint(v)) < 1e-3
    })
    // deterministic across invocations
    val again = VectorOps.kmeansClusterStats(emb, iters = 2).collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ===
      again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet)
  }
}
