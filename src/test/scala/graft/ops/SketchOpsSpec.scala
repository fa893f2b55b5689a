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
}
