package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The integer-micro share-histogram drift recipe, factored once:
  * census a key column into exact `div` micro shares, then L1 two
  * histograms with absent keys reading zero. Consumers:
  * [[graft.ops.DedupOps.lshMaintenancePlan]] (bucket-occupancy drift
  * over capped sizes) and [[graft.ops.CorpusOps.corpusDiff]] (lang /
  * source composition drift). One definition keeps the two drift
  * measurements from diverging when the recipe is next tuned.
  *
  * Determinism: `nb · 10⁶ div nb_tot` is exact integer arithmetic
  * (the lshMaintenancePlan convention — no rounding anywhere); the
  * L1 sum is a Long sum, order-free. */
object ShareCensus {

  /** Micro share per `key` value of `rows`: (key, out). */
  def microShares(rows: DataFrame, key: String, out: String): DataFrame = {
    val c = rows.groupBy(col(key)).agg(count(lit(1)).as("nb"))
    val t = c.agg(sum(col("nb")).as("nb_tot"))
    c.crossJoin(broadcast(t))
      .select(col(key), expr("nb * 1000000 div nb_tot").as(out))
  }

  /** One-row L1 distance `out` between two micro-share histograms
    * `a(key, "a")` and `b(key, "b")`; keys absent on a side count 0. */
  def microShareL1(a: DataFrame, b: DataFrame, key: String, out: String): DataFrame =
    a.join(b, Seq(key), "full")
      .agg(coalesce(sum(abs(coalesce(col("a"), lit(0L)) -
        coalesce(col("b"), lit(0L)))), lit(0L)).as(out))
}
