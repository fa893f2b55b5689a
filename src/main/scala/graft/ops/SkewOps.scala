package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large-large joins — the hand-rolled
  * counterpart to AQE's skew-join splitting, for when a single hot
  * key (the empty document, the default user, the null-ish
  * sentinel) would pin one reducer at 100 TB.
  *
  * Salting: the skewed (probe) side gets a salt in [0, salts) derived
  * from a stable discriminator column, turning one hot key into
  * `salts` sub-keys; the build side is replicated `salts` times so
  * every sub-key still finds its match. Join key becomes
  * (key, salt). Replication cost: build side × salts — use only when
  * the build side is the smaller one and AQE alone doesn't cut it.
  *
  * Determinism: the salt comes from xxhash64(discriminator), not
  * rand(), so retries/speculative tasks and the oracle see the same
  * assignment.
  */
object SkewOps {

  private val SaltCol = "__graft_salt"

  /** The exact salt expression [[saltedEquiJoin]] applies to the
    * skewed side — exposed as the seam tests use to assert the REAL
    * salt spreads a hot key (a test re-deriving its own copy of the
    * expression would stay green if this one regressed to a
    * non-spreading form). */
  def saltOf(discriminator: Column, salts: Int): Column =
    pmod(xxhash64(discriminator), lit(salts))

  /** Inner equi-join of `skewed` and `build` on `key`, with the
    * skewed side salted by `discriminator`. */
  def saltedEquiJoin(skewed: DataFrame, build: DataFrame, key: String,
                     discriminator: String, salts: Int): DataFrame = {
    require(
      !skewed.columns.contains(SaltCol) && !build.columns.contains(SaltCol),
      s"inputs must not already carry a $SaltCol column")
    val salted = skewed.withColumn(SaltCol, saltOf(col(discriminator), salts))
    val replicated = build.withColumn(SaltCol, explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Key-frequency profile — the measurement that decides whether to
    * salt at all: top-n keys by row count with their share. Lazy and
    * single-pass: the share denominator is a window sum over the
    * (small) aggregated key set, not a second scan of the input. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.VectorMath.roundn
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"))
      .withColumn(
        "share",
        roundn(col("n_rows") / sum(col("n_rows")).over(Window.partitionBy()), 6))
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
  }
}
