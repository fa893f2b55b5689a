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
    * salt at all: top-n keys by row count with their share. The share
    * denominator is a 1-row scalar aggregate over the (already
    * aggregated) key counts, broadcast back in — NOT a global window,
    * whose single-partition sort would serialize the whole key set
    * through one task at billion-key scale. Top-n compiles to
    * TakeOrderedAndProject; tie-break (n_rows desc, key asc) is
    * deterministic on both engines. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import graft.functions.VectorMath.roundn
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum(col("n_rows")).as("_total"))
    counts
      .crossJoin(broadcast(total))
      .withColumn("share", roundn(col("n_rows") / col("_total"), 6))
      .drop("_total")
      .orderBy(col("n_rows").desc, col(key))
      .limit(topN)
  }
}
