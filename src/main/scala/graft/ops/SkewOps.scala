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

  /** The three-strategy skew-join receipt — pins that every join
    * strategy the engine would pick under skew agrees bit-for-bit on
    * the same fact⋈dim aggregate:
    *
    *   - `shuffle`: the plain shuffled equi-join (`shuffle_hash`
    *     hint), i.e. the leg AQE's OptimizeSkewedJoin splits at
    *     runtime when a reducer partition outgrows the skew
    *     threshold — the zero-code modern default;
    *   - `broadcast`: the map-side join when the dim fits in memory;
    *   - `salted`: [[saltedEquiJoin]] — the MANUAL fallback that
    *     still matters at 100 TB exactly where the other two fail
    *     together: the build side too big to broadcast AND the hot
    *     key so dominant that even AQE's split leaves every sub-split
    *     of it joining the same dim row on one upstream exchange.
    *
    * Each leg aggregates to exact integers (row count + cents as
    * decimal(38,0)→long), then compares against the broadcast truth —
    * a strategy-dependent result would flip `agrees` and hash-fail.
    * SkewOpsSpec additionally drives the shuffle leg under lowered
    * AQE thresholds on a planted hot key and asserts the executed
    * plan really contains the skew-split AQEShuffleRead. */
  def skewJoinReceipt(lineitem: DataFrame, part: DataFrame,
                      salts: Int = 8): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val li = lineitem.select(
      col("l_partkey").as("p_partkey"),
      round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
    val pt = part.select(col("p_partkey"))
    def summarize(j: DataFrame, m: String): DataFrame = j
      .agg(count(lit(1)).as("n_rows"),
        sum(col("cents").cast(dec)).cast("long").as("revenue_cents"))
      .select(lit(m).as("method"), col("n_rows"), col("revenue_cents"))
    val legs = Seq(
      summarize(li.join(pt.hint("shuffle_hash"), "p_partkey"), "shuffle"),
      summarize(li.join(broadcast(pt), "p_partkey"), "broadcast"),
      summarize(saltedEquiJoin(li, pt, "p_partkey", "cents", salts), "salted"))
      .reduce(_ unionByName _)
    val truth = summarize(li.join(broadcast(pt), "p_partkey"), "t")
      .select(col("n_rows").as("t_n"), col("revenue_cents").as("t_rc"))
    legs.crossJoin(broadcast(truth))
      .select(col("method"), col("n_rows"), col("revenue_cents"),
        (col("n_rows") === col("t_n") &&
          col("revenue_cents") === col("t_rc")).as("agrees"))
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
