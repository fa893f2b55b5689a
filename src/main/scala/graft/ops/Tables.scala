package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every operator in the engine is a pure `DataFrame => DataFrame`
  * function; these are the only places that touch storage. At cluster
  * scale the same loaders work unchanged — parquet scans are
  * partition-pruned and column-pruned by Catalyst, so ops should
  * `select` early and let pushdown reach the scan.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized
    * reader rejects; read it as Long nanos-since-epoch (UTC) instead.
    * Downstream ops treat `ts` as ordered nanos and convert to
    * timestamps explicitly where calendar semantics are needed.
    *
    * SESSION-WIDE SIDE EFFECT: `nanosAsLong` is a session conf, so
    * this call changes how EVERY later nanos-timestamp parquet read
    * in the session is typed. The engine's own entry points (Verify /
    * Bench / PlansDump / SparkSpec) set it at session build; the set
    * here is a fallback for externally-built sessions. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
