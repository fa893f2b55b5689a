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
    * `nanosAsLong` is a session conf with no per-read option, so an
    * externally-built session that lacks it gets a CHILD session
    * (`newSession`: shared SparkContext and cached data, private
    * SQLConf) with the flag set — the caller's session is never
    * mutated. The engine's own entry points (Verify / Bench /
    * PlansDump / SparkSpec) set it at session build and take the
    * first branch. The conf must hold at ACTION time (planning
    * captures it into the scan's Hadoop conf), which is why a
    * set-then-restore around the lazy read would be wrong.
    *
    * The configured child is MEMOIZED per parent session (weak keys:
    * an entry dies with its parent) — repeated events() calls from an
    * external session reuse one child instead of accumulating
    * sessions and re-copying confs per call. Runtime confs are thus
    * captured at FIRST use; a caller changing session confs between
    * events() calls should set nanosAsLong itself and take the first
    * branch. */
  private val childSessions =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, SparkSession]())

  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val s =
      if (spark.conf.getOption(key).contains("true")) spark
      else childSessions.computeIfAbsent(spark, _ => {
        val child = spark.newSession()
        // newSession starts from SparkConf defaults, NOT the caller's
        // runtime confs — copy them over so the events scan runs under
        // the same settings (timezone, rebase modes, partition sizing)
        // as every other load in the caller's program, plus the flag.
        // Static/read-only confs reject the set (AnalysisException,
        // e.g. "Cannot modify the value of a static config"); skip
        // those, propagate anything unexpected.
        spark.conf.getAll.foreach { case (k, v) =>
          try child.conf.set(k, v)
          catch { case _: org.apache.spark.sql.AnalysisException => () }
        }
        child.conf.set(key, "true")
        child
      })
    load(s, dir, "events")
  }
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
}
