package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistence layout operators (SURVEY.md §2.1 S6/S7 at scale).
  * The reference pickles four Python lists (app.py:161-168); the
  * engine's corpus IS its index, so persistence strategy = parquet
  * layout strategy:
  *
  *  - partition by a low-cardinality pruning column (lang, date,
  *    source shard) so point/range reads touch only matching
  *    directories — partition pruning happens at planning time,
  *    before any IO;
  *  - within partitions, sort by the common join/filter key so
  *    min/max row-group stats prune further (the poor man's
  *    z-order for one key).
  *
  * At 100 TB: partition count must stay bounded (directories are
  * metadata ops) — prefer coarse partitions + row-group stats over
  * millions of tiny files.
  */
object PersistOps {

  /** Write partitioned + sorted-within-partitions parquet.
    * Repartitioning includes a bounded spread key alongside the
    * partition column: repartitioning by the partition value alone
    * would route a hot value (80% `lang=en`) through ONE task;
    * the spread fans each value across up to `filesPerValue` tasks,
    * bounding both task size and file count per directory. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String,
                       sortCol: String, filesPerValue: Int = 4): Unit =
    df.repartition(col(partitionCol), pmod(xxhash64(col(sortCol)), lit(filesPerValue)))
      .sortWithinPartitions(col(partitionCol), col(sortCol))
      .write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  /** Read back with a partition-value filter — the plan must show a
    * PartitionFilters entry and scan only the matching directory. */
  def readPartition(spark: SparkSession, path: String, partitionCol: String,
                    value: String): DataFrame =
    spark.read.parquet(path).filter(col(partitionCol) === value)

  /** Bucketed + sorted table write: co-locates rows by join key so
    * equi-joins between tables bucketed the same way plan WITHOUT
    * shuffle exchanges — the storage-layout answer to the "big
    * join shuffles every time" problem. At 100 TB, bucket the fact
    * tables on their join key once at ingest and every downstream
    * join/aggregation on that key is exchange-free. Requires
    * saveAsTable (bucket metadata lives in the catalog). */
  def writeBucketed(df: DataFrame, tableName: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(tableName)
}
