package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's ingest operators
  * (SURVEY.md §2.10). The reference ingests in batch at startup plus
  * on-upload micro-batches (app.py:117-158); these are the same
  * semantics as continuous streams:
  *
  *  - [[tumblingCounts]]: the streaming twin of
  *    RelationalOps.eventsTumblingAgg — event-time window + watermark
  *    so state is bounded and late data beyond the horizon is dropped.
  *  - [[dedupedIngest]]: the streaming twin of the hash anti-join
  *    (app_callapi.py:117-120,139) — first occurrence of each content
  *    hash passes, repeats are suppressed via keyed state with a TTL
  *    (state must not grow unboundedly at 100 TB/day).
  *
  * Scale notes: state is partitioned by group key across executors;
  * watermark/TTL bound its size; sinks are exactly-once through
  * checkpointed offsets + idempotent parquet commits.
  */
object StreamingOps {

  /** Event-time tumbling counts with a watermark. `events` must be a
    * *streaming* DataFrame with (ts: Timestamp, event_type, value). */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  case class Doc(doc_id: Long, source: String, text: String)
  case class KeyedDoc(content_hash: String, doc: Doc)

  /** Streaming incremental ingest: emit each content hash's FIRST
    * document, drop subsequent duplicates. Keyed state holds one
    * boolean per seen hash.
    *
    * `ttl`: optional processing-time state expiry. REQUIRED in a real
    * deployment (unbounded hash-state otherwise); opt-in here because
    * ProcessingTimeTimeout makes the engine schedule continuous
    * timeout-check micro-batches — correct for a 24/7 job, a livelock
    * for processAllAvailable-style batch draining. */
  def dedupedIngest(docs: Dataset[Doc], ttl: Option[String] = None): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .map(d => KeyedDoc(sha256Hex(d.text), d))
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState[Boolean, Doc](OutputMode.Append(), timeoutConf) {
        case (_, rows, state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            // RE-ARM the timeout: GroupState clears any pending
            // timeout on every invocation for a key, so without this
            // a hash that ever sees one duplicate never expires
            ttl.foreach(state.setTimeoutDuration)
            rows.foreach(_ => ())
            Iterator.empty
          } else {
            state.update(true)
            ttl.foreach(state.setTimeoutDuration)
            // deterministic winner: smallest doc_id in the group (the
            // group iterator's order is shuffle-dependent)
            var best: Doc = null
            rows.foreach(r => if (best == null || r.doc.doc_id < best.doc_id) best = r.doc)
            Iterator.single(best)
          }
      }
  }

  /** File-source streaming ingest — the reference's startup/upload
    * ingest (app.py:117-158) as a 24/7 job: watch `watchDir` for
    * dropped JSON corpus files, and per micro-batch append only
    * documents whose content hash is absent from BOTH the persisted
    * corpus and the batch itself (first-by-doc_id wins). Exactly-once
    * per file via the file-source checkpoint; the parquet append is
    * idempotent per batch under foreachBatch's replay contract.
    *
    * The dedup probe reads a hash-only SIDECAR (`corpusDir`_hashes),
    * not the wide corpus files — per-batch probe cost still grows
    * with distinct-hash count (one skinny column), so a long-lived
    * deployment should either compact the sidecar periodically or
    * use [[dedupedIngest]]'s keyed state, which is O(batch) per
    * trigger with TTL-bounded state.
    *
    * Returns the started query; callers own stop()/awaitTermination.
    */
  def fileIngest(spark: org.apache.spark.sql.SparkSession, watchDir: String,
                 corpusDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    spark.readStream
      .schema(schema)
      .json(watchDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val s = batch.sparkSession
        val withHash = batch.withColumn("content_hash", sha2(col("text"), 256))
        val inBatchFirst = withHash
          .withColumn("_rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("content_hash")).orderBy(col("doc_id"))))
          .filter(col("_rn") === 1).drop("_rn")
        // explicit existence check — an exception catch could not
        // distinguish "no corpus yet" from a schema/IO error, which
        // must fail the batch rather than silently disable dedup
        val hashDir = s"${corpusDir}_hashes"
        val hashPath = new org.apache.hadoop.fs.Path(hashDir)
        val fs = hashPath.getFileSystem(s.sparkContext.hadoopConfiguration)
        val fresh =
          if (fs.exists(hashPath)) {
            val state = s.read.parquet(hashDir)
            inBatchFirst.join(state, Seq("content_hash"), "left_anti")
          } else inBatchFirst
        // single evaluation per batch: cache, write corpus + sidecar, release
        fresh.persist()
        try if (fresh.count() > 0) {
          fresh.write.mode("append").parquet(corpusDir)
          fresh.select("content_hash").write.mode("append").parquet(hashDir)
        } finally fresh.unpersist()
      }
      .start()
  }

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
}
