package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamingOps._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tumblingCounts aggregates event-time windows over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val q = tumblingCounts(
      input.toDF().toDF("ts", "event_type", "value"), "1 hour", "10 minutes")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("append").start()
    try {
      val h = 3600L * 1000
      input.addData(
        (new Timestamp(0), "a", 1.0), (new Timestamp(h - 1), "a", 2.0),
        (new Timestamp(h), "a", 4.0))
      q.processAllAvailable()
      // advance watermark far enough to close the first windows
      input.addData((new Timestamp(10 * h), "a", 0.0))
      q.processAllAvailable()
      val rows = spark.table("tumbling_out")
        .select("n_events", "sum_value").as[(Long, Double)].collect().toSet
      assert(rows === Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("dedupedIngest emits first occurrence per content hash only") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Doc]
    val q = dedupedIngest(input.toDS()).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      input.addData(Doc(0L, "s0", "same text"), Doc(1L, "s1", "other text"))
      q.processAllAvailable()
      input.addData(Doc(2L, "s2", "same text")) // dup arrives in later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(0L, 1L))
    } finally q.stop()
  }
}
