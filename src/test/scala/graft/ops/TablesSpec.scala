package graft.ops

import graft.SparkSpec
import java.nio.file.Files

class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("events() memoizes one configured child session per flag-less parent") {
    val dir = Files.createTempDirectory("tables_events").toString
    Seq((1L, 10L), (2L, 20L)).toDF("event_id", "ts")
      .write.parquet(s"$dir/events.parquet")

    val parent = spark.newSession()
    parent.conf.unset("spark.sql.legacy.parquet.nanosAsLong") // force the child branch
    val d1 = Tables.events(parent, dir)
    val d2 = Tables.events(parent, dir)
    // one child, reused across calls, flag set, parent untouched
    assert(d1.sparkSession eq d2.sparkSession)
    assert(d1.sparkSession ne parent)
    assert(d1.sparkSession.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "true")
    // parent untouched: still at the Spark default ("false"), not "true"
    assert(!parent.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
    assert(d1.count() === 2)

    // a parent that already has the flag reads in ITS OWN session
    val configured = spark.newSession()
    configured.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    assert(Tables.events(configured, dir).sparkSession eq configured)
  }
}
