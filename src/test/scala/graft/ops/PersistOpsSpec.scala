package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PersistOpsSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join with NO shuffle exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
        .select($"l_orderkey".as("k"), $"l_quantity")
      val or = Tables.orders(spark, "/root/testdata/sf0.001")
        .select($"o_orderkey".as("k"), $"o_totalprice")
      PersistOps.writeBucketed(li, "li_bucketed", "k", 8)
      PersistOps.writeBucketed(or, "or_bucketed", "k", 8)
      // count Exchange nodes in the FINALIZED executed plan. The
      // execution must run THROUGH the df's OWN QueryExecution —
      // df.count() builds a separate QueryExecution and finalizes
      // that one, leaving df.queryExecution un-executed (its
      // executedPlan would print isFinalPlan=false and miss any
      // runtime replanning) — so collect() on the df itself.
      def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
        df.collect()
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains("isFinalPlan=false"), "AQE plan not finalized")
        "Exchange".r.findAllIn(plan).length
      }
      val joined = spark.table("li_bucketed").join(spark.table("or_bucketed"), "k")
      val plain = li.join(or, "k")
      assert(exchanges(plain) >= 2) // unbucketed SMJ: one per side
      assert(exchanges(joined) === 0) // bucket co-location: none
      assert(joined.count() === plain.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partitioned write enables planning-time partition pruning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val path = Files.createTempDirectory("persist_part").toString
    PersistOps.writePartitioned(docs, path, "lang", "doc_id")

    val pruned = PersistOps.readPartition(spark, path, "lang", "es")
    // content round-trips
    assert(pruned.count() === docs.filter($"lang" === "es").count())
    // the scan itself is pruned, not post-filtered: PartitionFilters
    // carries the predicate and the other partitions never appear
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("isnotnull(lang"))
    // partition directories exist per lang value
    val dirs = new java.io.File(path).listFiles().map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.length >= 2 && dirs.contains("lang=es"))
  }
}
