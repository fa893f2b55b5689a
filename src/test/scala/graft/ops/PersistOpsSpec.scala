package graft.ops

import graft.SparkSpec
import java.nio.file.Files
import org.apache.spark.sql.functions._

class PersistOpsSpec extends SparkSpec {
  import spark.implicits._

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
