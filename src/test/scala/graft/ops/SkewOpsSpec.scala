package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedEquiJoin produces exactly the plain-join result") {
    // hot key 1 carries 90% of rows
    val skewed = ((1 to 90).map(i => (1L, s"row$i")) ++ (1 to 10).map(i => (i.toLong + 1, s"x$i")))
      .toDF("k", "payload")
    val build = (1L to 11L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val salted = SkewOps.saltedEquiJoin(skewed, build, "k", "payload", salts = 4)
    val plain = skewed.join(build, "k")
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salting actually spreads the hot key across salt values") {
    val skewed = (1 to 100).map(i => (1L, s"row$i")).toDF("k", "payload")
    // the OPERATOR'S salt expression (SkewOps.saltOf — the same one
    // saltedEquiJoin applies), not a test-local copy: a regression to
    // a constant or key-derived salt must fail here
    val salts = skewed
      .withColumn("_salt", SkewOps.saltOf($"payload", 4))
      .select("_salt").distinct().collect().map(_.getLong(0)).toSet
    assert(salts.size > 1, "hot key not spread across salt values")
    assert(salts.forall(s => s >= 0 && s < 4))
  }

  test("skewJoinReceipt: all three strategies agree on a planted hot key") {
    // lineitem-shaped fixture: partkey 1 carries 95% of rows
    val li = ((1 to 950).map(i => (1L, 10.0 + (i % 7))) ++
      (1 to 50).map(i => ((i % 20).toLong + 2, 5.0)))
      .toDF("l_partkey", "l_extendedprice")
    val pt = (1L to 21L).toDF("p_partkey")
    val rows = SkewOps.skewJoinReceipt(li, pt, salts = 4).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[String]("method")).toSet ===
      Set("shuffle", "broadcast", "salted"))
    assert(rows.forall(_.getAs[Boolean]("agrees")))
    assert(rows.map(_.getAs[Long]("n_rows")).toSet.size === 1)
    assert(rows.map(_.getAs[Long]("revenue_cents")).toSet.size === 1)
  }

  test("AQE really skew-splits the shuffle leg on a planted hot key") {
    // the receipt's `shuffle` leg documents itself as "the leg AQE
    // splits at runtime" — drive that claim: lower the skew
    // thresholds, disable broadcast, join a hot-key fact table, and
    // assert the executed plan contains a skew-split AQEShuffleRead
    // AND the result still equals the salted strategy's.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      // 16 mappers (skew-splitting reads subsets of MAP outputs — a
      // single-mapper partition cannot split) and an incompressible
      // per-row payload so the hot partition's shuffle bytes really
      // exceed the lowered threshold
      val fact = spark.range(0, 20099, 1, 16)
        .select(when($"id" < 20000, 1L).otherwise($"id" - 19998L).as("k"),
          md5($"id".cast("string")).as("payload"))
      val dim = (1L to 101L).map(k => (k, s"dim$k")).toDF("k", "attr")
      // NOTE the bare join: a k-keyed agg on top would need hash
      // partitioning on k, and AQE declines to skew-split a join
      // whose output partitioning a downstream exchange depends on
      val joined = fact.join(dim.hint("merge"), "k").select($"k", $"payload")
      val got = joined.collect().map(_.getLong(0))
        .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      assert(got(1L) === 20000L && got(50L) === 1L)
      val executed = joined.queryExecution.executedPlan.toString
      assert(executed.toLowerCase.contains("skewed"),
        s"no skew-split AQEShuffleRead in executed plan:\n$executed")
      val salted = SkewOps.saltedEquiJoin(fact, dim, "k", "payload", salts = 8)
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(salted === got)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("keySkewProfile surfaces the hot key with its share") {
    val df = ((1 to 80).map(_ => (7L, "a")) ++ (1 to 20).map(i => (i.toLong * 100, "b")))
      .toDF("k", "v")
    val top = SkewOps.keySkewProfile(df, "k", 1).head()
    assert(top.getLong(0) === 7L)
    assert(top.getAs[Double]("share") === 0.8)
  }
}
