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

  test("keySkewProfile surfaces the hot key with its share") {
    val df = ((1 to 80).map(_ => (7L, "a")) ++ (1 to 20).map(i => (i.toLong * 100, "b")))
      .toDF("k", "v")
    val top = SkewOps.keySkewProfile(df, "k", 1).head()
    assert(top.getLong(0) === 7L)
    assert(top.getAs[Double]("share") === 0.8)
  }
}
