package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PortableHashSpec extends SparkSpec {
  import spark.implicits._

  test("hash24 matches a reference value computed from sha-256 hex") {
    // sha256("tok") starts 0x1a75f2... → first 6 hex digits as int
    val h = Seq("tok").toDF("s").select(PortableHash.hash24(col("s")).as("h"))
      .head().getLong(0)
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("SHA-256")
        .digest("tok".getBytes("UTF-8"))
        .take(3).map("%02x".format(_)).mkString, 16)
    assert(h === expected)
  }

  test("hash24 is deterministic and in [0, 16^6)") {
    val df = Seq("a", "b", "", "한국어", "a").toDF("s")
      .select(PortableHash.hash24(col("s")).as("h"))
    val hs = df.collect().map(_.getLong(0))
    assert(hs.forall(h => h >= 0 && h < (1L << 24)))
    assert(hs(0) === hs(4)) // same input, same hash
    assert(hs(0) !== hs(1))
  }

  test("hash48Jvm and hash24Jvm match the Column forms on tricky inputs") {
    val inputs = Seq("tok", "", "한국어", "hll:42", "a b c")
    val rows = inputs.toDF("s").select(
      col("s"), PortableHash.hash24(col("s")).as("h24"),
      PortableHash.hash48(col("s")).as("h48"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    inputs.foreach { s =>
      assert(PortableHash.hash24Jvm(s) === rows(s)._1, s"hash24 of '$s'")
      assert(PortableHash.hash48Jvm(s) === rows(s)._2, s"hash48 of '$s'")
    }
  }

  test("bucket stays within range and seeded hashes differ by seed") {
    val df = Seq("x").toDF("s").select(
      PortableHash.bucket(col("s"), 64).as("b"),
      PortableHash.seededHash24(col("s"), 0).as("h0"),
      PortableHash.seededHash24(col("s"), 1).as("h1"))
    val r = df.head()
    assert(r.getLong(0) >= 0 && r.getLong(0) < 64)
    assert(r.getLong(1) !== r.getLong(2))
  }
}
