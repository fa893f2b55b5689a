package graft.functions

import graft.SparkSpec
import graft.functions.expressions.NfcNormalize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

/** NfcNormalize: UAX #15 canonical composition as a codegen'd native
  * expression \u2014 parity with java.text.Normalizer, null safety, and
  * the codegen-stage assertion the vector expressions pin. All
  * non-ASCII codepoints are written as \\u escapes so no invisible or
  * ambiguously-normalized characters live in this source file. */
class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column) = column(NfcNormalize(expression(c)))

  test("composes decomposed accents, identity on ASCII and already-composed text") {
    val df = Seq(
      ("cafe\u0301", "caf\u00e9"), // e + combining acute \u2192 \u00e9
      ("caf\u00e9", "caf\u00e9"),  // already composed: identity
      ("plain ascii", "plain ascii"),
      ("A\u030angstro\u0308m", "\u00c5ngstr\u00f6m") // \u00c5 and \u00f6 compose
    ).toDF("raw", "expected")
    assert(df.filter(nfc($"raw") =!= $"expected").count() === 0)
    // char length shrinks by exactly the composed pair
    assert(df.filter($"raw" === lit("cafe\u0301"))
      .select(length(nfc($"raw"))).head().getInt(0) === 4)
  }

  test("null-safe and matches java.text.Normalizer on random mixed strings") {
    val n = Seq((null: String, 1)).toDF("raw", "x")
    assert(n.select(nfc($"raw")).head().isNullAt(0))
    val rnd = new scala.util.Random(11)
    val pool = "az e\u0301\u00e9\u0308\u030aA\u00c5 x"
    val rows = (0 until 40).map(_ =>
      (0 until 12).map(_ => pool(rnd.nextInt(pool.length))).mkString)
    val exp = rows.map(s =>
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    val got = rows.toDF("raw").select(nfc($"raw")).as[String].collect()
    assert(got.toSeq === exp)
  }

  test("codegen path is exercised (no fallback to interpreted eval)") {
    val df = spark.range(50)
      .select(concat(lit("cafe\u0301 "), $"id".cast("string")).as("raw"))
      .withColumn("n", nfc($"raw"))
      .filter(length($"n") > 0)
    assert(df.count() === 50)
    val starred = df.queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("graft_nfc") && l.trim.startsWith("*"))
    assert(starred)
  }
}
