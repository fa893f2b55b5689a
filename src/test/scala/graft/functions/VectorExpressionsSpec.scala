package graft.functions

import graft.SparkSpec
import graft.functions.VectorMath._
import org.apache.spark.sql.functions._
import scala.util.Random

/** Bit-for-bit parity between the codegen'd one-pass expressions and
  * the higher-order-function reference forms — the contract that lets
  * the hot paths use the fast forms while the DuckDB oracle mirrors
  * the HOF arithmetic. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)
  private def vecs = (0 until 50).map { i =>
    (i.toLong,
      Seq.fill(64)(rnd.nextFloat() * 4 - 2),
      Seq.fill(64)(rnd.nextFloat() * 4 - 2))
  }.toDF("id", "a", "b")
    .select($"id", asDouble($"a").as("a"), asDouble($"b").as("b"))

  test("fastL2Sq ≡ l2Sq exactly (no tolerance)") {
    assert(vecs.filter(fastL2Sq($"a", $"b") =!= l2Sq($"a", $"b")).count() === 0)
  }

  test("fastDot ≡ dot exactly") {
    assert(vecs.filter(fastDot($"a", $"b") =!= dot($"a", $"b")).count() === 0)
  }

  test("fastCosine ≡ cosine exactly, including zero-vector guard") {
    assert(vecs.filter(fastCosine($"a", $"b") =!= cosine($"a", $"b")).count() === 0)
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(z.select(fastCosine($"a", $"b")).head().getDouble(0) === 0.0)
  }

  test("fast forms accept float arrays via implicit cast") {
    val f = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("a", "b")
    assert(f.select(fastDot($"a", $"b")).head().getDouble(0) === 11.0)
  }

  test("codegen path is exercised (no fallback to interpreted eval)") {
    // spark.range keeps the plan dynamic (a literal local relation
    // constant-folds away before any codegen stage exists)
    // array() instead of transform(): higher-order functions are
    // CodegenFallback and would break the stage — which is precisely
    // why the fused expressions exist
    val mk = (mul: Int) => array((0 until 8).map(d => ($"id" * mul + d).cast("double")): _*)
    val df = spark.range(50)
      .select($"id", mk(1).as("a"), mk(2).as("b"))
      .withColumn("c", fastCosine($"a", $"b"))
      .filter($"c" > -2)
    assert(df.count() === 50)
    // toString marks codegen stages with "*(n)"; the line evaluating
    // graft_cosine must be inside one
    val starred = df.queryExecution.executedPlan.toString
      .linesIterator.exists(l => l.contains("graft_cosine") && l.trim.startsWith("*"))
    assert(starred)
  }
}
