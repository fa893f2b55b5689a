package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType` columns, expressed as Catalyst
  * higher-order functions so plans stay inside whole-stage codegen and
  * the DuckDB oracle can replicate the arithmetic exactly.
  *
  * Semantics derive from the reference's flat-L2 search + cosine
  * re-score (reference: app.py:180 squared-L2 via faiss.IndexFlatL2;
  * app.py:184 cosine_similarity per hit).
  *
  * Determinism contract (SURVEY.md §7.4): all arithmetic is performed
  * in DOUBLE (inputs cast before subtraction — float-subtract-then-
  * widen rounds differently than widen-then-subtract) and folds run in
  * ordinal array order, matching a sequential SQL fold. Callers round
  * final values with [[roundn]] before oracle comparison.
  */
object VectorMath {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import graft.functions.expressions.{CosineSimilarity, DotProduct, L2SqDistance}

  /** Cast an Array[Float] column to Array[Double] for stable math. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  // ---- codegen'd one-pass forms (identical arithmetic; hot paths) ----

  /** Squared L2 via the native fused-loop expression. */
  def fastL2Sq(a: Column, b: Column): Column =
    column(L2SqDistance(expression(a), expression(b)))

  /** Dot product via the native fused-loop expression. */
  def fastDot(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Cosine via the native one-pass expression (dot + norms fused). */
  def fastCosine(a: Column, b: Column): Column =
    column(CosineSimilarity(expression(a), expression(b)))

  // ---- higher-order-function reference forms (oracle-readable) ----

  /** Sequential ordered fold of an Array[Double] column: sum. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Squared L2 distance between two Array[Double] columns.
    * (FAISS IndexFlatL2 returns *squared* L2 — reference app.py:180.) */
  def l2Sq(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => (x - y) * (x - y)))

  /** L2 distance (sqrt of [[l2Sq]]). */
  def l2(a: Column, b: Column): Column = sqrt(l2Sq(a, b))

  /** Dot product of two Array[Double] columns. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x * y))

  /** Euclidean norm of an Array[Double] column. */
  def norm(v: Column): Column = sqrt(foldSum(transform(v, x => x * x)))

  /** Cosine similarity (reference app.py:184). NULL-safe on zero
    * vectors: returns 0.0 rather than NaN (zero-vector rows exist via
    * the empty-text guard, reference app_callapi.py:112). */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom === 0.0, 0.0).otherwise(dot(a, b) / denom)
  }

  /** Round to `n` decimals and normalize -0.0 to 0.0 so driver-side
    * value hashing can't diverge on sign-of-zero. */
  def roundn(c: Column, n: Int): Column = round(c, n) + lit(0.0)

  /** Order-deterministic grouped float sum: `value` accumulated
    * SEQUENTIALLY in ascending `key` order. A plain `sum()` merges
    * partition partials in a run-dependent order, and a float sum's
    * low bits depend on that order — on values sitting near a
    * 6-decimal rounding boundary the rounded result then flips
    * between runs (observed on sparse-cosine scores at sf0.1). The
    * DuckDB twin `sum(value ORDER BY key)` folds in the identical
    * order, so both engines produce bit-equal sums every run. Cost:
    * one collect_list per group — use only where the per-group term
    * count is bounded (sparse-vector dims, query terms), never on
    * data-sized groups. */
  def orderedSum(key: Column, value: Column): Column =
    aggregate(
      transform(array_sort(collect_list(struct(key.as("k"), value.as("p")))),
        x => x.getField("p")),
      lit(0.0), (s, x) => s + x)

  /** L2-normalize an Array[Double] column (zero vector stays zero). */
  def l2Normalize(v: Column): Column = {
    val n = norm(v)
    when(n === 0.0, v).otherwise(transform(v, x => x / n))
  }
}
