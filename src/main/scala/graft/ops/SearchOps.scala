package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorMath.roundn

/** The reference's search entry point end-to-end (SURVEY.md §3.2):
  * free-text query → embed → score every corpus document → ranked
  * top-k with metadata. Composed entirely from shipped operators:
  * [[EmbedOps.embedSparse]] for both sides, cosine as a sparse
  * inverted-index join (unit-norm weights ⇒ dot over shared dims),
  * deterministic top-k.
  *
  * Scale shape: the query side is a handful of (dim, weight) rows —
  * broadcast; the corpus side streams; the only wide exchange is the
  * per-doc score aggregation, keyed by doc_id. No dense vectors are
  * materialized anywhere.
  */
object SearchOps {

  /** Top-k documents for a text query: (rank, doc_id, source, score). */
  def searchText(docs: DataFrame, queryText: String, k: Int, dim: Int = 64): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val corpusW = EmbedOps.embedSparse(docs, dim)
    val queryW = EmbedOps
      .embedSparse(Seq((-1L, queryText)).toDF("doc_id", "text"), dim)
      .select(col("dim"), col("weight").as("qw"))
    val scored = corpusW
      .join(broadcast(queryW), "dim")
      .groupBy(col("doc_id"))
      .agg(roundn(sum(col("weight") * col("qw")), 6).as("score"))
    // orderBy.limit FIRST (plans as TakeOrderedAndProject — per-
    // partition top-k, no global single-reducer sort); the window
    // then ranks only the k survivors
    val top = scored
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    top
      .withColumn(
        "rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("rank"), col("doc_id"), col("source"), col("score"))
  }
}
