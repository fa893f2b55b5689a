package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.functions.VectorMath

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is a pure composition of operators from
  * `graft.ops`; every oracle in [[oracleSql]] is the ANSI/DuckDB twin
  * computing the *same values with the same names* (the driver sorts
  * columns by name and hashes values — SURVEY.md §5.2 rules:
  * deterministic ordering, every tie broken, doubles rounded on both
  * sides, -0.0 normalized).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    knnQuery(spark, "/root/testdata/sf0.001")

  private def knnQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val q = emb.filter(col("vec_id") === 0)
      .select(VectorMath.asDouble(col("embedding")).as("qe"))
    VectorOps.knnSearch(emb, q, k = 5)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- P1: corpus core (SURVEY.md §2.1/2.2/2.4/2.7) ----
    "scan_documents" -> ((s, dir) => CorpusOps.scanDocuments(Tables.documents(s, dir))),
    "filter_sources" -> ((s, dir) =>
      CorpusOps.filterSources(Tables.documents(s, dir)).select("doc_id", "source")),
    "segment_paragraphs" -> ((s, dir) =>
      CorpusOps.segmentParagraphs(Tables.documents(s, dir))
        .withColumn("para_idx", col("para_idx").cast("long"))),
    "dedup_documents" -> ((s, dir) => CorpusOps.dedupDocuments(Tables.documents(s, dir))),
    "content_hash" -> ((s, dir) => CorpusOps.contentHash(Tables.documents(s, dir))),
    "corpus_stats" -> ((s, dir) => CorpusOps.corpusStats(Tables.documents(s, dir))),
    "incremental_antijoin" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val state = CorpusOps.contentHash(docs.filter(col("doc_id") % 2 === 0))
      CorpusOps.incrementalAntiJoin(docs, state).select("doc_id", "source", "content_hash")
    }),
    "delete_rebuild" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val replacement = docs
        .filter(col("source") === "src1")
        .select(
          (col("doc_id") + 1000000).as("doc_id"),
          upper(col("text")).as("text"), col("lang"), col("source"), col("n_chars"))
      CorpusOps.upsertSource(docs, "src1", replacement)
        .select(col("doc_id"), col("source"), sha2(col("text"), 256).as("content_hash"))
    }),

    // ---- P1/P2: vector search + embedding (SURVEY.md §2.9, §3.2) ----
    "knn_search" -> ((s, dir) => knnQuery(s, dir)),
    "mean_pool" -> ((s, dir) => VectorOps.meanPoolByLabel(Tables.embeddings(s, dir))),
    "embed_text" -> ((s, dir) => EmbedOps.embedSparse(Tables.documents(s, dir))),
    "ann_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      VectorOps.annTopK(emb, emb.filter(col("vec_id") < 10), k = 3)
    }),
    "similarity_join" -> ((s, dir) =>
      VectorOps.similarityJoin(Tables.embeddings(s, dir), threshold = 0.3, limitIds = 200)),

    // ---- P2: keywords + prompt (SURVEY.md §2.5, §3.3) ----
    "keyword_topn" -> ((s, dir) => KeywordOps.keywordTopN(Tables.documents(s, dir))),
    "distinct_keywords" -> ((s, dir) =>
      KeywordOps.distinctKeywords(KeywordOps.keywordTopN(Tables.documents(s, dir)))),
    "assemble_prompt" -> ((s, dir) =>
      KeywordOps.assemblePrompt(
        KeywordOps.distinctKeywords(KeywordOps.keywordTopN(Tables.documents(s, dir))),
        notes = "focus on quarterly impact")),
    "keyword_extract" -> ((s, dir) => KeywordOps.keywordExtract(Tables.documents(s, dir))),

    // ---- P3: relational breadth (SURVEY.md §2.3/2.5/2.10 north star) ----
    "join_revenue_segment" -> ((s, dir) =>
      RelationalOps.revenueBySegment(
        Tables.customer(s, dir), Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "semi_join_parts" -> ((s, dir) =>
      RelationalOps.partsWithSales(Tables.part(s, dir), Tables.lineitem(s, dir))),
    "q1_pricing_summary" -> ((s, dir) => RelationalOps.pricingSummary(Tables.lineitem(s, dir))),
    "window_running_sum" -> ((s, dir) => RelationalOps.runningSumPerUser(Tables.events(s, dir))),
    "events_tumbling_agg" -> ((s, dir) =>
      RelationalOps.eventsTumblingAgg(Tables.events(s, dir))
        .withColumn("hour_start", unix_timestamp(col("hour_start")))),
    "json_extract" -> ((s, dir) => RelationalOps.extractJsonK(Tables.events(s, dir)))
  )

  // ===================== oracle SQL (DuckDB) =====================

  /** DuckDB fragment: sequential double fold over two float lists. */
  private def duckL2Sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))^2))"
  private def duckDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> " +
      s"CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private def duckNorm(a: String): String = s"sqrt(${duckDot(a, a)})"
  private def duckCos(a: String, b: String): String =
    s"(CASE WHEN ${duckNorm(a)} * ${duckNorm(b)} = 0 THEN 0.0 " +
      s"ELSE ${duckDot(a, b)} / (${duckNorm(a)} * ${duckNorm(b)}) END)"

  /** DuckDB twin of graft.functions.PortableHash.hash24. */
  private def duckHash24(sExpr: String): String =
    s"CAST(list_sum(list_transform(range(1,7), i -> " +
      s"(strpos('0123456789abcdef', substr(sha256($sExpr), i, 1)) - 1) " +
      s"* CAST(power(16, 6-i) AS BIGINT))) AS BIGINT)"

  /** DuckDB twin of EmbedOps.tokenize: CTE producing (doc_id, pos, tok). */
  private val duckToks =
    """toks AS (
      |  SELECT doc_id, u.i - 1 AS pos, trim(parts[u.i]) AS tok
      |  FROM (SELECT doc_id, list_slice(string_split(text, ' '), 1, 512) AS parts
      |        FROM documents) d,
      |       unnest(range(1, len(parts)+1)) u(i)
      |  WHERE trim(parts[u.i]) <> '')""".stripMargin

  /** DuckDB twin of KeywordOps.keywordTopN (n=8) as a CTE chain. */
  private val duckTopn =
    s"""WITH $duckToks,
       |g AS (SELECT doc_id, tok, count(*) AS tf, min(pos) AS first_pos
       |      FROM toks GROUP BY 1, 2),
       |topn AS (
       |  SELECT doc_id, rank, tok AS keyword, tf FROM (
       |    SELECT doc_id, tok, tf,
       |      row_number() OVER (PARTITION BY doc_id
       |        ORDER BY tf DESC, length(tok) DESC, tok, first_pos) AS rank
       |    FROM g) WHERE rank <= 8)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "scan_documents" ->
      "SELECT doc_id, source, lang, n_chars FROM documents",
    "filter_sources" ->
      """SELECT doc_id, source FROM documents
        |WHERE NOT starts_with(source, '~$')
        |  AND (NOT contains(source, '.')
        |       OR regexp_matches(lower(source), '\.(pdf|docx)$'))""".stripMargin,
    "segment_paragraphs" ->
      """SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS para_idx, trim(parts[u.i]) AS para
        |FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents) d,
        |     unnest(range(1, len(parts)+1)) u(i)
        |WHERE trim(parts[u.i]) <> ''""".stripMargin,
    "dedup_documents" ->
      """SELECT min(doc_id) AS doc_id, source, count(*) AS n_copies
        |FROM documents GROUP BY source, text""".stripMargin,
    "content_hash" ->
      "SELECT doc_id, sha256(text) AS content_hash FROM documents",
    "corpus_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |       round(avg(n_chars), 4) + 0 AS avg_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "incremental_antijoin" ->
      """SELECT d.doc_id, d.source, sha256(d.text) AS content_hash
        |FROM documents d
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM documents s
        |  WHERE s.doc_id % 2 = 0 AND sha256(s.text) = sha256(d.text))""".stripMargin,
    "delete_rebuild" ->
      """SELECT doc_id, source, sha256(text) AS content_hash FROM (
        |  SELECT doc_id, text, source FROM documents WHERE source <> 'src1'
        |  UNION ALL
        |  SELECT doc_id + 1000000, upper(text), source
        |  FROM documents WHERE source = 'src1')""".stripMargin,
    "knn_search" ->
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |s AS (
         |  SELECT e.vec_id, e.label,
         |    round(${duckL2Sq("e.embedding", "q.qe")}, 6) + 0 AS l2_sq,
         |    round(${duckCos("e.embedding", "q.qe")}, 6) + 0 AS cos_sim
         |  FROM embeddings e, q)
         |SELECT row_number() OVER (ORDER BY l2_sq, vec_id) AS rank,
         |       vec_id, l2_sq, cos_sim, label
         |FROM s ORDER BY l2_sq, vec_id LIMIT 5""".stripMargin,
    "mean_pool" ->
      """SELECT label, CAST(u.i - 1 AS BIGINT) AS dim,
        |       round(avg(CAST(embedding[u.i] AS DOUBLE)), 6) + 0 AS centroid_val
        |FROM embeddings, unnest(range(1, len(embedding)+1)) u(i)
        |GROUP BY label, dim""".stripMargin,
    "embed_text" ->
      s"""WITH $duckToks,
         |hashed AS (
         |  SELECT doc_id, ${duckHash24("tok")} % 64 AS dim FROM toks),
         |tf AS (SELECT doc_id, dim, CAST(count(*) AS DOUBLE) AS cnt
         |       FROM hashed GROUP BY 1, 2),
         |nrm AS (SELECT doc_id, sqrt(sum(cnt*cnt)) AS nrm FROM tf GROUP BY 1)
         |SELECT t.doc_id, t.dim, round(t.cnt / n.nrm, 6) + 0 AS weight
         |FROM tf t JOIN nrm n USING (doc_id)""".stripMargin,
    "ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
         |           FROM embeddings WHERE vec_id < 10),
         |s AS (
         |  SELECT q.query_id, e.vec_id,
         |    round(${duckCos("e.embedding", "q.qe")}, 6) + 0 AS cos_sim
         |  FROM embeddings e, q WHERE e.vec_id <> q.query_id),
         |r AS (SELECT query_id, vec_id, cos_sim,
         |        row_number() OVER (PARTITION BY query_id
         |          ORDER BY cos_sim DESC, vec_id) AS rank
         |      FROM s)
         |SELECT query_id, rank, vec_id, cos_sim FROM r WHERE rank <= 3""".stripMargin,
    "similarity_join" ->
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${duckCos("a.embedding", "b.embedding")}, 6) + 0 AS cos_sim
         |FROM embeddings a, embeddings b
         |WHERE a.vec_id < b.vec_id AND a.vec_id < 200 AND b.vec_id < 200
         |  AND round(${duckCos("a.embedding", "b.embedding")}, 6) + 0 >= 0.3""".stripMargin,
    "keyword_topn" ->
      s"$duckTopn\nSELECT doc_id, rank, keyword, tf FROM topn",
    "distinct_keywords" ->
      s"""$duckTopn
         |SELECT keyword, min(doc_id * 1000000 + rank) AS first_seen
         |FROM topn GROUP BY keyword ORDER BY first_seen LIMIT 6""".stripMargin,
    "assemble_prompt" ->
      s"""$duckTopn,
         |dk AS (SELECT keyword, min(doc_id * 1000000 + rank) AS first_seen
         |       FROM topn GROUP BY keyword ORDER BY first_seen LIMIT 6)
         |SELECT 'Write a project proposal covering the following keywords: '
         |  || string_agg(keyword, ', ' ORDER BY first_seen)
         |  || '. Additional notes: focus on quarterly impact' AS prompt
         |FROM dk""".stripMargin,
    "keyword_extract" ->
      s"""WITH $duckToks,
         |grams AS (
         |  SELECT doc_id, pos,
         |    unnest(CASE WHEN tok2 IS NOT NULL
         |                THEN [tok, tok || ' ' || tok2] ELSE [tok] END) AS gram
         |  FROM (SELECT doc_id, pos, tok,
         |          lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok2
         |        FROM toks)),
         |tf AS (SELECT doc_id, gram, count(*) AS tf, min(pos) AS first_pos
         |       FROM grams GROUP BY 1, 2),
         |df AS (SELECT gram, count(*) AS df
         |       FROM (SELECT DISTINCT doc_id, gram FROM grams) GROUP BY gram),
         |n AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents),
         |scored AS (
         |  SELECT t.doc_id, t.gram, t.tf, d.df, t.first_pos,
         |    round(t.tf * ln((n.n_docs + 1) / (d.df + 1)), 6) + 0 AS score
         |  FROM tf t JOIN df d USING (gram), n)
         |SELECT doc_id, rank, gram AS keyword, score FROM (
         |  SELECT doc_id, gram, score,
         |    row_number() OVER (PARTITION BY doc_id
         |      ORDER BY tf DESC, df, gram, first_pos) AS rank
         |  FROM scored) WHERE rank <= 8""".stripMargin,
    "join_revenue_segment" ->
      """SELECT c.c_mktsegment,
        |  round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) + 0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1""".stripMargin,
    "semi_join_parts" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) + 0 AS sum_qty,
        |  round(sum(l_extendedprice), 2) + 0 AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0 AS sum_disc_price,
        |  round(avg(l_quantity), 4) + 0 AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "window_running_sum" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) + 0 AS running_value
        |FROM events""".stripMargin,
    "events_tumbling_agg" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, count(*) AS n_events, round(sum(value), 4) + 0 AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "json_extract" ->
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k"\s*:\s*(-?\d+)', 1) AS BIGINT) AS k
        |FROM events WHERE regexp_matches(props, '"k"\s*:\s*-?\d+')""".stripMargin
  )
}
