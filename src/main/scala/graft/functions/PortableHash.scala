package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic string→bucket hashing that is *portable across SQL
  * engines* (SURVEY.md §7.4 "hash function parity"): Spark's `hash()`
  * is Murmur3 and has no DuckDB twin, so every oracle-checked hashing
  * path instead derives an integer from the leading hex digits of
  * sha-256 — both engines produce identical lowercase-hex sha-256 for
  * UTF-8 input, and hex→int parsing is plain arithmetic in both
  * dialects.
  *
  * Spark side: `conv(substring(sha2(s,256), 1, 6), 16, 10)`.
  * DuckDB twin (same value):
  * {{{
  * list_sum(list_transform(range(1,7), i ->
  *   (strpos('0123456789abcdef', substr(sha256(s), i, 1)) - 1)
  *     * CAST(power(16, 6-i) AS BIGINT)))
  * }}}
  *
  * For non-oracle hot paths (bench-only ops) prefer
  * [[org.apache.spark.sql.functions.xxhash64]] — codegen'd and far
  * cheaper than a sha round per row.
  */
object PortableHash {

  /** 24-bit non-negative integer from the first 6 hex chars of
    * sha-256(s). Value range [0, 16^6). */
  def hash24(s: Column): Column =
    conv(substring(sha2(s.cast("string"), 256), 1, 6), 16, 10).cast("long")

  /** Bucket assignment in [0, nBuckets). */
  def bucket(s: Column, nBuckets: Int): Column =
    pmod(hash24(s), lit(nBuckets.toLong))

  /** Seeded variant for minhash families: hashes `"<seed>:" || s`. */
  def seededHash24(s: Column, seed: Int): Column =
    hash24(concat(lit(s"$seed:"), s))

  /** 48-bit non-negative integer from the first 12 hex chars of
    * sha-256(s). Value range [0, 16^12) — wide enough that simhash
    * band chunks stay selective join keys (12-bit chunks = 4096
    * distinct values; a 24-bit signature's 6-bit chunks would be
    * 64-value skew magnets). */
  def hash48(s: Column): Column =
    conv(substring(sha2(s.cast("string"), 256), 1, 12), 16, 10).cast("long")

  /** Row-local JVM twin of [[hash24]] — the same value for the same
    * string (first 3 sha-256 bytes = first 6 hex chars), for
    * streaming kernels that fold one row at a time where a Column
    * expression can't reach. Spec-pinned equal to the Column form. */
  def hash24Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8")).take(3).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** Row-local JVM twin of [[hash48]] (first 6 sha-256 bytes = first
    * 12 hex chars) — for streaming kernels. Spec-pinned equal to the
    * Column form. */
  def hash48Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val hex = md.digest(s.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  /** SQL fragment for the DuckDB twin of [[hash24]], for oracle
    * authoring. `sExpr` is a SQL expression yielding the input string. */
  def duckdbHash24(sExpr: String): String =
    s"list_sum(list_transform(range(1,7), i -> " +
      s"(strpos('0123456789abcdef', substr(sha256($sExpr), i, 1)) - 1) " +
      s"* CAST(power(16, 6-i) AS BIGINT)))"

  /** DuckDB twin of [[hash48]]. Exact in DOUBLE arithmetic: every
    * partial term and the total stay below 2^53. */
  def duckdbHash48(sExpr: String): String =
    s"list_sum(list_transform(range(1,13), i -> " +
      s"(strpos('0123456789abcdef', substr(sha256($sExpr), i, 1)) - 1) " +
      s"* CAST(power(16, 12-i) AS BIGINT)))"
}
