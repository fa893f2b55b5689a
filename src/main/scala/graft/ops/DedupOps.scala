package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash
import graft.functions.VectorMath.roundn

/** Near-duplicate detection for training-data pipelines — the scale
  * generalization of the reference's exact dedup (app.py:98-99 skips
  * exact (file,i) repeats; app_callapi.py:117-120 skips exact file
  * hashes). At 100 TB exact hashing misses near-dups, so the engine
  * adds the standard family: MinHash+LSH banding, SimHash hamming,
  * and n-gram Jaccard — all expressed as explode/agg/join pipelines
  * over Catalyst builtins (portable sha-derived hashes, so the DuckDB
  * oracle can replay every step).
  *
  * Scale shape: everything is keyed shuffles on uniformly-distributed
  * hash keys. LSH candidate generation is the 100 TB path — the
  * quadratic verify step only ever runs inside a NON-skewed bucket
  * join (band signatures spread uniformly by construction).
  */
object DedupOps {

  /** Word w-shingles with positions: (doc_id, pos, shingle). */
  def wordShingles(docs: DataFrame, w: Int = 3): DataFrame = {
    val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until w).map(i => lead(col("tok"), i).over(win).as(s"_t$i"))
    val cols = col("tok") +: (1 until w).map(i => col(s"_t$i"))
    EmbedOps
      .tokenize(docs)
      .select(col("doc_id") +: col("pos") +: col("tok") +: leads: _*)
      .filter(col(s"_t${w - 1}").isNotNull)
      .select(col("doc_id"), col("pos"), concat_ws(" ", cols: _*).as("shingle"))
  }

  /** Prime just above 2^24 for the universal-hash family. */
  val MinhashPrime: Long = 16777259L

  /** MinHash signature: (doc_id, seed, minh). The hash family is the
    * textbook universal construction h_i(x) = (a_i·h0(x) + b_i) mod p
    * over ONE sha-derived base hash per distinct shingle — seeded
    * variants are pure arithmetic, so the sha cost is |shingle vocab|
    * (not ×numHashes), and the whole family stays replicable in the
    * oracle's SQL dialect. */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 12, w: Int = 3): DataFrame = {
    val docShingles = wordShingles(docs, w)
      .select(col("doc_id"), col("shingle"))
      .distinct()
    val p = MinhashPrime
    val seeded = docShingles
      .select(col("shingle")).distinct()
      .withColumn("h0", PortableHash.hash24(col("shingle")))
      .withColumn("seed", explode(sequence(lit(0), lit(numHashes - 1))))
      .withColumn(
        "h",
        expr(s"(((seed + 1) * 2654435761 % $p) * h0 + ((seed + 1) * 40503 + 12345) % $p) % $p"))
    docShingles
      .join(seeded, "shingle")
      .groupBy(col("doc_id"), col("seed"))
      .agg(min(col("h")).as("minh"))
  }

  /** LSH band buckets: seeds grouped `rowsPerBand` at a time; the band
    * signature is the seed-ordered concat of its min-hashes. Docs
    * sharing any (band, signature) bucket are near-dup candidates. */
  def lshBuckets(signatures: DataFrame, rowsPerBand: Int = 3): DataFrame =
    signatures
      .withColumn("band", (col("seed") / rowsPerBand).cast("long"))
      .groupBy(col("doc_id"), col("band"))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("seed"), col("minh")))),
            x => x.getField("minh").cast("string")),
          "-").as("band_sig"))

  /** MinHash-LSH candidate pairs: (a_id, b_id, n_shared_bands). */
  def minhashCandidates(docs: DataFrame, numHashes: Int = 12, rowsPerBand: Int = 3,
                        w: Int = 3): DataFrame = {
    val buckets = lshBuckets(minhashSignatures(docs, numHashes, w), rowsPerBand)
    val a = buckets.select(col("doc_id").as("a_id"), col("band"), col("band_sig"))
    val b = buckets.select(col("doc_id").as("b_id"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 24-bit SimHash per document: token hash bits weighted by tf,
    * majority vote per bit (sum>0 → 1). */
  def simhash(docs: DataFrame, bits: Int = 24): DataFrame = {
    val tf = EmbedOps
      .tokenize(docs)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val vocab = tf.select(col("tok")).distinct()
      .withColumn("h", PortableHash.hash24(col("tok")))
    tf
      .join(vocab, "tok")
      .withColumn("i", explode(sequence(lit(0), lit(bits - 1))))
      .withColumn("bit", expr("(h div cast(power(2, i) as bigint)) % 2"))
      .groupBy(col("doc_id"), col("i"))
      .agg(sum(col("tf") * (col("bit") * 2 - 1)).as("s"))
      .withColumn("bitval", when(col("s") > 0, 1L).otherwise(0L))
      .groupBy(col("doc_id"))
      .agg(sum(col("bitval") * expr("cast(power(2, i) as bigint)")).as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming.
    * Quadratic pairing bounded by `idLimit`; the scale path buckets on
    * simhash byte-chunks first (same banding idea as LSH). */
  def simhashPairs(docs: DataFrame, maxHamming: Int, idLimit: Long): DataFrame = {
    val sh = simhash(docs.filter(col("doc_id") < idLimit))
    val a = sh.select(col("doc_id").as("a_id"), col("simhash").as("sh_a"))
    val b = sh.select(col("doc_id").as("b_id"), col("simhash").as("sh_b"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Pairwise n-gram Jaccard similarity over distinct shingle sets:
    * |A∩B| via shingle equi-join, |A∪B| = |A|+|B|−|A∩B|. Bounded by
    * `idLimit`; at scale the LSH candidates above prefilter the pairs
    * and this becomes the verify kernel. */
  def ngramJaccard(docs: DataFrame, w: Int = 3, idLimit: Long = 60,
                   minJaccard: Double = 0.0): DataFrame = {
    val sh = wordShingles(docs.filter(col("doc_id") < idLimit), w)
      .select(col("doc_id"), col("shingle"))
      .distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = sh
      .select(col("doc_id").as("a_id"), col("shingle"))
      .join(sh.select(col("doc_id").as("b_id"), col("shingle")), "shingle")
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), "b_id")
      .withColumn("jaccard", roundn(col("inter") / (col("na") + col("nb") - col("inter")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), col("inter"), col("jaccard"))
  }

  /** Embedding-cosine near-dup detection over the engine's own
    * hashed-TF embeddings, in SPARSE form: since weights are unit-L2,
    * cosine(a,b) = Σ_dim w_a·w_b, i.e. a self-join on the dimension
    * key — the inverted-index formulation that scales (the shuffle
    * key is `dim`, candidate pairs only materialize where docs share
    * dimensions; no dense cross join anywhere). */
  def embeddingNearDup(docs: DataFrame, dim: Int = 64, threshold: Double = 0.95,
                       idLimit: Long = 200): DataFrame = {
    val w = EmbedOps.embedSparse(docs.filter(col("doc_id") < idLimit), dim)
    val a = w.select(col("doc_id").as("a_id"), col("dim"), col("weight").as("wa"))
    val b = w.select(col("doc_id").as("b_id"), col("dim"), col("weight").as("wb"))
    a.join(b, Seq("dim"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(roundn(sum(col("wa") * col("wb")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    * hash every w-shingle, slide a window of `window` consecutive
    * shingle hashes, keep each window's minimum, emit the distinct
    * selected hashes per doc. Robust to small edits — the local-min
    * property survives shifting. */
  def winnowFingerprints(docs: DataFrame, w: Int = 3, window: Int = 4): DataFrame = {
    val sh = wordShingles(docs, w)
    // hash distinct shingles once, join back (same values, |vocab| sha calls)
    val vocab = sh.select(col("shingle")).distinct()
      .withColumn("h", PortableHash.hash24(col("shingle")))
    val hashed = sh.join(vocab, "shingle")
    val frame = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    hashed
      .withColumn("fp", min(col("h")).over(frame))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }
}
