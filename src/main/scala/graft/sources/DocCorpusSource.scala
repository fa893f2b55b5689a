package graft.sources

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 for the reference's document corpus — the
  * "custom DataSource in a later phase" promised by SURVEY §2 S1/S2:
  *
  *   spark.read.format("graft.sources.DocCorpusSource").load(dir)
  *
  * yields (source, kind, para_idx, text) rows for every `.docx`
  * paragraph and `.pdf` content stream under `dir` (Office lock
  * files skipped — reference app.py:35-36,144; extension checks are
  * CASE-SENSITIVE exactly like the reference's `f.endswith('.pdf')`
  * and [[graft.ops.CorpusOps.uploadSink]]), parsed by the same
  * JDK-only extractors as [[DocxSource]]/[[PdfSource]].
  *
  * Options:
  *  - `recursive` (default true): descend into subdirectories.
  *  - `maxFileBytes` (default 256 MiB): files above the bound yield
  *    NO rows instead of buffering an executor into OOM — per-file
  *    containment, same rule as a corrupt payload.
  *  - `manifest`: path to a parquet metadata table with a `path`
  *    column (and optional `length`) — the LAKE-SCALE alternative to
  *    walking the directory: listing becomes a two-column columnar
  *    scan of the manifest instead of one filesystem RPC per
  *    directory, exactly how table formats (Delta/Iceberg/Hive
  *    manifests) list many-million-file datasets. The filename
  *    acceptance rule still applies; rows without `length` defer the
  *    size bound to the streaming re-check in the reader.
  *
  * Scale shape: listed files BIN-PACK into size-bounded input
  * partitions (the `FilePartition#maxSplitBytes` policy: target =
  * min(maxPartitionBytes, max(openCostInBytes, totalCost/parallelism)),
  * each file costed at length + openCostInBytes) — a million ~10 KB
  * manifest entries schedule as ~thousands of tasks, not a million,
  * while payload bytes are still read and parsed executor-side and
  * never shipped through the driver. The filename filter is applied
  * at LISTING time on the driver, so rejected files are never even
  * scheduled. Per-file containment survives packing: a corrupt,
  * over-limit or vanished file yields zero rows without failing the
  * files sharing its partition. The ScanBuilder implements column
  * pruning —
  * `select(source)` never materializes paragraph text (visible as the
  * narrowed ReadSchema in explain output). The session's Hadoop conf
  * is captured at planning into a [[SerializableConfiguration]] so
  * executor-side opens see the same filesystem settings (S3/ABFS
  * credentials, custom schemes) the driver listed with. Default
  * listing is a driver-side RemoteIterator walk — fine for a
  * documents corpus; at lake scale pass `manifest` and no directory
  * walk happens at all.
  */
class DocCorpusSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocCorpusSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DocCorpusTable(properties.get("path"))
}

object DocCorpusSource {
  val Schema: StructType = StructType(Seq(
    StructField("source", StringType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("para_idx", IntegerType, nullable = false),
    StructField("text", StringType, nullable = false)))

  val DefaultMaxFileBytes: Long = 256L * 1024 * 1024

  /** The reference's exact (case-sensitive) acceptance rule. */
  private[sources] def accepted(name: String): Boolean =
    !name.startsWith("~$") && (name.endsWith(".docx") || name.endsWith(".pdf"))
}

class DocCorpusTable(path: String) extends Table with SupportsRead {
  require(path != null, "DocCorpusSource requires a load(path)")
  override def name(): String = s"graft_doc_corpus($path)"
  override def schema(): StructType = DocCorpusSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocCorpusScanBuilder(path,
      options.getBoolean("recursive", true),
      options.getLong("maxFileBytes", DocCorpusSource.DefaultMaxFileBytes),
      Option(options.get("manifest")))
}

class DocCorpusScanBuilder(path: String, recursive: Boolean, maxFileBytes: Long,
                           manifest: Option[String] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns with Scan with Batch {

  private var required: StructType = DocCorpusSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source-schema field order regardless of projection order
    required = StructType(
      DocCorpusSource.Schema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = this
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    // source identity = path RELATIVE to the load root, not the bare
    // basename: with recursive listing two subdirectories can hold
    // same-named files, and a basename identity would merge them in
    // every downstream dedup/upsert keyed on `source` (flat dirs are
    // unaffected — relative path ≡ basename there)
    def relOf(full: String, rootPrefix: String, name: String): String =
      if (full.startsWith(rootPrefix)) full.substring(rootPrefix.length) else name
    val files: Seq[(String, String, Long)] = manifest match {
      case Some(m) =>
        // lake path: no filesystem walk — (path[, length]) come from
        // the metadata table; the load root only anchors identities.
        // Paths may be qualified URIs or plain with varying spellings
        // (file:///x vs file:/x, authority-qualified vs not), so each
        // manifest path is NORMALIZED through Path(..).toString —
        // which collapses those spellings — and compared against both
        // the plain and the makeQualified form of the root: a
        // qualified 'file:/root/x.pdf' against a plain root '/root'
        // must still yield the relative identity, or two same-named
        // files in different subdirs merge downstream. Paths matching
        // neither prefix fall back to basename identity with ONE
        // aggregated warning (per-row logging on a million-file
        // manifest would drown the driver log).
        // Real metadata tables carry nullable columns: null paths are
        // unlistable (dropped), null lengths coalesce to the -1
        // unknown-length sentinel the reader stream-checks.
        val plainPrefix =
          (try new Path(path).toString catch { case _: Exception => path })
            .stripSuffix("/") + "/"
        val qualPrefix =
          try {
            val p = new Path(path)
            p.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .makeQualified(p).toString.stripSuffix("/") + "/"
          } catch { case _: Exception => plainPrefix }
        val df = spark.read.parquet(m)
        val withLen =
          if (df.schema.fieldNames.contains("length"))
            df.selectExpr("path", "coalesce(CAST(length AS LONG), CAST(-1 AS LONG)) AS length")
          else df.selectExpr("path", "CAST(-1 AS LONG) AS length") // unknown: reader stream-checks
        var basenameFallbacks = 0L
        var fallbackExample: String = null
        val listed = withLen.where("path IS NOT NULL").collect().toSeq.map { r =>
          val full = r.getString(0)
          val norm = try new Path(full).toString catch { case _: Exception => full }
          val name = norm.substring(norm.lastIndexOf('/') + 1)
          val rel =
            if (norm.startsWith(plainPrefix)) norm.substring(plainPrefix.length)
            else if (norm.startsWith(qualPrefix)) norm.substring(qualPrefix.length)
            else {
              basenameFallbacks += 1
              if (fallbackExample == null) fallbackExample = full
              name
            }
          (full, rel, r.getLong(1), name)
        }.collect { case (full, rel, len, name) if DocCorpusSource.accepted(name) =>
          (full, rel, len)
        }
        if (basenameFallbacks > 0)
          org.slf4j.LoggerFactory.getLogger(classOf[DocCorpusScanBuilder]).warn(
            s"$basenameFallbacks manifest path(s) outside load root '$path' fell back to " +
              s"BASENAME identity (e.g. '$fallbackExample') — same-named files in different " +
              "directories will merge downstream; anchor the load root above all manifest paths")
        listed
      case None =>
        val p = new Path(path)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val rootPrefix = fs.makeQualified(p).toString.stripSuffix("/") + "/"
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
        val it = fs.listFiles(p, recursive)
        while (it.hasNext) {
          val st = it.next()
          val full = st.getPath.toString
          if (DocCorpusSource.accepted(st.getPath.getName))
            out += ((full, relOf(full, rootPrefix, st.getPath.getName), st.getLen))
        }
        out.toSeq
    }
    // bin-pack sorted files into size-bounded partitions (the
    // FilePartition#maxSplitBytes policy): a million small files must
    // not become a million tasks. Each file costs its length plus the
    // per-open constant; unknown lengths (-1) cost the open constant
    // only — the reader's streaming bound still contains each file.
    val openCost = confBytes(spark, "spark.sql.files.openCostInBytes", 4L * 1024 * 1024)
    val maxPartitionBytes =
      confBytes(spark, "spark.sql.files.maxPartitionBytes", 128L * 1024 * 1024)
    val sorted = files.sortBy(_._2)
    val totalCost = sorted.iterator.map { case (_, _, len) => math.max(len, 0L) + openCost }.sum
    val minPartitions = math.max(1, spark.sparkContext.defaultParallelism)
    val target =
      math.min(maxPartitionBytes, math.max(openCost, totalCost / minPartitions))
    val bins = scala.collection.mutable.ArrayBuffer.empty[InputPartition]
    var cur = scala.collection.mutable.ArrayBuffer.empty[DocFileRef]
    var curSize = 0L
    for ((f, rel, len) <- sorted) {
      val cost = math.max(len, 0L) + openCost
      if (cur.nonEmpty && curSize + cost > target) {
        bins += DocFilePartition(cur.toSeq)
        cur = scala.collection.mutable.ArrayBuffer.empty[DocFileRef]
        curSize = 0L
      }
      cur += DocFileRef(f, rel, len)
      curSize += cost
    }
    if (cur.nonEmpty) bins += DocFilePartition(cur.toSeq)
    bins.toArray
  }

  /** Byte-suffixed size conf ("128MB" / "134217728b" / plain). */
  private def confBytes(spark: SparkSession, key: String, default: Long): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get(key, default.toString))
    catch { case _: Exception => default }

  override def createReaderFactory(): PartitionReaderFactory =
    // capture the SESSION Hadoop conf for executor-side opens — a
    // fresh Configuration() there would drop session-configured
    // filesystem settings and resolve paths differently than the
    // driver-side listing did
    new DocReaderFactory(required.fieldNames,
      new SerializableConfiguration(SparkSession.active.sparkContext.hadoopConfiguration),
      maxFileBytes)
}

case class DocFileRef(file: String, relPath: String, length: Long)

/** One scheduled task = one size-bounded BIN of files. */
case class DocFilePartition(files: Seq[DocFileRef]) extends InputPartition

class DocReaderFactory(fieldNames: Array[String], conf: SerializableConfiguration,
                       maxFileBytes: Long) extends PartitionReaderFactory {
  /** Permanent not-found conditions across filesystem implementations:
    * typed not-found exceptions anywhere in the cause chain, or an
    * object-store IOException whose message carries 404 semantics. */
  private[sources] def isNotFound(e: Throwable): Boolean = {
    var t = e
    var depth = 0
    while (t != null && depth < 8) {
      t match {
        case _: java.io.FileNotFoundException => return true
        case _: java.nio.file.NoSuchFileException => return true
        case _ =>
      }
      val msg = Option(t.getMessage).getOrElse("").toLowerCase(java.util.Locale.ROOT)
      if (msg.contains("404") || msg.contains("not found") ||
          msg.contains("nosuchkey") || msg.contains("does not exist")) return true
      t = t.getCause
      depth += 1
    }
    false
  }
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[DocFilePartition]
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[InternalRow] =
        part.files.iterator.flatMap(readFile)

      /** Per-file containment INSIDE a packed bin: an over-limit or
        * VANISHED file (deleted/renamed between listing and read —
        * a permanent condition retries cannot cure) yields zero rows
        * without failing the other files sharing its partition, with
        * a warning naming it. Transient IO failures (connection
        * reset, socket timeout) PROPAGATE so Spark's task retry gets
        * its chance — swallowing them would be silent data loss. */
      private def readFile(ref: DocFileRef): Iterator[InternalRow] = {
        // bounded-buffer rule: an over-limit file yields zero rows
        // (checked against the listed length AND re-checked while
        // streaming, in case the file grew after listing)
        if (ref.length > maxFileBytes) Iterator.empty
        else {
          val bytes =
            try {
              val p = new Path(ref.file)
              val fs = p.getFileSystem(conf.value)
              val in = fs.open(p)
              try {
                val out = new java.io.ByteArrayOutputStream()
                val buf = new Array[Byte](65536)
                var total = 0L
                var n = in.read(buf)
                while (n >= 0 && total <= maxFileBytes) {
                  out.write(buf, 0, n); total += n; n = in.read(buf)
                }
                if (total > maxFileBytes) Array.emptyByteArray else out.toByteArray
              } finally in.close()
            } catch {
              // not-found surfaces differently per filesystem: local /
              // HDFS / S3A raise FileNotFoundException, java.nio-backed
              // stores NoSuchFileException, and some object-store
              // connectors a generic IOException carrying 404 semantics
              // in the message — all are the same permanent "vanished
              // between listing and read" condition a task retry cannot
              // cure, so all are contained per-file. Any other
              // IOException still propagates for Spark's task retry.
              case e: java.io.IOException if isNotFound(e) =>
                org.slf4j.LoggerFactory.getLogger(classOf[DocReaderFactory])
                  .warn(s"listed file vanished before read, yielding no rows: ${ref.file}", e)
                Array.emptyByteArray
            }
          val name = ref.relPath
          val isPdf = name.endsWith(".pdf")
          val texts =
            if (bytes.isEmpty) Seq.empty
            else if (isPdf) PdfSource.extractStreams(bytes).filter(_.trim.nonEmpty).map(_.trim)
            else DocxSource.parseDocx(bytes)
          val kind = if (isPdf) "pdf" else "docx"
          texts.iterator.zipWithIndex.map { case (text, idx) =>
            InternalRow.fromSeq(fieldNames.toSeq.map {
              case "source" => UTF8String.fromString(name)
              case "kind" => UTF8String.fromString(kind)
              case "para_idx" => idx
              case "text" => UTF8String.fromString(text)
            })
          }
        }
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
