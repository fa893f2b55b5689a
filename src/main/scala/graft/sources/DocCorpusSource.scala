package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 for the reference's document corpus — the
  * "custom DataSource in a later phase" promised by SURVEY §2 S1/S2:
  *
  *   spark.read.format("graft.sources.DocCorpusSource").load(dir)
  *
  * yields (source, kind, para_idx, text) rows for every `.docx`
  * paragraph and `.pdf` content stream under `dir` (Office lock
  * files skipped — reference app.py:35-36,144), parsed by the same
  * JDK-only extractors as [[DocxSource]]/[[PdfSource]].
  *
  * Scale shape: one input partition PER FILE (Spark schedules files
  * across executors; payload bytes are read and parsed executor-side,
  * never shipped through the driver), and the ScanBuilder implements
  * column pruning — `select(source)` never materializes paragraph
  * text (visible as the narrowed ReadSchema in explain output).
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
}

class DocCorpusTable(path: String) extends Table with SupportsRead {
  require(path != null, "DocCorpusSource requires a load(path)")
  override def name(): String = s"graft_doc_corpus($path)"
  override def schema(): StructType = DocCorpusSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocCorpusScanBuilder(path)
}

class DocCorpusScanBuilder(path: String)
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
    val p = new Path(path)
    val fs = p.getFileSystem(SparkSession.active.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile)
      .map(_.getPath.toString)
      .filter { f =>
        val n = f.substring(f.lastIndexOf('/') + 1)
        !n.startsWith("~$") &&
          (n.toLowerCase.endsWith(".docx") || n.toLowerCase.endsWith(".pdf"))
      }
      .sorted
      .map(f => DocFilePartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new DocReaderFactory(required.fieldNames)
}

case class DocFilePartition(file: String) extends InputPartition

class DocReaderFactory(fieldNames: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[DocFilePartition].file
    new PartitionReader[InternalRow] {
      private lazy val rows: Iterator[InternalRow] = {
        val p = new Path(file)
        val fs = p.getFileSystem(new Configuration())
        val in = fs.open(p)
        val bytes =
          try {
            val out = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
            out.toByteArray
          } finally in.close()
        val name = file.substring(file.lastIndexOf('/') + 1)
        val isPdf = name.toLowerCase.endsWith(".pdf")
        val texts =
          if (isPdf) PdfSource.extractStreams(bytes).filter(_.trim.nonEmpty).map(_.trim)
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
      private var current: InternalRow = _
      override def next(): Boolean =
        if (rows.hasNext) { current = rows.next(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
