package graft.sources

import graft.SparkSpec
import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

class DocCorpusSourceSpec extends SparkSpec {
  import spark.implicits._

  import TestFixtures.{makeDocx, makePdf}

  private def corpusDir(): String = {
    val dir = Files.createTempDirectory("doc_corpus").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new java.io.File(dir, name)); f.write(bytes); f.close()
    }
    write("a.docx", makeDocx(Seq("alpha one", "beta two")))
    write("b.pdf", makePdf("BT (pdf text here) Tj ET"))
    write("~$a.docx", "lock".getBytes) // skipped
    write("notes.txt", "plain".getBytes) // skipped
    dir.getAbsolutePath
  }

  test("DSv2 source reads docx paragraphs and pdf streams across packed partitions") {
    val df = spark.read.format("graft.sources.DocCorpusSource").load(corpusDir())
    val rows = df.collect().map(r =>
      (r.getString(0), r.getString(1), r.getInt(2), r.getString(3))).toSet
    assert(rows === Set(
      ("a.docx", "docx", 0, "alpha one"),
      ("a.docx", "docx", 1, "beta two"),
      ("b.pdf", "pdf", 0, "pdf text here")))
    // two accepted files, each costing ~openCostInBytes: the packer
    // keeps them parallel (2 bins), never exceeding the file count
    assert(df.rdd.getNumPartitions === 2)
  }

  test("column pruning reaches the custom scan (text absent from ReadSchema)") {
    val df = spark.read.format("graft.sources.DocCorpusSource").load(corpusDir())
      .select("source", "kind")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("source") && !plan.contains("text"))
    assert(df.distinct().collect().length === 2)
  }

  test("recursive listing descends into subdirectories; recursive=false stays flat") {
    val dir = Files.createTempDirectory("doc_corpus_nested").toFile
    val sub = new java.io.File(dir, "2026/q1"); sub.mkdirs()
    def write(parent: java.io.File, name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new java.io.File(parent, name)); f.write(bytes); f.close()
    }
    write(dir, "top.docx", makeDocx(Seq("top para")))
    write(sub, "deep.docx", makeDocx(Seq("deep para")))
    // same basename as top.docx: the relative-path identity must keep
    // them distinct (a basename identity would merge them in every
    // downstream dedup/upsert keyed on `source`)
    write(sub, "top.docx", makeDocx(Seq("shadow para")))
    val all = spark.read.format("graft.sources.DocCorpusSource")
      .load(dir.getAbsolutePath)
    assert(all.select("source").collect().map(_.getString(0)).toSet
      === Set("top.docx", "2026/q1/deep.docx", "2026/q1/top.docx"))
    val flat = spark.read.format("graft.sources.DocCorpusSource")
      .option("recursive", "false").load(dir.getAbsolutePath)
    assert(flat.select("source").collect().map(_.getString(0)).toSet === Set("top.docx"))
  }

  test("large files parse through the chunked read; over-limit files are contained") {
    val dir = Files.createTempDirectory("doc_corpus_big").toFile
    // incompressible (LCG-generated) payload so the FILE on disk is
    // > 64 KB and the read crosses several 64 KB chunks
    var seed = 12345L
    val bigText = Array.fill(200000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ('a' + ((seed >>> 33) % 26)).toChar
    }.mkString
    val big = makeDocx(Seq(bigText, "tail para"))
    assert(big.length > 65536) // the stored docx itself exceeds one read chunk
    val f = new FileOutputStream(new java.io.File(dir, "big.docx")); f.write(big); f.close()
    val df = spark.read.format("graft.sources.DocCorpusSource").load(dir.getAbsolutePath)
    val texts = df.select("text").collect().map(_.getString(0))
    assert(texts.exists(_.length === 200000) && texts.contains("tail para"))
    // an over-limit file yields zero rows, not an executor OOM/throw
    val bounded = spark.read.format("graft.sources.DocCorpusSource")
      .option("maxFileBytes", "128").load(dir.getAbsolutePath)
    assert(bounded.collect().isEmpty)
  }

  test("extension checks are case-sensitive, matching the reference and uploadSink") {
    val dir = Files.createTempDirectory("doc_corpus_case").toFile
    def write(name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new java.io.File(dir, name)); f.write(bytes); f.close()
    }
    write("ok.pdf", makePdf("BT (lower) Tj ET"))
    write("SHOUT.PDF", makePdf("BT (upper) Tj ET")) // rejected: .PDF != .pdf
    val names = spark.read.format("graft.sources.DocCorpusSource")
      .load(dir.getAbsolutePath).select("source").collect().map(_.getString(0)).toSet
    assert(names === Set("ok.pdf"))
  }

  test("manifest listing: 10k synthetic paths plan without any driver directory walk") {
    // the load root does NOT exist — a listing walk would throw; the
    // manifest must be the only path source
    val mDir = Files.createTempDirectory("doc_manifest").toFile
    val mPath = new java.io.File(mDir, "manifest.parquet").getAbsolutePath
    (0 until 10000).map(i => (s"/no/such/root/part=${i % 64}/doc_$i.pdf", 1000L + i))
      .toDF("path", "length").write.parquet(mPath)
    val sb = new DocCorpusScanBuilder("/no/such/root", recursive = true,
      maxFileBytes = DocCorpusSource.DefaultMaxFileBytes, manifest = Some(mPath))
    val parts = sb.planInputPartitions()
    val refs = parts.flatMap(_.asInstanceOf[DocFilePartition].files)
    // every manifested file is scheduled exactly once, but packed into
    // size-bounded bins — NOT one task per file
    assert(refs.length === 10000)
    assert(parts.length < 1000, s"10k files must bin-pack, got ${parts.length} partitions")
    // identity is load-root-relative; declared length carried through
    val p0 = refs.head
    assert(p0.relPath.startsWith("part=") && p0.length >= 1000L)
  }

  test("bin-packing: 1000 small files plan into at most cores*4 partitions") {
    val mDir = Files.createTempDirectory("doc_manifest_pack").toFile
    val mPath = new java.io.File(mDir, "m.parquet").getAbsolutePath
    (0 until 1000).map(i => (s"/no/such/root/doc_$i.pdf", 10000L))
      .toDF("path", "length").write.parquet(mPath)
    val sb = new DocCorpusScanBuilder("/no/such/root", recursive = true,
      maxFileBytes = DocCorpusSource.DefaultMaxFileBytes, manifest = Some(mPath))
    // the packer follows the session's file confs (the test host has
    // few cores, so lift the 128 MB cap to let parallelism dominate)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
    val parts =
      try sb.planInputPartitions()
      finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    val cores = spark.sparkContext.defaultParallelism
    assert(parts.flatMap(_.asInstanceOf[DocFilePartition].files).length === 1000)
    assert(parts.length <= math.max(1, cores) * 4,
      s"1000 small files -> ${parts.length} partitions (cores=$cores)")
    // a bin never splits one file: per-file containment is preserved
    assert(parts.forall(_.asInstanceOf[DocFilePartition].files.nonEmpty))
  }

  test("manifest rows with null path or null length are contained, not NPEs") {
    val dir = corpusDir()
    val mDir = Files.createTempDirectory("doc_manifest_null").toFile
    val mPath = new java.io.File(mDir, "m.parquet").getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(s"$dir/b.pdf", null), // null length -> -1 sentinel
      org.apache.spark.sql.Row(null, 123L))          // null path -> dropped
    spark.createDataFrame(rows, schema).write.parquet(mPath)
    val out = spark.read.format("graft.sources.DocCorpusSource")
      .option("manifest", mPath).load(dir)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out === Set(("b.pdf", "pdf text here")))
  }

  test("qualified-URI manifest paths keep load-root-relative identities") {
    val dir = Files.createTempDirectory("doc_corpus_qual").toFile
    val sub = new java.io.File(dir, "sub"); sub.mkdirs()
    def write(parent: java.io.File, name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new java.io.File(parent, name)); f.write(bytes); f.close()
    }
    // same basename in root and subdir: a basename fallback would
    // merge them downstream — the collision the relative identity
    // exists to prevent
    write(dir, "x.pdf", makePdf("BT (root doc) Tj ET"))
    write(sub, "x.pdf", makePdf("BT (sub doc) Tj ET"))
    val mDir = Files.createTempDirectory("doc_manifest_qual").toFile
    val mPath = new java.io.File(mDir, "m.parquet").getAbsolutePath
    Seq(s"file:${dir.getAbsolutePath}/x.pdf", s"file:${dir.getAbsolutePath}/sub/x.pdf")
      .toDF("path").write.parquet(mPath)
    val rows = spark.read.format("graft.sources.DocCorpusSource")
      .option("manifest", mPath).load(dir.getAbsolutePath) // PLAIN root vs file: paths
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("x.pdf", "root doc"), ("sub/x.pdf", "sub doc")))
  }

  test("triple-slash and other URI spellings normalize to load-root-relative identities") {
    val dir = Files.createTempDirectory("doc_corpus_slash").toFile
    val sub = new java.io.File(dir, "sub"); sub.mkdirs()
    def write(parent: java.io.File, name: String, bytes: Array[Byte]): Unit = {
      val f = new FileOutputStream(new java.io.File(parent, name)); f.write(bytes); f.close()
    }
    write(dir, "y.pdf", makePdf("BT (root y) Tj ET"))
    write(sub, "y.pdf", makePdf("BT (sub y) Tj ET"))
    val mDir = Files.createTempDirectory("doc_manifest_slash").toFile
    val mPath = new java.io.File(mDir, "m.parquet").getAbsolutePath
    // file:///x (triple slash) does not string-prefix-match either the
    // plain root or makeQualified's file:/x — only Path normalization
    // keeps the relative identity (pre-fix these merged on basename)
    Seq(s"file://${dir.getAbsolutePath}/y.pdf", s"file://${dir.getAbsolutePath}/sub/y.pdf")
      .toDF("path").write.parquet(mPath)
    val rows = spark.read.format("graft.sources.DocCorpusSource")
      .option("manifest", mPath).load(dir.getAbsolutePath)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("y.pdf", "root y"), ("sub/y.pdf", "sub y")))
  }

  test("isNotFound: typed + message-sniffed not-found contained, transient IO not") {
    val rf = new DocReaderFactory(Array("source"),
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration), 1000L)
    assert(rf.isNotFound(new java.io.FileNotFoundException("gone")))
    assert(rf.isNotFound(new java.nio.file.NoSuchFileException("/x")))
    // object-store style: generic IOException with 404 semantics, or
    // a not-found wrapped as a cause
    assert(rf.isNotFound(new java.io.IOException("GET /b/k: 404 NoSuchKey")))
    assert(rf.isNotFound(new java.io.IOException("wrapper",
      new java.io.FileNotFoundException("inner"))))
    // transient conditions must PROPAGATE for task retry
    assert(!rf.isNotFound(new java.io.IOException("Connection reset by peer")))
    assert(!rf.isNotFound(new java.net.SocketTimeoutException("read timed out")))
  }

  test("a vanished manifested file is contained; files sharing its bin still read") {
    val dir = corpusDir()
    val mDir = Files.createTempDirectory("doc_manifest_gone").toFile
    val mPath = new java.io.File(mDir, "m.parquet").getAbsolutePath
    Seq(s"$dir/b.pdf", s"$dir/ghost.pdf") // ghost.pdf was never written
      .toDF("path").write.parquet(mPath)
    val rows = spark.read.format("graft.sources.DocCorpusSource")
      .option("manifest", mPath).load(dir)
      .select("source").collect().map(_.getString(0)).toSet
    assert(rows === Set("b.pdf")) // FileNotFound contained, not a task failure
  }

  test("manifest is authoritative: only manifested files read, walk-visible files ignored") {
    val dir = corpusDir()
    val mDir = Files.createTempDirectory("doc_manifest2").toFile
    val mPath = new java.io.File(mDir, "m.parquet").getAbsolutePath
    // list ONLY b.pdf (a.docx is on disk but not manifested); also a
    // lock file and a .txt to prove the acceptance rule still applies,
    // and no `length` column to exercise the unknown-length path
    Seq(s"$dir/b.pdf", s"$dir/~$$a.docx", s"$dir/notes.txt")
      .toDF("path").write.parquet(mPath)
    val rows = spark.read.format("graft.sources.DocCorpusSource")
      .option("manifest", mPath).load(dir)
      .select("source", "text").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("b.pdf", "pdf text here")))
  }
}
