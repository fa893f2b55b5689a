package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. The engine's stance (per the project brief): media
  * payloads are opaque `binary` columns with typed metadata; the
  * Spark-side machinery — schema, partition sizing, per-partition
  * batch shape, UDF signatures — is real and tested, while the
  * codec-dependent decode step is STUBBED deterministically (no
  * image/audio libraries exist in this environment).
  *
  * Scale notes: rows carry megabyte-class payloads, so operators
  * must (a) never collect, (b) bound partition byte-size not row
  * count — callers repartition by `media_id` with
  * `spark.sql.files.maxPartitionBytes` sized so one partition's
  * payloads fit an executor's working memory, and (c) keep payloads
  * out of shuffles: every op below is map-only (narrow), metadata
  * joins happen on the skinny (id, meta) projection.
  */
object MultimodalOps {

  /** One media row: payload + typed metadata (width/height for image,
    * sampleRate/frames for audio/video; unused fields are -1). */
  case class MediaRow(media_id: Long, modality: String, content: Array[Byte],
                      width: Int, height: Int, sample_rate: Int, n_frames: Int)

  case class MediaFeature(media_id: Long, modality: String, n_bytes: Long,
                          histogram: Array[Double])

  case class DecodedMeta(media_id: Long, modality: String, decoded_width: Int,
                         decoded_height: Int, ok: Boolean)

  case class FrameSample(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Byte-histogram featurization: a REAL (library-free) feature
    * extractor over the binary payload — per-row n-bin normalized
    * histogram, computed per partition (the batch shape a Pandas-UDF
    * / ONNX-runtime stage would use: iterate a partition, reuse
    * buffers, emit rows). Map-only; no shuffle. */
  def featurize(media: Dataset[MediaRow], nBins: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition reusable buffer — the pattern that matters at
      // scale (allocate once per partition, not per row)
      val counts = new Array[Long](nBins)
      it.map { row =>
        java.util.Arrays.fill(counts, 0L)
        var i = 0
        while (i < row.content.length) {
          counts(((row.content(i) & 0xff) * nBins) / 256) += 1
          i += 1
        }
        val total = math.max(1L, row.content.length.toLong)
        MediaFeature(row.media_id, row.modality, row.content.length.toLong,
          counts.map(_.toDouble / total))
      }
    }
  }

  /** Decode step — REAL for images: `javax.imageio` (JDK-built-in,
    * zero new dependencies) parses PNG/JPEG/GIF/BMP payloads to their
    * true pixel dimensions, inside the same mapPartitions batch shape
    * a GPU/codec stage would use. Dimensions come from the format
    * READER'S HEADER (`getWidth(0)`/`getHeight(0)`), never a full
    * `ImageIO.read` — a decompression bomb (KB-sized file declaring
    * 50000×50000 pixels) would otherwise allocate the whole pixel
    * buffer and OOM the executor. Undecodable, empty, or non-image
    * payloads (audio/video — no JDK codec) are CONTAINED as ok=false
    * rows (the empty-text guard analog, reference app_callapi.py:112),
    * never an executor-killing throw; a real deployment swaps its
    * pixel decode into the same spot, bounding width×height first. */
  def decodeImage(media: Dataset[MediaRow]): Dataset[DecodedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init: keep ImageIO off its disk scratch cache —
      // per-row temp-file churn on executors for zero benefit
      javax.imageio.ImageIO.setUseCache(false)
      it.map { row =>
        if (row.content.isEmpty) DecodedMeta(row.media_id, row.modality, 0, 0, ok = false)
        else
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(row.content))
            try {
              val readers = javax.imageio.ImageIO.getImageReaders(iis)
              if (!readers.hasNext) DecodedMeta(row.media_id, row.modality, 0, 0, ok = false)
              else {
                val r = readers.next()
                try {
                  r.setInput(iis)
                  // header-only; a bounded `r.read(0)` goes here when
                  // pixel work is needed
                  DecodedMeta(row.media_id, row.modality, r.getWidth(0), r.getHeight(0),
                    ok = true)
                } finally r.dispose()
              }
            } finally if (iis != null) iis.close()
          } catch {
            case _: Exception => DecodedMeta(row.media_id, row.modality, 0, 0, ok = false)
          }
      }
    }
  }

  /** Frame sampling: every `stride`-th fixed-size block of the
    * payload becomes a "frame" (the video-keyframe-extraction shape:
    * one wide row in, several narrower rows out, still map-only). */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      Iterator.range(0, math.max(0, row.content.length - frameBytes + 1), frameBytes * stride)
        .zipWithIndex
        .map { case (off, idx) =>
          FrameSample(row.media_id, idx, java.util.Arrays.copyOfRange(row.content, off, off + frameBytes))
        }
    }
  }

  /** Skinny metadata projection for joins/aggregation — payloads must
    * never enter a shuffle; join on this instead. */
  def metadataOf(media: Dataset[MediaRow]): DataFrame =
    media.toDF().select(col("media_id"), col("modality"), col("width"),
      col("height"), col("sample_rate"), col("n_frames"),
      length(col("content")).cast("long").as("n_bytes"))

  /** Synthesize a deterministic media table from the documents table
    * (text bytes as payload) — the test/bench substrate given this
    * environment has no real media files. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      (col("doc_id") % 640 + 1).cast("int").as("width"),
      (col("doc_id") % 480 + 1).cast("int").as("height"),
      lit(16000).as("sample_rate"),
      (col("n_chars") % 100 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }
}
