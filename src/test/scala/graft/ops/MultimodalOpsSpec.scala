package graft.ops

import graft.SparkSpec
import graft.ops.MultimodalOps._
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    MediaRow(0L, "image", Array.tabulate(256)(_.toByte), 640, 480, -1, -1),
    MediaRow(1L, "audio", Array.fill(64)(0.toByte), -1, -1, 16000, -1),
    MediaRow(2L, "video", Array[Byte](), -1, -1, -1, 0)
  ).toDS()

  test("featurize: normalized byte histogram per row, empty payload safe") {
    val f = featurize(media, nBins = 16).collect().map(r => r.media_id -> r).toMap
    assert(math.abs(f(0L).histogram.sum - 1.0) < 1e-9) // uniform bytes → sums to 1
    assert(f(0L).histogram.forall(h => math.abs(h - 1.0 / 16) < 1e-9))
    assert(f(1L).histogram.head === 1.0) // all zero bytes in bin 0
    assert(f(2L).histogram.sum === 0.0) // empty payload → zero histogram, no NaN
  }

  test("decodeStub: deterministic fake dims; empty payload flagged not ok") {
    val d = decodeStub(media).collect().map(r => r.media_id -> r).toMap
    assert(d(0L).ok && d(0L).decoded_width === ((0 & 0xff) << 4) + 16)
    assert(!d(2L).ok)
    val d2 = decodeStub(media).collect().map(r => r.media_id -> r).toMap
    assert(d(0L) === d2(0L)) // deterministic across runs
  }

  test("frameSample: fixed-size frames at stride, short payloads yield none") {
    val frames = frameSample(media, frameBytes = 32, stride = 2).collect()
    val byId = frames.groupBy(_.media_id)
    assert(byId(0L).forall(_.frame.length === 32))
    assert(byId(0L).map(_.frame_idx).sorted.toSeq === (0 until byId(0L).length))
    assert(!byId.contains(2L))
  }

  test("metadataOf is payload-free and carries measured sizes") {
    val m = metadataOf(media)
    assert(!m.columns.contains("content"))
    assert(m.filter($"media_id" === 0).head().getAs[Long]("n_bytes") === 256L)
  }

  test("syntheticMedia round-trips documents into typed media rows") {
    val docs = Seq((0L, "hello world", "en", "s0", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = syntheticMedia(spark, docs).collect().head
    assert(m.modality === "image")
    assert(new String(m.content, "UTF-8") === "hello world")
  }
}
