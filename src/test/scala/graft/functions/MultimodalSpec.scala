package graft.functions

import graft.SparkSpec
import Multimodal._

/** Multimodal binary plumbing: schema/Encoder/partition shape is real;
  * only the codec is a deterministic stub (builder brief). */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDs(rows: (Long, Array[Byte])*) =
    rows.toSeq.map { case (id, b) => Media(id, b) }.toDS().repartition(2)

  test("decodeMeta parses the stub header distributed, flags bad blobs") {
    val good = encodeFake("img", 640, 480, 1, Array.fill[Byte](100)(7))
    val bad = Array[Byte](1, 2, 3)
    val metas = decodeMeta(mediaDs(1L -> good, 2L -> bad))
      .collect().sortBy(_.mediaId)
    assert(metas(0) == MediaMeta(1L, "img", 640, 480, 1, 100, valid = true))
    assert(!metas(1).valid && metas(1).format == "unknown")
  }

  test("featurize: L1-normalized 16-bin byte histogram per blob") {
    val payload = Array.tabulate[Byte](160)(i => (i % 256).toByte)
    val blob = encodeFake("img", 1, 1, 1, payload)
    val feats = featurize(mediaDs(5L -> blob)).collect()
    assert(feats.length == 1)
    val f = feats.head.feature
    assert(f.length == 16)
    assert(math.abs(f.sum - 1.0f) < 1e-5, "L1 normalized")
    // bytes 0..159 → high nibbles 0..9, 16 bytes each → 16/160 = 0.1
    assert(f.take(10).forall(v => math.abs(v - 0.1f) < 1e-5))
  }

  test("resize downsamples the pixel grid and re-encodes; output re-decodes") {
    // 4x4 grid with row-major values 0..15; nearest-neighbor to 2x2
    // keeps pixels (0,0),(0,2),(2,0),(2,2) = 0,2,8,10
    val payload = Array.tabulate[Byte](16)(_.toByte)
    val blob = encodeFake("img", 4, 4, 1, payload)
    val out = resize(mediaDs(9L -> blob), newW = 2, newH = 2).collect().head
    assert(decodeHeader(out.bytes).contains(("img", 2, 2, 1, 4)),
      "resized blob re-decodes with the new dimensions")
    assert(payloadOf(out.bytes).toSeq == Seq[Byte](0, 2, 8, 10))
    // undecodable input passes through untouched (PERMISSIVE, like meta)
    val bad = Array[Byte](9, 9)
    val same = resize(mediaDs(10L -> bad), 2, 2).collect().head
    assert(same.bytes.toSeq == bad.toSeq)
    // resized media flows through the downstream operators unchanged
    val meta = decodeMeta(resize(mediaDs(9L -> blob), 2, 2)).collect().head
    assert(meta.width == 2 && meta.height == 2 && meta.valid)
  }

  test("resize is per-frame: multi-frame payloads keep aligned frame boundaries") {
    // 2 frames of a 4x4 grid (values 0..15 and 16..31); per-frame
    // nearest-neighbor to 2x2 keeps offsets {0,2,8,10} within EACH
    // frame's base — a single-grid resize would have read only frame
    // 0's bytes and then handed frameSample misaligned pseudo-frames
    val payload = Array.tabulate[Byte](32)(_.toByte)
    val vid = encodeFake("vid", 4, 4, 2, payload)
    val out = resize(mediaDs(11L -> vid), newW = 2, newH = 2).collect().head
    assert(decodeHeader(out.bytes).contains(("vid", 2, 2, 2, 8)),
      "new dims, SAME frame count, payload = newW*newH*nf bytes")
    assert(payloadOf(out.bytes).toSeq ==
      Seq[Byte](0, 2, 8, 10, 16, 18, 24, 26))
    val frames = frameSample(resize(mediaDs(11L -> vid), 2, 2), everyN = 1)
      .collect().sortBy(_.frameIdx)
    assert(frames.map(_.bytes.toSeq).toSeq ==
      Seq(Seq[Byte](0, 2, 8, 10), Seq[Byte](16, 18, 24, 26)),
      "downstream frameSample slices the resized frames at their boundaries")
  }

  test("frameSample slices every Nth frame of a fake video") {
    val payload = Array.tabulate[Byte](100)(_.toByte)
    val vid = encodeFake("vid", 8, 8, 10, payload)
    val frames = frameSample(mediaDs(9L -> vid), everyN = 3).collect()
      .sortBy(_.frameIdx)
    assert(frames.map(_.frameIdx).toSeq == Seq(0, 3, 6, 9))
    assert(frames.head.bytes.toSeq == payload.slice(0, 10).toSeq)
  }
}
