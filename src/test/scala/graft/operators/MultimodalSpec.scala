package graft.operators

import graft.SparkTestBase
import graft.operators.Multimodal._

/** Multimodal plumbing: binary payloads flow through the batch-shaped
  * mapPartitions pipeline with per-modality decode (stub) and frame
  * sampling semantics. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private def mk(id: Long, mod: String, payload: String) =
    MediaRow(id, mod, payload.getBytes("UTF-8"))

  test("decodeFeatures: per-modality shapes; deterministic across runs") {
    val ds = Seq(
      mk(1, "image", "image-bytes-payload"),
      mk(2, "audio", "audio-bytes-payload"),
      mk(3, "video", "video-bytes-payload")
    ).toDS()
    val out = decodeFeatures(ds).collect().sortBy(_.media_id)
    val Array(img, aud, vid) = out
    assert(img.n_frames == 1 && img.width >= 16 && img.height >= 16)
    assert(aud.width == 0 && aud.height == 0 && aud.n_frames == 0)
    assert(vid.n_frames >= 1 && vid.n_frames <= 240)
    assert(out.forall(_.n_bytes > 0))
    // determinism: same inputs, same features
    val again = decodeFeatures(ds).collect().sortBy(_.media_id)
    assert(out.toSeq == again.toSeq)
  }

  test("sampleFrames: 4 evenly-strided frames for video, 1 image, 0 audio") {
    val ds = Seq(
      mk(1, "video", "0123456789abcdef"),
      mk(2, "image", "xyz"),
      mk(3, "audio", "pcm")
    ).toDS()
    val frames = sampleFrames(ds).collect()
      .groupBy(_.media_id).view.mapValues(_.sortBy(_.frame_idx)).toMap
    assert(frames(1L).map(_.frame_idx).sameElements(Array(0L, 1L, 2L, 3L)))
    assert(frames(2L).map(_.frame_idx).sameElements(Array(0L)))
    assert(!frames.contains(3L))
    // frame fingerprints differ (different byte ranges)
    assert(frames(1L).map(_.fp).distinct.length == 4)
  }

  test("payload fingerprint matches the md5-hex convention") {
    val payload = "known-payload"
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(payload.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16)
    val out = decodeFeatures(Seq(mk(9, "image", payload)).toDS()).head()
    assert(out.fp == expected)
  }

  test("decodeSamples reads back the planted waveform in order with " +
      "sign intact") {
    import Multimodal.WavCodec
    val id = 123L
    val samples = WavCodec.decodeSamples(WavCodec.synthWav(id))
    assert(samples.length == 256 + (id % 256).toInt)
    samples.zipWithIndex.foreach { case (s, t) =>
      assert(s == WavCodec.synthAmp(id, t), s"t=$t")
    }
  }

  test("dHash is invariant to a global brightness shift and moves at " +
      "most one bit for the single-pixel variant") {
    import Multimodal.PhashCodec
    // ids 80..86 share base 10 with variants 0..6 (global shifts) —
    // identical hashes; id 87 (variant 7) flips at most bit (0,0)
    val base = PhashCodec.dhash(PhashCodec.synthPng(80L))
    (81L to 86L).foreach { id =>
      assert(PhashCodec.dhash(PhashCodec.synthPng(id)) == base, id)
    }
    val v7 = PhashCodec.dhash(PhashCodec.synthPng(87L))
    assert(java.lang.Long.bitCount(base ^ v7) <= 1)
    // a different base produces a genuinely different hash
    val other = PhashCodec.dhash(PhashCodec.synthPng(160L))
    assert(java.lang.Long.bitCount(base ^ other) > 3)
  }

  test("native MediaVecHash bit-equals the composed transform form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.ColumnBridge.{column, expression}
    import graft.functions.TextFunctions.md5Hash60
    val texts = Seq("hello media", "", "émoji 🚀 bytes", "x" * 300)
    val df = texts.toDF("t")
    val composed = transform(sequence(lit(0), lit(15)), i =>
      ((md5Hash60(concat(col("t"), lit(":"), i)) % 2001 - 1000) / 1000.0)
        .cast("float"))
    val native = column(graft.expr.MediaVecHash(expression(col("t")), 16))
    val rows = df.select(composed.as("c"), native.as("n")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Float](0) == r.getSeq[Float](1),
        s"composed=${r.getSeq[Float](0)} native=${r.getSeq[Float](1)}")
    }
  }
}
