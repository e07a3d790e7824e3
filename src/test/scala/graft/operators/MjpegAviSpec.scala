package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The first REAL codec in the MediaCodec seam: MJPEG/AVI demux, JPEG
  * frame decode, claim/refuse discipline, and the end-to-end is_stub
  * flip through [[Multimodal.extractFeatures]].
  */
class MjpegAviSpec extends SparkSpec {

  test("mux → demux round trip: frame payloads byte-identical, order kept") {
    val encoded = Seq(
      MjpegAvi.encodeJpeg(Array.fill(6 * 4)(0xFF0000), 6, 4),
      MjpegAvi.encodeJpeg(Array.fill(6 * 4)(0x00FF00), 6, 4),
      MjpegAvi.encodeJpeg(Array.fill(6 * 4)(0x0000FF), 6, 4))
    // the RIFF odd-size pad-byte path is load-bearing and must actually
    // run: if every encoded frame happens to come out even-length, pad
    // one payload to odd (demux treats payloads as opaque bytes, so the
    // round trip still proves byte fidelity INCLUDING the pad handling)
    val frames =
      if (encoded.exists(_.length % 2 == 1)) encoded
      else encoded.updated(1, encoded(1) :+ 0x00.toByte)
    assert(frames.exists(_.length % 2 == 1),
      "no odd-length frame — the pad path would go unexercised")
    val avi = MjpegAvi.mux(frames, 6, 4)
    val got = MjpegAvi.demux(avi)
    assert(got.isDefined && got.get.length == 3)
    got.get.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "demuxed frame differs from muxed")
    }
  }

  test("codec claims real MJPEG/AVI with the middle frame's REAL luma histogram") {
    val fixture = MjpegAvi.makeFixture(seed = 42L, w = 32, h = 24, nFrames = 5)
    val claimed = MjpegAvi.Codec.decode("video", fixture)
    assert(claimed.isDefined, "real MJPEG/AVI went unclaimed")
    val (features, tag) = claimed.get
    assert(tag == "mjpeg_avi")
    // independent re-derivation: demux ourselves, decode frame 2 of 5
    // through the same public image path — the codec adds NO second
    // feature implementation
    val frames = MjpegAvi.demux(fixture).get
    val (expected, inner) = Multimodal.imageFeaturesTagged(frames(2))
    assert(inner == "imageio", s"middle frame decoded via '$inner'")
    assert(features.toSeq == expected.toSeq)
    assert(features.sum > 0.99 && features.sum < 1.01,
      "luma histogram must sum to ~1 — these are real pixel statistics")
  }

  test("codec refuses: wrong media type, garbage, truncation, broken frame bytes") {
    val fixture = MjpegAvi.makeFixture(seed = 7L, w = 16, h = 16, nFrames = 3)
    // the seam offers every stubbed row; only video AVIs are this codec's
    assert(MjpegAvi.Codec.decode("audio", fixture).isEmpty)
    assert(MjpegAvi.Codec.decode("video", Array.tabulate[Byte](64)(i => (i * 3).toByte)).isEmpty)
    assert(MjpegAvi.Codec.decode("video", Array.emptyByteArray).isEmpty)
    assert(MjpegAvi.Codec.decode("video", null).isEmpty)
    // a structural lie (truncation inside movi) discards the WHOLE
    // container — a half-readable AVI is corrupt, not claimable
    assert(MjpegAvi.demux(fixture.dropRight(50)).isEmpty)
    assert(MjpegAvi.Codec.decode("video", fixture.dropRight(50)).isEmpty)
    // valid RIFF walk but JPEG payloads corrupted past the SOI marker:
    // the inner decode failure must surface as unclaimed, never a throw
    val corrupt = fixture.clone()
    val soi = fixture.indexOfSlice(Seq(0xFF.toByte, 0xD8.toByte))
    var i = soi + 4
    while (i < math.min(corrupt.length, soi + 400)) { corrupt(i) = 0x55; i += 1 }
    val verdict = MjpegAvi.Codec.decode("video", corrupt) // must not throw
    assert(verdict.isEmpty || verdict.get._2 == "mjpeg_avi")
  }

  test("demux is a total function under fuzz: truncations and bit flips never throw") {
    val fixture = MjpegAvi.makeFixture(seed = 3L, w = 20, h = 12, nFrames = 2)
    (0 until fixture.length by 97).foreach { cut =>
      MjpegAvi.demux(java.util.Arrays.copyOf(fixture, cut)) // any result, no throw
    }
    val rnd = new scala.util.Random(1234)
    (0 until 200).foreach { _ =>
      val mutated = fixture.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      MjpegAvi.demux(mutated)
    }
  }

  test("extractFeatures end-to-end: AVI flips off the stub path ONLY with the codec installed") {
    import spark.implicits._
    val assets = Seq(
      (1L, "video", MjpegAvi.makeFixture(9L, 24, 16, 3)),
      (2L, "video", Array.tabulate[Byte](80)(i => (i * 7).toByte)))
      .toDF("asset_id", "media_type", "content")
    val without = Multimodal.extractFeatures(assets)
      .select("asset_id", "codec", "is_stub").orderBy("asset_id").collect()
    assert(without.forall(_.getBoolean(2)),
      "without the codec every non-GFV1 video must stay stub-flagged")
    val withCodec = Multimodal.extractFeatures(assets, Some(MjpegAvi.Codec))
      .select("asset_id", "codec", "is_stub").orderBy("asset_id").collect()
    assert(withCodec(0).getString(1) == "mjpeg_avi" && !withCodec(0).getBoolean(2))
    assert(withCodec(1).getString(1) == "stub" && withCodec(1).getBoolean(2),
      "garbage must stay flagged even with the codec installed")
  }
}
