package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The process-boundary codec in the MediaCodec seam. The plumbing —
  * sniff prefilter, refuse-on-any-failure subprocess path, seam
  * composition, chained first-claim-wins — is pinned WITHOUT the binary
  * (this container has none); the real-decode end-to-end runs wherever
  * an ffmpeg binary exists and is `assume`-skipped cleanly otherwise,
  * the x83 posture for environment-gated capability.
  */
class FfmpegCodecSpec extends SparkSpec {

  /** A sniffable-but-fake ISO-BMFF header: enough for the prefilter,
    * nothing any real demuxer could decode.
    */
  private def fakeMp4: Array[Byte] = {
    val b = new Array[Byte](64)
    b(3) = 24
    "ftypisom".getBytes("US-ASCII").copyToArray(b, 4)
    b
  }

  test("sniff: container prefilter claims candidates, refuses garbage and AVI") {
    assert(FfmpegCodec.sniff(fakeMp4), "ISO-BMFF ftyp must sniff true")
    val mkv = Array[Byte](0x1A, 0x45, 0xDF.toByte, 0xA3.toByte) ++ new Array[Byte](16)
    assert(FfmpegCodec.sniff(mkv), "Matroska EBML must sniff true")
    assert(FfmpegCodec.sniff("ID3junkjunkjunk".getBytes("US-ASCII")))
    assert(FfmpegCodec.sniff(Array[Byte](0xFF.toByte, 0xFB.toByte) ++ new Array[Byte](16)),
      "MPEG audio frame sync must sniff true")
    assert(FfmpegCodec.sniff("OggS_padding_pad".getBytes("US-ASCII")))
    assert(FfmpegCodec.sniff("fLaC_padding_pad".getBytes("US-ASCII")))
    assert(!FfmpegCodec.sniff(null))
    assert(!FfmpegCodec.sniff(Array.emptyByteArray))
    assert(!FfmpegCodec.sniff(Array.tabulate[Byte](64)(i => (i * 7).toByte)))
    // AVI is deliberately not sniffed — MjpegAvi.Codec owns it in-JVM
    val avi = MjpegAvi.makeFixture(seed = 1L, w = 16, h = 16, nFrames = 1)
    assert(!FfmpegCodec.sniff(avi), "RIFF/AVI must be left to MjpegAvi")
  }

  test("unstartable binary refuses every row cleanly — never a throw") {
    val c = new FfmpegCodec.Codec("/nonexistent/ffmpeg")
    assert(c.decode("video", fakeMp4).isEmpty)
    assert(c.decode("audio", "ID3junkjunkjunk".getBytes("US-ASCII")).isEmpty)
    assert(c.decode("video", null).isEmpty)
    assert(c.decode("text", fakeMp4).isEmpty)
  }

  test("seam posture: an MP4 nothing can decode stays stub-flagged in-band") {
    import spark.implicits._
    val assets = Seq((1L, "video", fakeMp4)).toDF("asset_id", "media_type", "content")
    // FfmpegCodec.codec is None without a binary (rows never leave the
    // stub); with a binary installed the fake container is sniffed,
    // spawned, and REFUSED by ffmpeg's own exit code — same verdict
    // either way, which is exactly the in-band-flag contract
    val row = Multimodal.extractFeatures(assets,
      externalCodec = FfmpegCodec.codec).collect()(0)
    assert(row.getAs[String]("codec") == "stub")
    assert(row.getAs[Boolean]("is_stub"))
  }

  test("chained: MjpegAvi claims AVI first, unclaimed containers fall through") {
    val avi = MjpegAvi.makeFixture(seed = 5L, w = 16, h = 16, nFrames = 3)
    val got = FfmpegCodec.default.decode("video", avi)
    assert(got.isDefined && got.get._2 == "mjpeg_avi",
      "the in-JVM AVI codec must win the chain without a process hop")
    assert(FfmpegCodec.default.decode("video",
      Array.tabulate[Byte](64)(i => (i * 3).toByte)).isEmpty)
  }

  test("real MP4/H.264 decode end-to-end (skipped without an ffmpeg binary)") {
    assume(FfmpegCodec.available, "no ffmpeg binary on PATH / GRAFT_FFMPEG")
    val ffmpeg = FfmpegCodec.binary.get
    // the binary authors its own fixture: 3 frames of testsrc as H.264
    val dir = java.nio.file.Files.createTempDirectory("graft_ffmpeg_fix")
    val mp4File = dir.resolve("fix.mp4").toFile
    val pb = new ProcessBuilder(ffmpeg, "-v", "error", "-nostdin", "-y",
      "-f", "lavfi", "-i", "testsrc=duration=0.3:size=64x48:rate=10",
      "-pix_fmt", "yuv420p", mp4File.getAbsolutePath)
    pb.redirectErrorStream(true)
    assert(pb.start().waitFor() == 0 && mp4File.length() > 0,
      "fixture encode failed")
    val mp4 = java.nio.file.Files.readAllBytes(mp4File.toPath)
    try {
      val hit = FfmpegCodec.codec.get.decode("video", mp4)
      assert(hit.isDefined, "real MP4 went unclaimed with the binary present")
      val (features, tag) = hit.get
      assert(tag == "ffmpeg")
      assert(features.length == Multimodal.featureDim)
      assert(features.sum > 0.99 && features.sum < 1.01,
        "luma histogram must sum to ~1 — real pixel statistics")
      // end-to-end: the stubbed census class flips is_stub = false
      import spark.implicits._
      val assets = Seq((1L, "video", mp4), (2L, "video", fakeMp4))
        .toDF("asset_id", "media_type", "content")
      val rows = Multimodal.extractFeatures(assets,
          externalCodec = FfmpegCodec.codec)
        .orderBy("asset_id").collect()
      assert(rows(0).getAs[String]("codec") == "ffmpeg")
      assert(!rows(0).getAs[Boolean]("is_stub"))
      assert(rows(1).getAs[String]("codec") == "stub" &&
        rows(1).getAs[Boolean]("is_stub"))
      // claim/refuse discipline with the binary PRESENT: truncation is
      // a refusal, not a claim
      assert(FfmpegCodec.codec.get.decode("video", mp4.take(48)).isEmpty)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
    }
  }
}
