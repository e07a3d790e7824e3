package graft.operators

import java.io.File
import java.nio.file.Files
import java.util.concurrent.TimeUnit

/** Process-boundary media codec for the [[Multimodal.MediaCodec]] seam:
  * MP4/H.264 (and anything else ffmpeg demuxes — Matroska, MP3, OGG,
  * FLAC, M4A) decoded by shelling out to an `ffmpeg` binary, the exact
  * posture the reference takes for ITS media ingestion (extractor.py:21-58
  * runs the feed client as a subprocess rather than linking a protocol
  * library). The subprocess boundary is deliberate: codec crashes can't
  * take an executor JVM down, licensing stays outside the artifact, and
  * the binary is swappable per deployment.
  *
  * Detection is explicit and safe-by-absence: [[codec]] returns None when
  * no binary is found (env `GRAFT_FFMPEG`, else `ffmpeg` on PATH), and a
  * seam fed None leaves rows on the deterministic flagged-stub path —
  * exactly the behavior the frozen oracles pin in environments without
  * the binary. With the binary present, a claimed container flips
  * `is_stub = false` and carries tag "ffmpeg"; anything ffmpeg cannot
  * decode (garbage, truncation, wrong stream type) is REFUSED back to
  * the stub, the same claim/refuse discipline [[MjpegAvi.Codec]] pins.
  *
  * Decode contract (deterministic for a fixed binary build):
  *  - video → the FIRST video frame (`select eq(n,0)` — no duration
  *    probe, so one subprocess per asset) rendered to PNG, then the same
  *    public [[Multimodal.imageFeaturesTagged]] luma-histogram path every
  *    real image takes — no second feature implementation;
  *  - audio → the first audio stream transcoded to canonical PCM WAV,
  *    then [[Multimodal.audioFeaturesTagged]]'s windowed RMS.
  *
  * Scale posture: the codec runs per row ON THE EXECUTORS inside
  * [[Multimodal.extractFeatures]]'s mapPartitions — the driver never sees
  * content bytes; a 1000-executor cluster runs 1000+ ffmpeg processes in
  * parallel with per-call working dirs and a hard wall-clock cap, and the
  * [[sniff]] prefilter keeps obvious non-containers from paying the
  * process spawn at all.
  */
object FfmpegCodec {

  /** Per-call subprocess wall-clock cap. A codec that hangs on adversarial
    * input must fail the ROW, not wedge the executor core.
    */
  private val TimeoutSec = 60L

  /** Resolve the binary: `GRAFT_FFMPEG` (explicit deployments), else
    * `ffmpeg` on PATH. Checked once per JVM — the result only says the
    * file exists and is executable; a broken binary still refuses rows
    * one at a time through the normal exit-code path.
    */
  lazy val binary: Option[String] = {
    val explicit = sys.env.get("GRAFT_FFMPEG").filter(_.nonEmpty)
    val candidates = explicit.toSeq ++ sys.env.getOrElse("PATH", "")
      .split(File.pathSeparatorChar).filter(_.nonEmpty)
      .map(p => s"$p${File.separatorChar}ffmpeg")
    candidates.find(p => { val f = new File(p); f.isFile && f.canExecute })
  }

  def available: Boolean = binary.isDefined

  /** The installable codec — None when no binary exists, so
    * `extractFeatures(assets, externalCodec = FfmpegCodec.codec)` is
    * correct to write unconditionally: rows stay stub-flagged in
    * binary-less environments.
    */
  def codec: Option[Multimodal.MediaCodec] = binary.map(new Codec(_))

  /** Cheap container sniff so garbage never pays a process spawn. This is
    * a PREFILTER, not the authority — ffmpeg's own exit code and output
    * are what claim a row. Recognized: ISO-BMFF (`ftyp` at offset 4:
    * MP4/M4A/MOV), Matroska/WebM, MPEG audio (ID3 tag or frame sync),
    * OGG, FLAC. RIFF/AVI is deliberately ABSENT: [[MjpegAvi.Codec]] owns
    * that container in-JVM and a chained ffmpeg must not shadow it.
    */
  private[operators] def sniff(content: Array[Byte]): Boolean = {
    if (content == null || content.length < 12) return false
    def at(i: Int) = content(i) & 0xFF
    val ftyp = at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p'
    val mkv = at(0) == 0x1A && at(1) == 0x45 && at(2) == 0xDF && at(3) == 0xA3
    val id3 = at(0) == 'I' && at(1) == 'D' && at(2) == '3'
    // MPEG frame sync: a bare FF Ex prefix matches too many non-media
    // files — any UTF-16LE BOM (FF FE) validates byte-for-byte as an
    // MPEG1 Layer-I header, so at billions of rows that whole class of
    // text would pay a process spawn each. Validate the reserved
    // version/layer/bitrate/samplerate fields AND require a SECOND
    // frame sync within the first 2 KB (adjacent MPEG audio frames sit
    // ≤ ~1.5 KB apart at any legal bitrate/samplerate pair; text that
    // happens to start FF Ex essentially never repeats the pattern).
    def syncAt(i: Int): Boolean =
      i + 3 < content.length &&
        at(i) == 0xFF && (at(i + 1) & 0xE0) == 0xE0 &&
        ((at(i + 1) >> 3) & 3) != 1 && // version 01 reserved
        ((at(i + 1) >> 1) & 3) != 0 && // layer 00 reserved
        (at(i + 2) >> 4) != 0xF && // bitrate index 1111 invalid
        ((at(i + 2) >> 2) & 3) != 3 // samplerate index 11 reserved
    // Free-format streams (bitrate index 0) have no bitrate-implied frame
    // bound — a legal frame can exceed 2 KB — so widen the second-sync
    // window to 64 KB when the FIRST header is free-format (the spec caps
    // free-format at 320 kbps ⇒ ≤ ~17 KB/frame at 8 kHz Layer II; 64 KB
    // is comfortably past it while still rejecting sync-less text).
    // Single-frame clips shorter than one frame remain rejected by
    // design: a one-frame "file" is indistinguishable from FF-Ex-prefixed
    // binary noise at sniff time, and the decode it skips is one frame.
    val freeFormat = content.length > 2 && (at(2) >> 4) == 0
    val window = if (freeFormat) 65536 else 2048
    val mpegSync = syncAt(0) &&
      (21 until math.min(content.length - 3, window)).exists(syncAt)
    val ogg = at(0) == 'O' && at(1) == 'g' && at(2) == 'g' && at(3) == 'S'
    val flac = at(0) == 'f' && at(1) == 'L' && at(2) == 'a' && at(3) == 'C'
    ftyp || mkv || id3 || mpegSync || ogg || flac
  }

  final class Codec(ffmpeg: String) extends Multimodal.MediaCodec {
    override def decode(mediaType: String, content: Array[Byte])
        : Option[(Array[Double], String)] = {
      if (content == null || !sniff(content)) return None
      mediaType match {
        case "video" => run(content, "frame.png", Seq("-map", "0:v:0",
            "-vf", "select=eq(n\\,0)", "-frames:v", "1",
            "-f", "image2", "-c:v", "png")).flatMap { png =>
            val (f, inner) = Multimodal.imageFeaturesTagged(png)
            // a decode that came back un-renderable is a refusal, not a
            // claim with zero features
            if (inner == "undecodable" || inner == "empty") None
            else Some((f, "ffmpeg"))
          }
        case "audio" => run(content, "audio.wav", Seq("-map", "0:a:0",
            "-acodec", "pcm_s16le", "-f", "wav")).flatMap { wav =>
            val (f, inner) = Multimodal.audioFeaturesTagged(wav)
            if (inner == "undecodable" || inner == "empty") None
            else Some((f, "ffmpeg"))
          }
        case _ => None
      }
    }

    /** One bounded subprocess: bytes → private working dir → ffmpeg →
      * output bytes. Any failure mode — nonzero exit, timeout (process
      * killed), missing/empty output, unstartable binary — is None; the
      * working dir is always removed.
      */
    private def run(content: Array[Byte], outName: String,
        args: Seq[String]): Option[Array[Byte]] = {
      var dir: File = null
      var proc: Process = null
      try {
        dir = Files.createTempDirectory("graft_ffmpeg").toFile
        val in = new File(dir, "in.bin")
        Files.write(in.toPath, content)
        val out = new File(dir, outName)
        val cmd = Seq(ffmpeg, "-v", "error", "-nostdin", "-y",
          "-i", in.getAbsolutePath) ++ args :+ out.getAbsolutePath
        val pb = new ProcessBuilder(cmd: _*)
        pb.redirectErrorStream(true)
        pb.redirectOutput(new File(dir, "log.txt"))
        proc = pb.start()
        val done = proc.waitFor(TimeoutSec, TimeUnit.SECONDS)
        if (!done) { proc.destroyForcibly(); return None }
        if (proc.exitValue() != 0 || !out.isFile || out.length() == 0) None
        else Some(Files.readAllBytes(out.toPath))
      } catch {
        case _: java.io.IOException => None // binary vanished / unstartable
        case e: InterruptedException =>
          Thread.currentThread().interrupt(); None
      } finally {
        // await the kill before removing the working dir: destroyForcibly
        // is async, and deleting files a dying ffmpeg still holds open
        // leaks the directory (accumulating on long-lived executors fed
        // adversarial inputs). SIGKILL needs no cooperation — a short
        // bounded wait suffices; if even that fails, skip the delete
        // rather than strand a half-removed tree.
        if (proc != null && proc.isAlive) {
          proc.destroyForcibly()
          try proc.waitFor(5, TimeUnit.SECONDS)
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt() }
        }
        if (dir != null && (proc == null || !proc.isAlive))
          org.apache.commons.io.FileUtils.deleteQuietly(dir)
        else if (dir != null)
          // ffmpeg survived SIGKILL + 5 s (uninterruptible I/O) — park the
          // dir for the per-executor orphan sweep instead of leaking it
          // permanently on a long-lived executor
          Codec.orphans.add(dir)
        // retry earlier parked dirs now; their processes are long dead
        Codec.sweepOrphans()
      }
    }
  }

  object Codec {
    /** Working dirs whose ffmpeg outlived the forced kill: retried on
      * every later decode on the same executor, and at JVM exit.
      */
    private[operators] val orphans =
      new java.util.concurrent.ConcurrentLinkedQueue[File]
    sys.addShutdownHook(sweepOrphans())
    private[operators] def sweepOrphans(): Unit = {
      // one pass over the entries present at sweep start: a still-pinned
      // dir re-enqueues for the NEXT sweep, never re-polls in this one
      var n = orphans.size()
      while (n > 0) {
        n -= 1
        val d = orphans.poll()
        if (d != null &&
            !org.apache.commons.io.FileUtils.deleteQuietly(d) && d.exists())
          orphans.add(d)
      }
    }
  }

  /** First-claim-wins codec chain: the in-JVM [[MjpegAvi.Codec]] keeps
    * AVI (no process hop for a container we decode natively), ffmpeg —
    * when installed — takes what's left. The shape a deployment installs
    * as `extractFeatures(assets, externalCodec = Some(FfmpegCodec
    * .default))`.
    */
  def chained(codecs: Seq[Multimodal.MediaCodec]): Multimodal.MediaCodec =
    new Multimodal.MediaCodec {
      override def decode(mediaType: String, content: Array[Byte])
          : Option[(Array[Double], String)] =
        codecs.iterator.map(_.decode(mediaType, content))
          .collectFirst { case Some(hit) => hit }
    }

  def default: Multimodal.MediaCodec =
    chained(Seq(MjpegAvi.Codec) ++ codec.toSeq)
}
