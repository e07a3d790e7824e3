package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * as opaque `binary` columns with typed metadata, batch-shaped
  * decode/feature-extract over partitions.
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (see [[decodeStub]]).
  * Everything around it — the schema contract, binary column handling,
  * partition-parallel batch processing via `mapPartitions`, fixed-size
  * feature output — is real and tested; swapping the stub for a JNI/ffmpeg
  * call changes one function.
  *
  * Scale posture: media blobs dominate storage, so the asset table keeps
  * metadata columns scan-prunable (count/filter without touching bytes —
  * parquet column pruning skips the binary column entirely), and feature
  * extraction is a map-only pass with no shuffle; `repartition` controls
  * decode batch width to bound executor memory against blob size.
  */
object Multimodal {

  /** Asset-table schema: opaque bytes + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", IntegerType),
    StructField("content", BinaryType)))

  /** Derive a deterministic synthetic asset table from `documents` rows
    * (doc_id, text): fake media bytes generated from the row content. Lets
    * the pipeline be exercised end-to-end without real media files.
    */
  def syntheticAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      (pmod(col("doc_id"), lit(64)) * 16 + 64).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) * 16 + 64).cast("int").as("height"),
      (pmod(col("doc_id"), lit(300)) * 100).cast("int").as("duration_ms"),
      // deterministic fake bytes: sha2 of the text, repeated — stands in
      // for an encoded frame; NOT a real codec payload.
      encode(repeat(sha2(col("text"), 256), 4), "UTF-8").as("content"))

  private val featureDim = 16

  /** STUB media decode + feature extraction.
    *
    * ??? REAL IMPLEMENTATION GOES HERE: decode `content` with an image/audio
    * library and run feature extraction. This container has no media codecs,
    * so instead we emit a deterministic fake: `featureDim` doubles derived
    * from the byte stream with a rolling polynomial — the Spark-side
    * contract (binary in, fixed-length vector out, batch-per-partition) is
    * exactly what a real extractor plugs into.
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

  /** Partition-parallel feature extraction: the Scala analogue of a
    * batch-arrow UDF — one iterator pass per partition, no per-row driver
    * involvement, output schema fixed.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("media_type", StringType),
      StructField("feature", ArrayType(DoubleType))))
    val encoder = org.apache.spark.sql.Encoders.row(outSchema)
    assets.select("asset_id", "media_type", "content")
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), r.getString(1), decodeStub(r.getAs[Array[Byte]]("content")).toSeq)
        }
      }(encoder)
  }

  /** Metadata-only scan: proves the binary column is pruned (filters and
    * aggregates on metadata never deserialize `content`).
    */
  def metadataStats(assets: DataFrame): DataFrame =
    assets.groupBy("media_type")
      .agg(count(lit(1)).as("n"),
        max(col("width")).as("max_width"),
        avg(col("duration_ms")).cast("double").as("avg_duration_ms"))
      .orderBy("media_type")

  /** STUB image resize: ??? a real implementation decodes `content`,
    * rescales, re-encodes. The stub emits a deterministic byte slice scaled
    * to the target area so downstream sizing/partitioning logic is
    * exercised with realistic byte-length variation. The Spark contract —
    * metadata recomputed alongside the bytes, map-only, no shuffle — is the
    * real part.
    */
  def resizeStub(content: Array[Byte], w: Int, h: Int,
      targetW: Int, targetH: Int): Array[Byte] = {
    if (content == null || w <= 0 || h <= 0) return Array.emptyByteArray
    val ratio = (targetW.toLong * targetH).toDouble / (w.toLong * h).toDouble
    val n = math.max(1, math.min(content.length, (content.length * ratio).toInt))
    java.util.Arrays.copyOf(content, n)
  }

  /** Resize every image asset to `targetW`×`targetH` (stubbed decode). */
  def resizeImages(assets: DataFrame, targetW: Int, targetH: Int): DataFrame = {
    val fn = udf((c: Array[Byte], w: Int, h: Int) => resizeStub(c, w, h, targetW, targetH))
    assets.filter(col("media_type") === "image")
      // metadata columns are nullable; a primitive-typed UDF null-shorts to
      // NULL output, bypassing the stub's degenerate-dimension fallback —
      // coalesce to 0 so such rows take the documented empty-bytes path
      .withColumn("content",
        fn(col("content"), coalesce(col("width"), lit(0)), coalesce(col("height"), lit(0))))
      .withColumn("width", lit(targetW))
      .withColumn("height", lit(targetH))
  }

  /** STUB video frame sampling: ??? a real implementation seeks the
    * container and decodes one frame per sample point. The stub emits one
    * row per sample timestamp with a deterministic byte slice — the fan-out
    * shape (one asset row → N frame rows via explode, no shuffle) is the
    * real part.
    */
  def sampleFrames(assets: DataFrame, everyMs: Int): DataFrame = {
    require(everyMs > 0,
      s"everyMs ($everyMs) must be positive — sequence() would fail per-row at execution")
    val frameBytes = udf((c: Array[Byte], tMs: Int) =>
      if (c == null || c.isEmpty) Array.emptyByteArray
      else {
        val off = math.abs(tMs) % math.max(1, c.length)
        java.util.Arrays.copyOfRange(c, off, math.min(c.length, off + 64))
      })
    assets.filter(col("media_type") === "video" && col("duration_ms") > 0)
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0), col("duration_ms") - 1, lit(everyMs))))
      .select(col("asset_id"), col("frame_ts_ms"),
        frameBytes(col("content"), col("frame_ts_ms")).as("frame"))
  }
}
