package graft.sinks

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, LogicalPlan, Project, Repartition}
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.StructType

/** Driver-side parquet writer for DRIVER-LOCAL frames — the scalar/model
  * tables every store commit rides (1-row meta, ids_meta, doclens_sub
  * subtotals, centroid/codebook matrices, pack state). Routing those
  * through `df.write.parquet` launches a full Spark job (task scheduling,
  * commit protocol, one executor task) to move a handful of rows that are
  * ALREADY on the driver; at a streaming store's per-trigger cadence the
  * job launch is the cost, not the bytes — the public Delta/Iceberg
  * posture (commit metadata is written by the driver, only DATA moves
  * through the cluster). The file is produced by Spark's OWN
  * [[ParquetWriteSupport]] (same schema/type mapping as an executor
  * write), so readers cannot tell the difference.
  *
  * Only frames whose optimized plan bottoms out in a non-empty
  * [[LocalRelation]] qualify ([[localRows]]); everything else keeps the
  * distributed write. Empty frames stay on the Spark path too, so the
  * (file-count) shape of an empty-table commit is byte-identical to the
  * historical behavior.
  */
private[sinks] object LocalParquet {

  /** Row cap: these are scalar/model tables by construction; a plan that
    * somehow carries more is data and belongs on the executor path.
    */
  private val MaxRows = 65536

  /** (schema, rows) when `df` is a driver-local non-empty frame of at
    * most [[MaxRows]] rows — descending through the no-op wrappers the
    * call sites add (`coalesce(1)` = non-shuffle Repartition; aliasing
    * Projects are NOT descended: a projection changes row layout).
    */
  def localRows(df: DataFrame): Option[(StructType, Seq[InternalRow])] = {
    def descend(p: LogicalPlan): Option[Seq[InternalRow]] = p match {
      case r: Repartition if !r.shuffle => descend(r.child)
      case lr: LocalRelation if lr.data.nonEmpty && lr.data.length <= MaxRows =>
        Some(lr.data)
      case _ => None
    }
    descend(df.queryExecution.optimizedPlan).map((df.schema, _))
  }

  private def codecOf(spark: SparkSession): CompressionCodecName =
    (try spark.conf.get("spark.sql.parquet.compression.codec")
     catch { case _: Throwable => "snappy" }).toLowerCase match {
      case "none" | "uncompressed" => CompressionCodecName.UNCOMPRESSED
      case "gzip"                  => CompressionCodecName.GZIP
      case "lz4"                   => CompressionCodecName.LZ4
      case "lz4raw" | "lz4_raw"    => CompressionCodecName.LZ4_RAW
      case "zstd"                  => CompressionCodecName.ZSTD
      case "brotli"                => CompressionCodecName.BROTLI
      case _                       => CompressionCodecName.SNAPPY
    }

  private final class Builder(p: Path)
      extends ParquetWriter.Builder[InternalRow, Builder](p) {
    override def getWriteSupport(conf: Configuration) = new ParquetWriteSupport
    override def self(): Builder = this
  }

  /** Write `rows` as ONE parquet file at `file` (driver-side, no job).
    * The writer Configuration is stamped by the SAME
    * [[org.apache.spark.sql.execution.datasources.parquet.ParquetUtils]]
    * `prepareWrite` an executor-side parquet write runs through, so every
    * session setting the schema converter and write support read
    * (legacy-format flag, timestamp type, field ids, rebase modes) is
    * present with its session value.
    */
  def write(spark: SparkSession, schema: StructType, rows: Seq[InternalRow],
      file: Path, hadoopConf: Configuration): Unit = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      new Configuration(hadoopConf))
    val sqlConf = spark.sessionState.conf
    org.apache.spark.sql.execution.datasources.parquet.ParquetUtils
      .prepareWrite(sqlConf, job, schema,
        new org.apache.spark.sql.execution.datasources.parquet.ParquetOptions(
          Map.empty[String, String], sqlConf))
    val w = new Builder(file)
      .withConf(job.getConfiguration)
      .withCompressionCodec(codecOf(spark))
      .build()
    try rows.foreach(w.write) finally w.close()
  }
}
