package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parquet-table sinks with the reference's merge semantics (SURVEY §2.6):
  *
  *  - U1/U2 `upsert`      — keyed last-wins overwrite (sessions/drivers:
  *    /root/reference/supabase_loader.py:182-249, loader.py:202-251);
  *  - U3 `coalescingUpsert` — per-column COALESCE(new, old) partial merge
  *    (lap_data: /root/reference/loader.py:262-277) — the non-standard merge
  *    that is this engine's core sink correctness target;
  *  - U4 `append`         — plain append (positions/telemetry/race
  *    control/weather: loader.py:288-358).
  *
  * Vanilla Spark has no MERGE on parquet, so upserts are read-merge-write
  * with an atomic directory swap. Precedence is explicit: every stored row
  * carries `_seq` (monotone per arrival: micro-batch id × 2^20 + in-batch
  * line id) and merges keep the last non-null per key in `_seq` order —
  * which makes batch replay IDEMPOTENT: re-merging rows with equal `_seq`
  * cannot change the last-non-null outcome. That converts the streaming
  * at-least-once delivery of foreachBatch into effectively-once table
  * contents (the reference, by contrast, double-inserts on crash-replay).
  *
  * Scale posture: read-merge-write rewrites the table, which is fine for
  * dimension-sized tables (sessions/drivers/laps — what U1–U3 serve). The
  * high-volume tables (telemetry/positions) are APPEND-only, partitioned by
  * date at 100 TB, and never rewritten. A production deployment would swap
  * this class for Delta/Iceberg MERGE with identical call sites.
  */
object TableSink {

  /** Attach the arrival-order sequence column. */
  def withSeq(batch: DataFrame, batchId: Long, lineIdCol: String = "line_id"): DataFrame =
    batch.withColumn("_seq", lit(batchId) * lit(1L << 20) + col(lineIdCol))

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def readIfExists(spark: SparkSession, path: String): Option[DataFrame] =
    if (exists(spark, path)) Some(spark.read.parquet(path)) else None

  /** Atomic-ish replace: write to `<path>.staging`, then swap directories.
    * (HDFS/posix rename is atomic per directory; object stores would use a
    * manifest commit — out of scope here.)
    */
  private def replaceTable(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val staging = path + ".staging"
    df.write.mode(SaveMode.Overwrite).parquet(staging)
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(path)
    val tmpOld = new Path(path + ".old")
    if (fs.exists(tmpOld)) fs.delete(tmpOld, true)
    if (fs.exists(target)) fs.rename(target, tmpOld)
    fs.rename(new Path(staging), target)
    fs.delete(tmpOld, true)
  }

  /** U1/U2 — keyed upsert, whole-row last-wins by `_seq`. */
  def upsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    val all = readIfExists(spark, path) match {
      case Some(existing) => existing.unionByName(batch, allowMissingColumns = true)
      case None           => batch
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_seq").desc)
    val merged = all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
    replaceTable(merged, path)
  }

  /** U3 — coalescing upsert: per-column last-non-null in `_seq` order
    * across existing + incoming rows of each key.
    */
  def coalescingUpsert(spark: SparkSession, path: String, batch: DataFrame,
      keys: Seq[String]): Unit = {
    val all = readIfExists(spark, path) match {
      case Some(existing) => existing.unionByName(batch, allowMissingColumns = true)
      case None           => batch
    }
    val valueCols = all.columns.filterNot(c => keys.contains(c) || c == "_seq")
    val frame = Window.partitionBy(keys.map(col): _*).orderBy(col("_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val latest = Window.partitionBy(keys.map(col): _*).orderBy(col("_seq").desc)
    val merged = all
      .select(keys.map(col) ++ Seq(col("_seq")) ++
        valueCols.map(c => last(col(c), ignoreNulls = true).over(frame).as(c)): _*)
      .withColumn("_rn", row_number().over(latest))
      .filter(col("_rn") === 1).drop("_rn")
    replaceTable(merged, path)
  }

  /** U4 — plain append. High-volume path: no read, no rewrite. */
  def append(path: String, batch: DataFrame): Unit =
    batch.write.mode(SaveMode.Append).parquet(path)

  /** A9/A2 — append only keys not already in the table: in-batch dedup
    * (first wins) + left-anti join against existing keys. Reads only the
    * key column of the existing table (column pruning), so the probe stays
    * cheap even on a large table; at 100 TB this would be partition-pruned
    * by session/date first.
    */
  def dedupAppend(spark: SparkSession, path: String, batch: DataFrame,
      key: String): Unit = {
    val inBatch = batch.dropDuplicates(key)
    val fresh = readIfExists(spark, path) match {
      case Some(existing) =>
        inBatch.join(existing.select(col(key)), Seq(key), "left_anti")
      case None => inBatch
    }
    fresh.write.mode(SaveMode.Append).parquet(path)
  }
}
