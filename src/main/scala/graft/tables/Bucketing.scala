package graft.tables

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for co-located fact-fact joins — the 100 TB
  * answer to the one shuffle the engine cannot broadcast away
  * (q19's orders⋈lineitem shape).
  *
  * Writing both fact tables bucketed AND bucket-sorted by the join key
  * means a later join on that key reads matching buckets pairwise: no
  * Exchange on either side (guarded in BucketingSpec), and the per-bucket
  * sort order removes the Sort too. At 100 TB that converts the
  * dominant repeated cost of a join-heavy workload into a one-time
  * layout cost at ingest — the same trade the reference's Postgres makes
  * with its btree indexes, re-expressed as file layout.
  *
  * Bucket-count sizing: both sides must use the SAME count (Spark joins
  * bucket i with bucket i); pick so each bucket of the larger table is a
  * few hundred MB at target scale (e.g. 100 TB / 4096 buckets ≈ 25 GB
  * per bucket per table — still splittable within the bucket by parquet
  * row groups for read parallelism).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed parquet table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (its bucket spec rides in the catalog). */
  def read(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
