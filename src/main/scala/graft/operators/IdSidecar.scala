package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.sinks.MergeEngine

/** Id-hash-bucketed stored-id sidecar — the table that makes a store's
  * REPLAY PROBE O(increment + touched buckets) instead of O(store).
  *
  * Both persisted search stores dedup streaming arrivals against their
  * stored ids (checkpoint replay must heal, not double-index). The
  * natural probe — semi-join the increment against the main data
  * table's id column — scans the WHOLE store every trigger: measured in
  * `ScaleProbe datadom6`, the 5k-vector trigger wall grew 5.6 → 6.5 s
  * from a 1M- to a 2M-row store, i.e. a per-trigger cost term linear in
  * store size that a 100 ms-cadence ingest cannot carry at billions of
  * rows. The main tables cannot re-partition to fix it (`cid`/`tb`
  * layouts are what make SEARCH pruning work), so the store keeps this
  * slim sidecar — ids only, partitioned by `ib = pmod(xxhash64(id),
  * buckets)`, the [[Dedup.streamingMinhashDedup]] `sb`/`bb` state-store
  * discipline — and the probe reads only the increment's own buckets:
  * a literal `ib IN (…)` partition filter, ≤ min(|increment|, buckets)
  * partitions (plan-guarded in the store specs). The pruning pays off
  * exactly in the high-cadence regime that needs it: a 200-row trigger
  * against a 4096-bucket billion-row store reads ≤ 200/4096 ≈ 5% of the
  * ids; a bulk million-row backfill touches every bucket and amortizes
  * the scan over its own size.
  *
  * The bucket count is FROZEN per store at first append, sized from the
  * seed corpus (`buckets ≈ nIds / 4096`, clamped to [16, 4096]) and
  * persisted in `ids_meta` — a fixture-sized store writes 16 small
  * directories instead of thousands of near-empty files (a fixed 1024
  * cost every save 4-7× in the sf0.1 bench), while a billion-row store
  * gets the full pruning factor. Later appends MUST bucket with the
  * stored modulus, which is why it rides the store and not a parameter.
  *
  * Commit-order contract (the [[LexIndexStore.appendCorpus]]
  * doclens-first rationale, one level up): the sidecar is the probe
  * AUTHORITY, so it is appended FIRST in every grow path. A crash after
  * the sidecar append but before the data appends leaves the batch's
  * ids recorded-but-dataless — the replay skips them and the batch
  * degrades to absent-from-search (clean loss: no table ever counts
  * it), instead of the reverse order's re-appended DUPLICATE data rows,
  * which would corrupt every future search and aggregate. Tombstoned
  * ids stay in the sidecar until purge — a deleted id's re-arrival is
  * filtered while its rows are still stored, and re-enters only after
  * [[purge]] physically drops it (the existing re-arrival contract).
  *
  * Pre-sidecar stores (no `ids/` table) fall back to the exact
  * full-scan probe — older indexes keep working, they just pay the old
  * cost until rebuilt.
  */
private[graft] object IdSidecar {

  private[graft] def path(indexPath: String) = s"$indexPath/ids"
  private[graft] def metaPath(indexPath: String) = s"$indexPath/ids_meta"

  private[graft] def ib(idCol: String, buckets: Int): Column =
    pmod(xxhash64(col(idCol)), lit(buckets.toLong))

  /** Seed-corpus sizing: ~4096 ids per bucket, clamped so fixture-sized
    * stores stay at 16 directories and even a 100B-row store caps at
    * 4096 (a probe's `ib IN (…)` literal must stay driver-trivial).
    */
  private def sizeBuckets(nIds: Long): Int =
    math.min(4096L, math.max(16L, nIds / 4096L)).toInt

  private def readBuckets(spark: SparkSession, indexPath: String,
      engine: MergeEngine): Option[Int] =
    engine.read(spark, metaPath(indexPath)).map(_.select("buckets").head().getInt(0))

  /** Record `ids` (idCol only) into the sidecar. Call FIRST in every
    * grow path — see the commit-order contract above. The first append
    * (the store build) freezes the bucket modulus from its own row
    * count and persists it; every later append reuses it.
    */
  def append(indexPath: String, ids: DataFrame, idCol: String,
      engine: MergeEngine): Unit = {
    require(idCol != "ib",
      "id column may not be named 'ib' (reserved for the sidecar bucket)")
    val spark = ids.sparkSession
    val buckets = readBuckets(spark, indexPath, engine).getOrElse {
      val b = sizeBuckets(ids.count())
      val schema = StructType(Seq(StructField("buckets", IntegerType,
        nullable = false)))
      engine.overwrite(spark, metaPath(indexPath), spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(b)), schema).coalesce(1))
      b
    }
    engine.appendPartitioned(path(indexPath),
      ids.select(col(idCol)).withColumn("ib", ib(idCol, buckets))
        .repartition(col("ib")), "ib")
  }

  /** The increment's already-stored ids — [[Dedup.presentIds]] over the
    * bucket-pruned sidecar when it exists, over `fallback` (the main
    * table) when it does not. The `ib` value set is collected to the
    * driver (≤ the stored bucket count) and pushed as a literal
    * partition filter, so the stored-id scan reads only the increment's
    * buckets.
    */
  def presentIds(spark: SparkSession, indexPath: String,
      fallback: => DataFrame, increment: DataFrame, idCol: String,
      engine: MergeEngine): DataFrame =
    (readBuckets(spark, indexPath, engine),
      engine.read(spark, path(indexPath))) match {
      case (Some(buckets), Some(ids)) =>
        val ibs = increment.select(ib(idCol, buckets).as("ib")).distinct()
          .collect().map(_.getLong(0)).toSeq
        Dedup.presentIds(
          ids.filter(col("ib").isin(ibs: _*)).select(col(idCol)),
          increment, idCol)
      case _ => Dedup.presentIds(fallback, increment, idCol)
    }

  /** Physically drop purged ids — O(touched buckets), the
    * [[MergeEngine.replacePartitions]] machinery the main tables' purge
    * already uses. No-op on sidecar-less stores.
    */
  def purge(spark: SparkSession, indexPath: String, deletedIds: DataFrame,
      idCol: String, engine: MergeEngine): Unit =
    (readBuckets(spark, indexPath, engine),
      engine.read(spark, path(indexPath))) match {
      case (Some(buckets), Some(ids)) =>
        val touched = deletedIds.select(ib(idCol, buckets).as("ib"))
          .distinct().collect().map(_.get(0)).toSeq
        if (touched.nonEmpty) {
          val kept = ids.filter(col("ib").isin(touched: _*))
            .join(deletedIds.select(col(idCol)).distinct(), Seq(idCol),
              "left_anti")
            .localCheckpoint(true)
          try engine.replacePartitions(spark, path(indexPath), kept, "ib",
            touched)
          finally Dedup.releaseLocalCheckpoint(kept)
        }
      case _ => ()
    }

  /** Small-file maintenance alongside the stores' own [[MergeEngine
    * .compact]] passes. No-op on sidecar-less stores.
    */
  def compact(spark: SparkSession, indexPath: String, engine: MergeEngine,
      targetBytes: Long): Unit =
    if (engine.read(spark, path(indexPath)).isDefined)
      engine.compact(spark, path(indexPath), targetBytes)
}
