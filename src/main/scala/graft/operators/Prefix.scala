package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed prefix sum (global cumulative sum in a total order).
  *
  * The naive Spark formulation — `sum(v).over(Window.orderBy(k))` with no
  * partition keys — collapses the whole table into ONE partition
  * (Catalyst plans `Exchange SinglePartition`), which is the canonical
  * 100 TB scale-killer for corpus-wide running totals. This is the
  * classic three-step scan instead:
  *
  *   1. range-partition + sort by the order columns (Spark's distributed
  *      sort — the same machinery as `orderBy`, no single-partition
  *      collapse);
  *   2. one tiny aggregation of per-partition totals (≤ numPartitions
  *      rows to the driver — bounded model state, not data);
  *   3. a map-only pass that seeds each partition with the exclusive
  *      prefix of the totals before it.
  *
  * The sorted frame is pinned with an eager `localCheckpoint` so steps 2
  * and 3 see the SAME partition boundaries (a re-evaluated range
  * partitioning could re-sample bounds between passes). On a real
  * cluster the checkpoint is executor-local storage; for a table too hot
  * to cache, persist the sorted pass to a table and run steps 2–3 over
  * that.
  *
  * No analogue in the reference (its running totals are per-batch Python
  * dict counters — `/root/reference/main_supabase.py:17-56` /
  * `main.py:30-60` stats accumulators);
  * this is the scale-out formulation a training-data pipeline needs for
  * corpus-wide token offsets (sequence packing, x36).
  */
object Prefix {

  /** Adds `outCol` = inclusive running sum of `valueCol` (cast to long)
    * in the total order of `orderCols`. Nulls count as 0.
    *
    * `orderCols` must be a TOTAL order (unique keys, like a document
    * id): tied keys sort in nondeterministic relative order, so their
    * individual running values would differ run to run (only the sum at
    * the end of a tie group is stable).
    */
  def cumsumLong(df: DataFrame, orderCols: Seq[String], valueCol: String,
      outCol: String, numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "cumsum needs a total order")
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ordered = df
      .withColumn(valueCol, coalesce(col(valueCol).cast(LongType), lit(0L)))
      .repartitionByRange(n, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint(true)
    val vIdx = ordered.schema.fieldIndex(valueCol)

    // per-partition totals: ≤ n rows of (pid, sum) — driver-bounded state
    val totals = ordered
      .groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col(valueCol)).as("__s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val parts = ordered.rdd.getNumPartitions
    val offsets = new Array[Long](parts)
    var acc = 0L
    var p = 0
    while (p < parts) {
      offsets(p) = acc
      acc += totals.getOrElse(p, 0L)
      p += 1
    }

    val outSchema = ordered.schema.add(outCol, LongType, nullable = false)
    val bc = spark.sparkContext.broadcast(offsets)
    // mapPartitionsWithIndex, NOT Dataset.mapPartitions + TaskContext
    // .getPartitionId: the task's partition id is stage-level — under a
    // downstream UNION of two cumsum outputs, Spark fuses both sides into
    // one UnionRDD stage whose task indices run past each child's own
    // partition count (caught by PrefixPackSpec's incremental-pack test)
    val out = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
