package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
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
    // numPartitions=0 (the default) leaves the count to AQE: a
    // range-repartition WITHOUT an explicit number is REPARTITION_BY_COL,
    // which AQE's partition coalescing is allowed to shrink by DATA SIZE
    // (adjacent ranges merge, so partitions stay contiguous in the total
    // order — the invariant steps 2–3 need). The old default pinned
    // `spark.sql.shuffle.partitions` partitions into the checkpoint, so
    // every downstream read of a tiny cumsum paid a core-count-sized map
    // stage (round-17, guide §2 scale-adaptive partitioning).
    val base = df
      .withColumn(valueCol, coalesce(col(valueCol).cast(LongType), lit(0L)))
    val ordered = (if (numPartitions > 0)
        base.repartitionByRange(numPartitions, orderCols.map(col): _*)
      else base.repartitionByRange(orderCols.map(col): _*))
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

  /** Ceiling on collected per-(partition, key) totals — the driver-side
    * state is O(partitions + distinct keys), which is only "bounded
    * model state" under the bounded-key contract. Far above any
    * legitimate caller (sources × splits × languages ≪ 100k) and far
    * below driver-OOM territory, so a violation fails fast with the
    * contract named instead of an undiagnosed OOM at scale.
    */
  val MaxKeyedTotals: Int = 100000

  /** Null-safe key encoding shared by the driver-side offsets map and
    * the executor-side scan: `String.valueOf` alone would collapse a
    * null key and the literal string "null" into one group (shared
    * running offsets — silent corruption).
    */
  private def encodeKey(v: Any): String =
    if (v == null) "\u0000" else "v:" + String.valueOf(v)

  /** GROUP-WISE inclusive running sum: `outCol` = cumsum of `valueCol`
    * within each `keyCol` group, in the total order of `orderCols` —
    * the distributed form of `sum() OVER (PARTITION BY key ORDER BY …)`
    * WITHOUT a window: a window partitions by the key, so one dominant
    * group (90% of a mixture's docs from one source) lands on ONE task
    * and AQE cannot split window exchanges. Here rows range-partition
    * over (key, orderCols) — a dominant group SPANS partitions — and
    * the per-(partition, key) totals (≤ partitions + distinct keys
    * rows, driver-bounded for the bounded-key contract this targets:
    * sources, splits, languages) seed each partition's running values
    * exactly as [[cumsumLong]] seeds its global offsets.
    *
    * `keyCol` must be a string or integral column; `orderCols` must
    * totally order rows WITHIN each key (unique tiebreaker last, same
    * contract as [[cumsumLong]]).
    */
  def cumsumLongByKey(df: DataFrame, keyCol: String,
      orderCols: Seq[Column], valueCol: String, outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty, "cumsum needs a total order")
    val spark = df.sparkSession
    val sortExprs = col(keyCol) +: orderCols
    // AQE-sized by default — the cumsumLong rationale (adjacent-range
    // coalescing preserves the key-then-order contiguity the per-key
    // offset seeding depends on)
    val base = df
      .withColumn(valueCol, coalesce(col(valueCol).cast(LongType), lit(0L)))
    val ordered = (if (numPartitions > 0)
        base.repartitionByRange(numPartitions, sortExprs: _*)
      else base.repartitionByRange(sortExprs: _*))
      .sortWithinPartitions(sortExprs: _*)
      .localCheckpoint(true)
    val vIdx = ordered.schema.fieldIndex(valueCol)
    val kIdx = ordered.schema.fieldIndex(keyCol)

    // per-(partition, key) totals: range partitioning puts each key in
    // few contiguous partitions, so this is ≤ partitions + distinct
    // keys rows — driver-bounded for bounded-cardinality keys
    val totals = ordered
      .groupBy(spark_partition_id().as("__pid"), col(keyCol))
      .agg(sum(col(valueCol)).as("__s"))
      .collect()
      .map(r => (r.getInt(0), encodeKey(r.get(1))) -> r.getLong(2))
    require(totals.length <= MaxKeyedTotals,
      s"cumsumLongByKey collected ${totals.length} per-(partition, key) " +
        s"totals for key '$keyCol' (cap $MaxKeyedTotals): this operator's " +
        "driver state is bounded only under the bounded-key contract " +
        "(keys like source/split/language, NOT doc-level ids); for a " +
        "high-cardinality key use a window over the key or cumsumLong " +
        "over a composite order instead")
    // seed offset for (pid, key) = sum of the SAME key's totals in
    // earlier partitions (partition order IS key-then-order order)
    val offsets: Map[(Int, String), Long] = {
      val byKey = totals.groupBy(_._1._2)
      byKey.iterator.flatMap { case (k, rows) =>
        var acc = 0L
        rows.sortBy(_._1._1).map { case ((pid, _), s) =>
          val o = ((pid, k), acc)
          acc += s
          o
        }
      }.toMap
    }

    val outSchema = ordered.schema.add(outCol, LongType, nullable = false)
    val bc = spark.sparkContext.broadcast(offsets)
    val out = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      var curKey: String = null
      var run = 0L
      it.map { r =>
        val k = encodeKey(r.get(kIdx))
        if (k != curKey) {
          curKey = k
          run = bc.value.getOrElse((pid, k), 0L)
        }
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(out, outSchema)
  }
}
