package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `right.ts <= left.ts` (inclusive) within the same key group — the
  * timeseries-alignment operator (sensor↔condition alignment, event
  * attribution, point-in-time feature lookup) that Spark has no built-in
  * for.
  *
  * Formulation: tag both sides, UNION, and carry the matched right row —
  * as ONE struct, so all carried columns come from the SAME right row
  * even when it holds nulls — with `last(_, ignoreNulls)` over a per-key
  * (ts, side) window. No join node at all: one shuffle on the keys, one
  * sort inside each partition, a single Window operator. This is the shape that scales: a
  * per-row range join would rescan the right side per left row, and
  * Spark's own range-join fallback is a broadcast-nested-loop. AQE splits
  * skewed key groups; a key whose timeline is too hot for one partition
  * salts the same way any window does (SkewSpec's recipe).
  *
  * Ties: a right row at exactly left.ts matches (side orders right before
  * left). Right rows that share (key, ts) are resolved by `rightTieBreak`
  * (required for a deterministic result — pass the right side's unique
  * id).
  *
  * `tolerance`: with Some(t), matches older than `t` ts-units are nulled
  * (the "stale sensor reading" guard). Units are whatever the ts columns
  * hold — the engine's events tables carry epoch-nanos longs.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Map[String, String],
      rightTieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column " +
      "(a keyless global as-of puts the whole timeline in one partition; " +
      "add a coarse time-bucket key if the data is genuinely unkeyed)")
    require(rightCols.nonEmpty, "rightCols maps right column -> output name")
    val leftCols = left.columns.toSeq
    val outNames = rightCols.toSeq // (rightCol, outName) in stable order
    val clash = outNames.map(_._2).toSet.intersect(leftCols.toSet + "asof_ts")
    require(clash.isEmpty,
      s"rightCols output names collide with left/output columns: $clash")

    // aligned union schema: left's columns + _ats/_side/_tie + one _r_* slot
    // per carried right column
    val l2 = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("_ats"), lit(1).as("_side"),
          lit(null).cast(right.schema(rightTieBreak).dataType).as("_tie")) ++
        outNames.map { case (rc, out) =>
          lit(null).cast(right.schema(rc).dataType).as(s"_r_$out")
        }: _*)
    val r2 = right.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("_ats"), lit(0).as("_side"),
          col(rightTieBreak).as("_tie")) ++
        outNames.map { case (rc, out) => col(rc).as(s"_r_$out") }: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // carry the matched right row as ONE struct: per-column
    // last(ignoreNulls) carries would mix columns from DIFFERENT right
    // rows whenever the most recent row holds a null (a chimera row with a
    // fresh asof_ts but a stale value, invisible to the tolerance guard)
    val rightRow = when(col("_side") === 0,
      struct(col("_ats").as("_rts") +:
        outNames.map { case (_, out) => col(s"_r_$out").as(out) }: _*))
    val carried = l2.unionByName(r2)
      .withColumn("_carry", last(rightRow, ignoreNulls = true).over(w))

    val matched = carried.filter(col("_side") === 1)
    val fresh = tolerance match {
      case Some(t) =>
        when(col("_carry").isNotNull &&
          (col("_ats") - col("_carry._rts")) <= t, col("_carry"))
      case None => col("_carry")
    }
    matched.withColumn("_carry", fresh).select(
      leftCols.map(col) ++ Seq(col("_carry._rts").as("asof_ts")) ++
        outNames.map { case (_, out) => col(s"_carry.$out").as(out) }: _*)
  }

  /** Streaming as-of join: micro-batch BACKFILL over persisted left/right
    * state tables, the streaming twin of [[asofJoin]] (batch-parity-pinned
    * in AsofJoinSpec the way streamingMinhashDedup pins the dedup chain).
    *
    * Both sides arrive interleaved on ONE source stream (the events-log
    * shape x29 actually has) and are split by `leftFilter`/`rightFilter`.
    * Per trigger:
    *  1. late-beyond-`watermark` right rows are dropped (ts older than
    *     `watermark` before the max event time seen so far);
    *  2. surviving right rows append to the right state table, new left
    *     rows to the left state table (both anti-joined against their
    *     store first — a checkpoint-replayed batch heals instead of
    *     duplicating state);
    *  3. the AFFECTED left set is recomputed: the batch's own left rows
    *     plus every STORED left row whose key got a new right row at or
    *     before its timestamp (late right arrivals revise exactly the
    *     left rows they could now match — O(touched keys), never a full
    *     rescan);
    *  4. [[asofJoin]] runs on (affected left × right state of those keys)
    *     and the results UPSERT into `outDir` by `leftId` (last write
    *     wins, so a revision replaces the earlier match).
    *
    * The result table converges to the one-shot batch [[asofJoin]] over
    * all arrived data, for any arrival interleaving whose right-side
    * lateness stays within `watermark` — beyond it, revisions are
    * dropped by rule (the bounded-state contract; an unbounded revision
    * window would mean unbounded re-emission at 100 TB).
    *
    * State growth: left/right stores accrete per trigger (appends);
    * `compactEvery` > 0 compacts both every that many batches, and the
    * compaction also PRUNES the right store to what future work can
    * still read: an as-of match reaches arbitrarily far back, but any
    * left row that can still arrive or be revised has
    * `ts >= highWater - watermark`, so per key it suffices to keep every
    * right row at-or-after that horizon plus the single newest row
    * before it (the one a horizon-edge left row would match). State is
    * then O(keys + in-horizon rows) instead of O(history) — the bounded
    * contract unbounded retention would break at 100 TB. The left store
    * prunes harder: left rows older than the horizon can never be
    * revised again (a reviser right row would be beyond-watermark),
    * so they drop entirely — their results already live in `outDir`.
    */
  def streamingAsofJoin(spark: org.apache.spark.sql.SparkSession,
      sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      stateDir: String, outDir: String, checkpointDir: String,
      keys: Seq[String], leftFilter: String, rightFilter: String,
      leftId: String, leftTs: String, rightTs: String,
      rightCols: Map[String, String], rightTieBreak: String,
      watermark: Long, compactEvery: Int = 0,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val leftDir = s"$stateDir/left"
    val rightDir = s"$stateDir/right"
    val rightProj = (keys ++ Seq(rightTs, rightTieBreak) ++ rightCols.keys).distinct
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .queryName("graft_asof")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val b = batch.persist()
        try {
          val fs = new org.apache.hadoop.fs.Path(stateDir)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
          val newLeft = b.filter(expr(leftFilter))
          val newRightAll = b.filter(expr(rightFilter)).select(rightProj.map(col): _*)
          val leftStore =
            if (exists(leftDir)) s.read.schema(newLeft.schema).parquet(leftDir)
            else newLeft.limit(0)
          val rightStore =
            if (exists(rightDir)) s.read.schema(newRightAll.schema).parquet(rightDir)
            else newRightAll.limit(0)
          // watermark: event time high-water across everything seen.
          // Persisted as a SCALAR (stateDir/highwater) so a trigger never
          // rescans the stores just to learn the maximum — and a
          // quiet-side batch can't regress the horizon below history.
          // Right rows older than (highWater - watermark) can no longer
          // revise (bounded re-emission).
          val highWater = Seq(
            b.agg(greatest(max(col(leftTs).cast("long")),
              max(col(rightTs).cast("long")))).head().get(0),
            readHighWater(fs, stateDir).map(java.lang.Long.valueOf).orNull)
            .collect { case l: java.lang.Long => l.longValue() }
          val horizonOpt = if (highWater.isEmpty) None
            else Some(highWater.max - watermark)
          val newRight = horizonOpt.fold(newRightAll)(h =>
            newRightAll.filter(col(rightTs).cast("long") >= h))
          // late LEFT rows obey the same horizon: after compaction has
          // pruned the right store past it, a below-horizon left row
          // would silently join against a thinned history and emit a
          // wrong (or null) match — dropping it is the watermark
          // contract, and it keeps results independent of WHEN
          // compaction ran
          val newLeftInWindow = horizonOpt.fold(newLeft)(h =>
            newLeft.filter(col(leftTs).cast("long") >= h))
          // replay heal: only genuinely new rows enter the stores (and the
          // affected-set math below); materialize BEFORE appending — the
          // filter reads the directory the append writes to. The two
          // materializations are independent — overlap them (guide §2.6;
          // round-16); the state WRITES below stay sequential.
          val freshLeftF = StagePool.submit(s)(newLeftInWindow
            .join(leftStore.select(leftId), Seq(leftId), "left_anti")
            .localCheckpoint(true))
          val freshRightF = StagePool.submit(s)(newRight
            .join(rightStore.select(rightTieBreak), Seq(rightTieBreak), "left_anti")
            .localCheckpoint(true))
          val freshLeft =
            try StagePool.get(freshLeftF)
            catch { case e: Throwable =>
              // release the sibling's checkpoint if it was built
              // (round-17 advice fix), don't just await it
              StagePool.awaitValueQuietly(freshRightF)
                .foreach(graft.operators.Dedup.releaseLocalCheckpoint)
              throw e
            }
          val freshRight =
            try StagePool.get(freshRightF)
            catch { case e: Throwable =>
              graft.operators.Dedup.releaseLocalCheckpoint(freshLeft); throw e
            }
          try {
            // affected left rows: this batch's own, plus stored rows whose
            // key gained a right row at-or-before their ts
            val touched = freshRight.groupBy(keys.map(col): _*)
              .agg(min(col(rightTs)).as("_minNewRts"))
            val revised = leftStore.join(touched, keys)
              .filter(col(leftTs) >= col("_minNewRts")).drop("_minNewRts")
            val affected = freshLeft.unionByName(revised).dropDuplicates(leftId)
            val rightState = rightStore.unionByName(freshRight)
              .join(affected.select(keys.map(col): _*).distinct(), keys, "left_semi")
            val result = asofJoin(affected, rightState, keys, leftTs, rightTs,
              rightCols, rightTieBreak)
            // output is TIME-BUCKETED (bucket width = watermark) and
            // merged with a partitioned last-wins upsert: a revision can
            // only target left rows inside the watermark, i.e. the last
            // couple of buckets — so each trigger rewrites O(in-horizon
            // buckets), never the whole result history (which a flat
            // upsert would re-read and re-write forever on a long-running
            // stream). Each left id appears once per batch, so the id
            // serves as the in-batch line id; batch id gives revisions
            // precedence.
            val bucketW = math.max(watermark, 1L)
            graft.sinks.TableSink.partitionedUpsert(s, outDir,
              graft.sinks.TableSink.withSeq(
                result.withColumn("_tbucket",
                  expr(s"CAST($leftTs AS LONG) div $bucketW")),
                batchId, lineIdCol = leftId),
              Seq(leftId, "_tbucket"), "_tbucket")
            freshLeft.write.mode("append").parquet(leftDir)
            freshRight.write.mode("append").parquet(rightDir)
            highWater.reduceOption(_ max _)
              .foreach(writeHighWater(fs, stateDir, _))
          } finally {
            graft.operators.Dedup.releaseLocalCheckpoint(freshLeft)
            graft.operators.Dedup.releaseLocalCheckpoint(freshRight)
          }
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
            if (highWater.nonEmpty) {
              val horizon = highWater.max - watermark
              // left: rows below the horizon can never be revised (their
              // reviser would be beyond-watermark) — drop them; results
              // already live in outDir
              replaceState(s, leftDir,
                s.read.parquet(leftDir).filter(col(leftTs).cast("long") >= horizon))
              // right: keep in-horizon rows + the single newest row per
              // key before the horizon (what a horizon-edge left row
              // would match); tie-break mirrors the join's
              val rs = s.read.parquet(rightDir)
              val wOld = org.apache.spark.sql.expressions.Window
                .partitionBy(keys.map(col): _*)
                .orderBy(col(rightTs).desc, col(rightTieBreak).desc)
              val keepOld = rs.filter(col(rightTs).cast("long") < horizon)
                .withColumn("_rn", row_number().over(wOld))
                .filter(col("_rn") === 1).drop("_rn")
              replaceState(s, rightDir,
                rs.filter(col(rightTs).cast("long") >= horizon)
                  .unionByName(keepOld))
            }
            graft.sinks.TableSink.compact(s, leftDir)
            graft.sinks.TableSink.compact(s, rightDir)
          }
        } finally b.unpersist()
      }
      .start()
  }

  private def hwPath(stateDir: String) =
    new org.apache.hadoop.fs.Path(stateDir, "highwater")

  private def readHighWater(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Option[Long] = {
    val p = hwPath(stateDir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      body.toLongOption
    }
  }

  /** Single-writer scalar (one streaming query owns a stateDir); a
    * replayed batch rewrites the same maximum — idempotent.
    */
  private def writeHighWater(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, v: Long): Unit = {
    val out = fs.create(hwPath(stateDir), true)
    try out.write(v.toString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Rewrite a state directory with a pruned frame derived FROM it:
    * materialize first (localCheckpoint), then overwrite — a lazy
    * read-filter-overwrite of the same path would truncate its own input.
    */
  private def replaceState(s: org.apache.spark.sql.SparkSession, dir: String,
      pruned: DataFrame): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) return
    val mat = pruned.localCheckpoint(true)
    try mat.write.mode("overwrite").parquet(dir)
    finally Dedup.releaseLocalCheckpoint(mat)
  }
}
