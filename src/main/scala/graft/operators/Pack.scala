package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for training data: concatenate the corpus's token
  * stream in a deterministic document order and chunk it into
  * fixed-budget training sequences (the GPT-style "concat and chunk"
  * pack — every sequence is exactly `budget` tokens except the last, no
  * padding waste). Output is the pack MANIFEST: one row per
  * (document, sequence) span saying which doc-local token slice
  * `[tok_start, tok_end)` lands in which training sequence — the shape a
  * downstream tokenizer-shard writer consumes.
  *
  * Scale posture: the only global state is the corpus-wide token offset,
  * computed with [[Prefix.cumsumLong]] (range-partitioned sort + per-
  * partition totals — NO single-partition window). Span explosion is
  * per-row (`sequence()` over the ≤ n_toks/budget + 1 sequences a doc
  * touches), so the whole pack is one distributed sort plus map-only
  * work. No reference analogue; core LLM-pipeline operator (SURVEY
  * §2.11).
  */
object Pack {

  /** Pack manifest over `docs`: columns `idCol, seq_id, tok_start,
    * tok_end, n_toks` (all long; `[tok_start, tok_end)` doc-local).
    * Zero-token documents are dropped (they occupy no span). Documents
    * larger than `budget` straddle multiple sequences.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    spansOf(cumToks(docs, idCol, textCol), idCol, budget)
  }

  /** Per-group pack manifest in ONE pass: for each distinct `keyCol`
    * value (a split/source label — bounded-cardinality by the
    * [[Prefix.cumsumLongByKey]] contract), exactly the manifest
    * [[packSequences]] would produce over that group's rows alone
    * (seq_ids restart at 0 per group). One keyed cumsum + one span
    * explode replaces one full sort+checkpoint+totals pass PER GROUP —
    * the x43 release path packs train/val/test in one corpus pass
    * instead of three (round-17, guide §1.2 fewer passes).
    */
  def packSequencesByKey(docs: DataFrame, keyCol: String, idCol: String,
      textCol: String, budget: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val toks = docs
      .select(col(keyCol), col(idCol),
        TextOps.wsTokenCount(col(textCol)).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    spansOf(Prefix.cumsumLongByKey(toks, keyCol, Seq(col(idCol)), "n_toks",
      "tok_end_global"), idCol, budget, extraCols = Seq(keyCol))
  }

  /** Incremental pack: manifest spans for `docs` CONTINUING an existing
    * pack — the corpus-growth path (repacking 100 TB because 1 TB
    * arrived is the O(corpus)-per-increment shape this avoids). The
    * stored state at `stateDir` is five scalars — the previous base, the
    * token high-water (where the next sequence continues), the highest
    * packed id, and the last increment's lowest id and token total —
    * committed as a one-row MANIFEST table (CAS'd, checkpointed delta
    * log: the same machinery every other mutable table in the repo
    * rides), not a raw overwrite file.
    *
    * Ordering contract: increments arrive in id order (every new id
    * above the stored maximum) — a lower id would retroactively shift
    * every later document's global offset and invalidate already-written
    * sequences. Two outcomes for an increment that violates it:
    *
    *  - an EXACT REPLAY of the last increment (same id range AND same
    *    token total — a retried micro-batch after a crash between output
    *    write and checkpoint commit) re-derives the same spans from the
    *    stored previous base and leaves the state untouched:
    *    replay-idempotent, the property [[streamingPack]]'s exactly-once
    *    story rests on. A batch that merely SHARES the id range but
    *    carries different content (its token total differs) is NOT a
    *    replay and throws rather than silently mis-offsetting;
    *  - anything else throws.
    *
    * Single writer per stateDir is the contract — and now ENFORCED, not
    * assumed: the state write is a version-guarded CAS
    * ([[graft.sinks.ManifestMergeEngine.conditionalOverwrite]]), so a
    * second concurrent writer fails loudly with
    * ConcurrentModificationException instead of last-write-wins
    * corrupting the offset chain. A pre-manifest raw `_pack_state` file
    * is still honored on read and upgraded on the next write.
    */
  def packIncremental(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, stateDir: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val idType = docs.schema(idCol).dataType
    require(idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType,
      s"packIncremental orders increments by an integral id; column " +
        s"'$idCol' is $idType — cast it to a long id upstream")
    val spark = docs.sparkSession
    val (st, stateVersion) = readState(spark, stateDir)
    val cum0 = cumToks(docs, idCol, textCol)
    // bounded driver scalars: increment's id range + token total (the
    // inclusive cumsum's maximum IS the total — cum0 is checkpointed, so
    // this costs one cheap pass over the pinned partitions)
    val b = cum0.agg(min(col(idCol)).cast("long"), max(col(idCol)).cast("long"),
      max(col("tok_end_global"))).head()
    if (b.isNullAt(0)) return spansOf(cum0, idCol, budget) // empty: no-op
    val (minId, maxId, total) = (b.getLong(0), b.getLong(1), b.getLong(2))
    val base = st match {
      case None => 0L
      case Some(s) if minId > s.maxId => s.highWater
      case Some(s) if minId == s.lastMinId && maxId == s.maxId &&
          (s.lastTotal < 0 || total == s.lastTotal) =>
        s.prevBase // exact replay of the last increment — re-derive, no advance
      case Some(s) if minId == s.lastMinId && maxId == s.maxId =>
        throw new IllegalArgumentException(
          s"packIncremental: increment shares the last increment's id range " +
            s"[$minId, $maxId] but its token total ($total) differs from the " +
            s"recorded one (${s.lastTotal}) — not a replay; packing it against " +
            "the previous base would silently mis-offset every span")
      case Some(s) => throw new IllegalArgumentException(
        s"packIncremental out of order: increment ids [$minId, $maxId] vs " +
          s"already-packed maximum ${s.maxId} (an earlier id would shift " +
          "every later document's global offset and invalidate written " +
          "sequences; only an exact replay of the last increment is accepted)")
    }
    if (!st.exists(s => base == s.prevBase && maxId == s.maxId))
      writeState(spark, stateDir,
        PackState(base, base + total, maxId, minId, total), stateVersion)
    spansOf(cum0.withColumn("tok_end_global", col("tok_end_global") + base),
      idCol, budget)
  }

  /** Streaming pack: documents landing on a file stream are packed per
    * micro-batch through [[packIncremental]]'s persisted offset state,
    * each batch's manifest written to `outDir/batch=<id>` with overwrite
    * — so a replayed batch (same batchId, same increment) rewrites the
    * same directory with the same rows: exactly-once end to end. Batches
    * must land in id order (the [[packIncremental]] contract; a file
    * stream processes files in arrival order).
    */
  def streamingPack(spark: org.apache.spark.sql.SparkSession,
      sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      idCol: String, textCol: String, budget: Int,
      stateDir: String, outDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .queryName("graft_pack")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (!b.isEmpty)
          packIncremental(b, idCol, textCol, budget, stateDir)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** Render packed sequences: join a span manifest (from
    * [[packSequences]]/[[packIncremental]]) back to the documents and
    * reconstruct each training sequence's token text — the consumer
    * half of the pack, and the proof the manifest alone suffices to
    * rebuild the exact token stream. Output: `(seq_id, n_toks,
    * seq_text)`, every sequence exactly the budget long except the
    * last.
    *
    * Scale posture: the manifest↔documents join is a doc-id equi-join
    * (uniform key); per-sequence assembly aggregates the few spans a
    * sequence touches (≤ budget tokens of text), ordered by the
    * in-sequence position carried as `tok_start_global` — no window, one
    * shuffle on seq_id.
    */
  def renderSequences(manifest: DataFrame, docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    manifest
      .join(docs.select(col(idCol), col(textCol)), idCol)
      .select(col("seq_id"),
        (col("tok_end") - col("tok_start")).as("n_span_toks"),
        // slice is 1-based, [tok_start, tok_end) is 0-based half-open
        struct(col(idCol),
          array_join(slice(split(trim(col(textCol)), "\\s+"),
            (col("tok_start") + 1).cast("int"),
            (col("tok_end") - col("tok_start")).cast("int")), " ")
            .as("part")).as("piece"))
      .groupBy("seq_id")
      .agg(sum(col("n_span_toks")).as("n_toks"),
        array_join(transform(array_sort(collect_list(col("piece"))),
          p => p.getField("part")), " ").as("seq_text"))
  private def cumToks(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol),
        TextOps.wsTokenCount(col(textCol)).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    Prefix.cumsumLong(toks, Seq(idCol), "n_toks", "tok_end_global")
  }

  private def spansOf(cum: DataFrame, idCol: String, budget: Int,
      extraCols: Seq[String] = Nil): DataFrame =
    cum
      .withColumn("tok_start_global",
        col("tok_end_global") - col("n_toks"))
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_start_global div $budget"),
        expr(s"(tok_end_global - 1) div $budget"))))
      .select(extraCols.map(col) ++ Seq(col(idCol), col("seq_id"),
        greatest(lit(0L),
          col("seq_id") * budget - col("tok_start_global")).as("tok_start"),
        (least(col("tok_end_global"), (col("seq_id") + 1) * budget)
          - col("tok_start_global")).as("tok_end"),
        col("n_toks")): _*)

  private final case class PackState(prevBase: Long, highWater: Long,
      maxId: Long, lastMinId: Long, lastTotal: Long)

  /** Pre-manifest raw state file — read-compat only (no recorded total:
    * `lastTotal = -1` skips the replay total check once), retired on the
    * next state write.
    */
  private def legacyStatePath(stateDir: String) =
    new org.apache.hadoop.fs.Path(stateDir, "_pack_state")

  private def stateLogPath(stateDir: String) = s"$stateDir/_pack_state_log"

  private def stateEngine = new graft.sinks.ManifestMergeEngine()

  /** Reads `(state, manifest version)` — the version read BEFORE the row,
    * so a concurrent commit between the two surfaces as a loud CAS
    * failure at write time, never as a silently stale expected version.
    */
  private def readState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): (Option[PackState], Option[Long]) = {
    val eng = stateEngine
    val path = stateLogPath(stateDir)
    val version = eng.currentVersion(spark, path)
    eng.read(spark, path) match {
      case Some(df) =>
        val rows = df.select("prev_base", "high_water", "max_id",
          "last_min_id", "last_total").head(2)
        // a PRESENT but unreadable state must fail loudly — treating it
        // as fresh would silently restart the pack at offset 0 and
        // collide every new sequence id with already-written ones
        if (rows.length != 1) throw new IllegalStateException(
          s"corrupt pack state at $path: ${rows.length} rows (expected 1)")
        val r = rows.head
        (Some(PackState(r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))), version)
      case None =>
        (readLegacyState(spark, stateDir), version)
    }
  }

  private def readLegacyState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String): Option[PackState] = {
    val p = legacyStatePath(stateDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      val parsed = body.split(' ') match {
        case Array(pb, hw, mx, lm) =>
          for (a <- pb.toLongOption; b <- hw.toLongOption;
               c <- mx.toLongOption; d <- lm.toLongOption)
            yield PackState(a, b, c, d, -1L)
        case _ => None
      }
      Some(parsed.getOrElse(throw new IllegalStateException(
        s"corrupt pack state at $p: '$body'")))
    }
  }

  /** Version-guarded state commit: rides the manifest engine's CAS
    * (checkpointed delta log, snapshot-isolated readers), so a SECOND
    * concurrent writer — whose read version is stale by the time it
    * writes — fails with ConcurrentModificationException instead of
    * last-write-wins corrupting the offset chain. Replays never reach
    * here (the caller skips the write), so a committed version advance
    * per real increment is the expected cadence.
    */
  private def writeState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, s: PackState, expectedVersion: Option[Long]): Unit = {
    import spark.implicits._
    val row = Seq((s.prevBase, s.highWater, s.maxId, s.lastMinId, s.lastTotal))
      .toDF("prev_base", "high_water", "max_id", "last_min_id", "last_total")
    stateEngine.conditionalOverwrite(spark, stateLogPath(stateDir), row,
      expectedVersion)
    // retire the legacy raw file so the two representations can't diverge
    val legacy = legacyStatePath(stateDir)
    val fs = legacy.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(legacy)) fs.delete(legacy, false)
  }
}
