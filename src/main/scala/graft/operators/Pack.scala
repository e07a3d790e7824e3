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
    spansOf(cumToks(docs, idCol, textCol, baseOffset = 0L), idCol, budget)
  }

  /** Incremental pack: manifest spans for `docs` CONTINUING an existing
    * pack — the corpus-growth path (repacking 100 TB because 1 TB
    * arrived is the O(corpus)-per-increment shape this avoids). The
    * stored state at `stateDir` is two scalars: the token high-water
    * (where the next sequence continues) and the highest packed doc id.
    * Increments must arrive in id order (every new id above the stored
    * maximum) — enforced here, because a lower id would retroactively
    * shift every later document's global offset and invalidate already-
    * written sequences.
    *
    * The increment's spans are fully determined once [[Prefix.cumsumLong]]
    * pins its checkpoint, so the state advance AFTER planning is safe;
    * single writer per stateDir (the [[AsofJoin]] scalar-state posture).
    * If the caller's downstream write of the returned manifest fails,
    * re-run the increment after restoring the previous state file —
    * the output is a pure function of (state, increment).
    */
  def packIncremental(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, stateDir: String): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val spark = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(stateDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val (base, maxSeen) = readState(fs, stateDir).getOrElse((0L, Long.MinValue))
    val cum = cumToks(docs, idCol, textCol, baseOffset = base)
    // bounded driver scalars: increment's id range + token total
    val b = cum.agg(min(col(idCol)), max(col(idCol)),
      max(col("tok_end_global"))).head()
    if (b.isNullAt(0)) return spansOf(cum, idCol, budget) // empty increment
    require(b.getLong(0) > maxSeen,
      s"packIncremental out of order: new id ${b.getLong(0)} <= already-" +
        s"packed maximum $maxSeen (an earlier id would shift every later " +
        "document's global offset and invalidate written sequences)")
    writeState(fs, stateDir, b.getLong(2), b.getLong(1))
    spansOf(cum, idCol, budget)
  }

  /** Token counts + inclusive global cumsum (shifted by `baseOffset`),
    * zero-token docs dropped. */
  private def cumToks(docs: DataFrame, idCol: String, textCol: String,
      baseOffset: Long): DataFrame = {
    val toks = docs
      .select(col(idCol),
        TextOps.wsTokenCount(col(textCol)).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    Prefix.cumsumLong(toks, Seq(idCol), "n_toks", "tok_end_global")
      .withColumn("tok_end_global", col("tok_end_global") + baseOffset)
  }

  private def spansOf(cum: DataFrame, idCol: String, budget: Int): DataFrame =
    cum
      .withColumn("tok_start_global",
        col("tok_end_global") - col("n_toks"))
      .withColumn("seq_id", explode(sequence(
        expr(s"tok_start_global div $budget"),
        expr(s"(tok_end_global - 1) div $budget"))))
      .select(col(idCol), col("seq_id"),
        greatest(lit(0L),
          col("seq_id") * budget - col("tok_start_global")).as("tok_start"),
        (least(col("tok_end_global"), (col("seq_id") + 1) * budget)
          - col("tok_start_global")).as("tok_end"),
        col("n_toks"))

  private def statePath(stateDir: String) =
    new org.apache.hadoop.fs.Path(stateDir, "_pack_state")

  private def readState(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String): Option[(Long, Long)] = {
    val p = statePath(stateDir)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
      body.split(' ') match {
        case Array(hw, mx) =>
          for (h <- hw.toLongOption; m <- mx.toLongOption) yield (h, m)
        case _ => None
      }
    }
  }

  private def writeState(fs: org.apache.hadoop.fs.FileSystem,
      stateDir: String, tokHighWater: Long, maxId: Long): Unit = {
    val out = fs.create(statePath(stateDir), true)
    try out.write(s"$tokHighWater $maxId".getBytes("UTF-8"))
    finally out.close()
  }
}
