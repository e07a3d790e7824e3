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
    val toks = docs
      .select(col(idCol),
        TextOps.wsTokenCount(col(textCol)).cast("long").as("n_toks"))
      .filter(col("n_toks") > 0)
    Prefix.cumsumLong(toks, Seq(idCol), "n_toks", "tok_end_global")
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
  }
}
