package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer-vocabulary training — the stage between
  * corpus cleaning (x23) and sequence packing (x36) that an LLM
  * training-data release actually runs: learn subword merges over the
  * cleaned corpus, then re-segment with the learned vocab.
  *
  * Shape (the part that must survive 100 TB): training runs over the
  * WORD-FREQUENCY table, not the corpus. One pre-tokenize pass
  * ([[TextOps.BpeTokenPattern]], the same ASCII-safe regex the token
  * counter uses) reduces the corpus to `(word, n)` — a partial-aggregated
  * heavy-hitter pass (the x39 shape) whose output is vocabulary-sized.
  * Every merge round then costs one map-only pass over that table plus
  * ONE partial-aggregated exchange for the adjacent-pair counts; the
  * winning pairs come back to the driver (bounded by `mergesPerRound`,
  * the same rows-to-driver contract as every top-k), are broadcast into
  * the next round's merge kernel as literals, and the re-segmentation is
  * a codegen'd higher-order fold — no UDF, no shuffle.
  *
  * Batched rounds: classic BPE merges ONE pair per round; at cluster
  * scale the per-round latency (a full pair-count pass) dominates, so
  * each round applies up to `mergesPerRound` pairs whose symbols are
  * mutually DISJOINT — any adjacency can match at most one picked pair,
  * making the single greedy left-to-right pass order-independent and
  * deterministic. This is the standard parallel-BPE approximation
  * (pair counts for later picks in a batch can be slightly stale through
  * destroyed adjacencies); `mergesPerRound = 1` recovers exact
  * sequential BPE (parity-pinned against a hand-rolled reference in
  * BpeSpec).
  *
  * Determinism: pair ranking orders by (count desc, left, right); the
  * in-round batch selection is a greedy scan of that order; word counts
  * are exact integers. Identical corpus → identical merge sequence, any
  * parallelism.
  *
  * No reference analogue (SURVEY §2.11 text-analysis family; the
  * reference pipeline stores raw text only).
  */
object Bpe {

  /** `merges`: the learned vocab, `(rank, left, right, merged, pair_n)`
    * in learning order. `wordSegs`: training's end state — every distinct
    * word's final segmentation `(word, n, syms)`; the corpus encoder IS
    * this table ([[segment]] joins through it).
    */
  final case class BpeModel(merges: DataFrame, wordSegs: DataFrame)

  /** Pre-token frequencies: `(word, n)`, one partial-aggregated exchange
    * over the exploded pre-token stream.
    */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(regexp_extract_all(col(textCol),
        lit(TextOps.BpeTokenPattern), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))

  /** One greedy left-to-right pass applying a batch of symbol-disjoint
    * merge pairs: fold the symbol array, and whenever (last accumulated
    * symbol, next symbol) is one of the batch pairs, replace the last
    * with their concatenation. A merged symbol is never re-merged within
    * the pass unless the batch contains the longer pair too — exactly
    * BPE's greedy application order. The fold is the codegen'd
    * [[graft.functions.MergeFoldExpr]] kernel shared with
    * [[WordPiece.applyMerges]] — the Catalyst-HOF form both trainers
    * used through round 11 evaluates its lambda interpreted per element
    * (the BASELINE.md negative result), and this pass runs every
    * training round over the word table; bit-parity with the HOF form
    * is pinned in ExtensionPropertiesSpec.
    */
  private[operators] def applyMerges(syms: Column,
      pairs: Seq[(String, String)]): Column =
    graft.functions.TextVectorExpressions.merge_fold(syms, pairs,
      wordpiece = false)

  /** Greedy sequential-exact batch selection from a ranked candidate
    * pool — shared by [[train]] and [[WordPiece.train]] (which differ
    * only in row shape and fusion rule, hence the `pair`/`merged`
    * lenses). A batch applied in ONE [[applyMerges]] scan equals
    * applying its pairs in separate sequential passes iff no admitted
    * pair's left, right, or merged symbol collides with any other
    * admitted pair's left, right, or merged symbol. The merged-symbol
    * conditions are the chain-fuse guard (round-11 advisor, widened to
    * the symmetric form by the round-12 review): the one-scan kernel
    * both OVER-applies — a fused symbol stays live as the LEFT of the
    * next adjacency, so existing 'abc' plus batch pairs (a,bc) and
    * (abc,d) chains a+bc→abc→abcd in one pass — and UNDER-applies — a
    * preceding symbol never re-pairs with a fusion created to its
    * right, so (x,abc) misses the 'abc' that (a,bc) just made. Both
    * directions are checked so admission is pick-order-independent;
    * rejected pairs simply wait for a later round (they re-rank against
    * fresh counts there, which is also more faithful to sequential
    * semantics than applying them on stale counts would be).
    */
  private[operators] def selectBatch[T](ranked: IterableOnce[T], want: Int,
      pair: T => (String, String),
      merged: (String, String) => String): Seq[T] = {
    val used = scala.collection.mutable.Set.empty[String]
    val pickedMerged = scala.collection.mutable.Set.empty[String]
    val batch = ArrayBuffer.empty[T]
    val it = ranked.iterator
    while (batch.size < want && it.hasNext) {
      val t = it.next()
      val (l, r) = pair(t)
      val m = merged(l, r)
      if (!used.contains(l) && !used.contains(r) &&
        !pickedMerged.contains(l) && !pickedMerged.contains(r) &&
        !used.contains(m) && !pickedMerged.contains(m)) {
        used += l; used += r; pickedMerged += m
        batch += t
      }
    }
    batch.toSeq
  }

  /** Learn up to `numMerges` merges over `docs(textCol)`. Stops early
    * when no remaining adjacent pair reaches `minPairCount` occurrences
    * (weighted by word frequency) — merging singletons learns noise.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      mergesPerRound: Int = 8, minPairCount: Long = 2L): BpeModel = {
    require(numMerges >= 1, s"numMerges ($numMerges) must be >= 1")
    require(mergesPerRound >= 1, s"mergesPerRound ($mergesPerRound) must be >= 1")
    val spark = docs.sparkSession
    // the word table is pinned per round (eager localCheckpoint, the
    // Prefix/Terms pattern): without it round R's jobs would replay the
    // whole merge chain from the corpus — O(rounds²) instead of O(rounds)
    var words = wordCounts(docs, textCol)
      .withColumn("syms", split(col("word"), ""))
      .localCheckpoint(true)
    val learned = ArrayBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    while (!exhausted && learned.size < numMerges) {
      val want = math.min(mergesPerRound, numMerges - learned.size)
      // adjacent pairs weighted by word count: map-only explode over the
      // word table + ONE partial-aggregated exchange, then a bounded
      // candidate pool to the driver (want×8 covers disjointness skips)
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("n"), explode(
          transform(slice(col("syms"), lit(1), size(col("syms")) - 1),
            (x, i) => struct(x.as("l"),
              element_at(col("syms"), i + lit(2)).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("pn"))
        .filter(col("pn") >= minPairCount)
        .orderBy(desc("pn"), asc("l"), asc("r"))
        .limit(want * 8)
        .collect()
      // sequential-exact admission incl. the chain-fuse guard — see
      // [[selectBatch]]
      val batch = selectBatch[org.apache.spark.sql.Row](top, want,
        row => (row.getString(0), row.getString(1)), _ + _)
        .map { row =>
          val (l, r, pn) = (row.getString(0), row.getString(1), row.getLong(2))
          learned += ((learned.size.toLong, l, r, pn))
          (l, r)
        }
      if (batch.isEmpty) exhausted = true
      else {
        val next = words
          .withColumn("syms", applyMerges(col("syms"), batch.toSeq))
          .localCheckpoint(true)
        Dedup.releaseLocalCheckpoint(words)
        words = next
      }
    }
    import spark.implicits._
    val merges = learned.toSeq.toDF("rank", "left", "right", "pair_n")
      .withColumn("merged", concat(col("left"), col("right")))
      .select("rank", "left", "right", "merged", "pair_n")
    BpeModel(merges, words.select("word", "n", "syms"))
  }

  /** Re-segment a corpus through a trained model: pre-tokenize, join each
    * word occurrence to its trained segmentation (the word table is
    * vocabulary-sized — the Zipf-skewed equi-join AQE splits), OOV words
    * fall back to character symbols. `(idCol, word, syms, oov)`; by the
    * merge kernel's construction `concat(syms) == word` always — the
    * round-trip x44b pins.
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame =
    docs.select(col(idCol), explode(regexp_extract_all(col(textCol),
        lit(TextOps.BpeTokenPattern), lit(0))).as("word"))
      .join(model.wordSegs.select(col("word"), col("syms")), Seq("word"), "left")
      .withColumn("oov", col("syms").isNull)
      .withColumn("syms", coalesce(col("syms"), split(col("word"), "")))
      .select(col(idCol), col("word"), col("syms"), col("oov"))
}
