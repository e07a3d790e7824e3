package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed WordPiece tokenizer training + MaxMatch encoding — the
  * BERT-family member of the tokenizer suite (BPE = x44, unigram-LM =
  * x47). Same likelihood idea as Schuster & Nakajima 2012 / the BERT
  * reference: merges are chosen by SCORE = pair_count /
  * (left_count × right_count) — the pair whose fusion most increases
  * corpus likelihood under a unigram-over-pieces model — rather than
  * raw pair frequency (BPE), and continuation pieces carry the "##"
  * prefix so encoding can distinguish word-initial from word-internal
  * matches.
  *
  * Shape (the [[Bpe]] 100 TB contract): training runs over the
  * WORD-FREQUENCY table, never the corpus. Each round costs one
  * map-only pass plus TWO partial-aggregated exchanges (adjacent-pair
  * counts and symbol counts — the extra agg is what likelihood scoring
  * needs), the symbol-count table broadcasts onto the pair table
  * (vocab-sized), and the bounded winner pool comes to the driver.
  * Batched disjoint merges per round as in [[Bpe]]; `mergesPerRound=1`
  * recovers the exact sequential algorithm.
  *
  * ENCODING is where WordPiece differs structurally from BPE: the
  * trained artifact is a VOCABULARY and the encoder is greedy
  * longest-match-first (MaxMatch) against it — implemented as a
  * codegen'd Catalyst kernel
  * ([[graft.functions.WordPieceEncodeExpr]]) with the vocab riding the
  * expression, so corpus encoding is MAP-ONLY: no join at all (BPE's
  * segment joins through the word table; here even unseen words encode
  * in-kernel, falling to `[UNK]` only when some position matches no
  * piece). Deterministic: counts are exact longs, scores are pure
  * functions of them, ties break on (left, right) lexically, and the
  * kernel is a fixed per-row loop.
  *
  * No reference analogue (SURVEY §2.11 text-analysis family).
  */
object WordPiece {

  /** `merges`: learning order, `(rank, left, right, merged, pair_n,
    * score)`. `vocab`: the encoder's piece set — word-initial pieces
    * bare, continuation pieces "##"-prefixed — as `(piece)` rows
    * (model-sized). `wordSegs`: training's end state (debug/inspection;
    * the encoder does NOT need it).
    */
  final case class WordPieceModel(merges: DataFrame, vocab: DataFrame,
      wordSegs: DataFrame)

  /** Initial segmentation: first char bare, rest "##"-prefixed. */
  private def initialSyms(word: Column): Column =
    transform(split(word, ""), (c, i) =>
      when(i === 0, c).otherwise(concat(lit("##"), c)))

  /** One greedy left-to-right pass applying a batch of symbol-disjoint
    * merges — [[Bpe.applyMerges]] with the WordPiece twist: the fused
    * symbol is `left + right-without-its-"##"` (the right side of an
    * adjacent pair is always a continuation symbol by construction, and
    * the fusion keeps the LEFT side's initial/continuation status).
    * Shares the codegen'd [[graft.functions.MergeFoldExpr]] kernel with
    * BPE (round-12 unification — the HOF form evaluated interpreted);
    * bit-parity with the HOF form is pinned in ExtensionPropertiesSpec.
    */
  private[operators] def applyMerges(syms: Column,
      pairs: Seq[(String, String)]): Column =
    graft.functions.TextVectorExpressions.merge_fold(syms, pairs,
      wordpiece = true)

  /** Learn up to `numMerges` likelihood-scored merges. Stops early when
    * no remaining pair reaches `minPairCount` weighted occurrences.
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      mergesPerRound: Int = 8, minPairCount: Long = 2L): WordPieceModel = {
    require(numMerges >= 1, s"numMerges ($numMerges) must be >= 1")
    require(mergesPerRound >= 1, s"mergesPerRound ($mergesPerRound) must be >= 1")
    val spark = docs.sparkSession
    var words = Bpe.wordCounts(docs, textCol)
      .withColumn("syms", initialSyms(col("word")))
      .localCheckpoint(true)
    // the char-level pieces every encoder fallback needs: collected once
    // from the INITIAL segmentation (model-sized: distinct chars ×2)
    val basePieces = words.select(explode(col("syms")).as("piece"))
      .distinct().collect().map(_.getString(0))
    val learned = ArrayBuffer.empty[(Long, String, String, String, Long, Double)]
    var exhausted = false
    while (!exhausted && learned.size < numMerges) {
      val want = math.min(mergesPerRound, numMerges - learned.size)
      // symbol counts (weighted by word frequency): the denominator of
      // the likelihood score — vocab-sized, broadcast onto the pairs
      val symCounts = words.select(explode(col("syms")).as("s"), col("n"))
        .groupBy("s").agg(sum(col("n")).as("sn"))
      val top = words.filter(size(col("syms")) >= 2)
        .select(col("n"), explode(
          transform(slice(col("syms"), lit(1), size(col("syms")) - 1),
            (x, i) => struct(x.as("l"),
              element_at(col("syms"), i + lit(2)).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("n")).as("pn"))
        .filter(col("pn") >= minPairCount)
        .join(broadcast(symCounts.select(col("s").as("l"), col("sn").as("ln"))), "l")
        .join(broadcast(symCounts.select(col("s").as("r"), col("sn").as("rn"))), "r")
        // exact-long inputs → the double score is identical at any
        // parallelism; ties break lexically on (l, r)
        .withColumn("score", col("pn") / (col("ln") * col("rn")))
        .orderBy(desc("score"), asc("l"), asc("r"))
        .limit(want * 8)
        .collect()
      // sequential-exact admission incl. the chain-fuse guard (shared
      // with BPE — see [[Bpe.selectBatch]]); the WordPiece fusion rule
      // rides in as the `merged` lens. Row shape: (r, l, ...) join order.
      val batch = Bpe.selectBatch[org.apache.spark.sql.Row](top, want,
        row => (row.getString(1), row.getString(0)),
        (l, r) => l + r.stripPrefix("##"))
        .map { row =>
          val (r0, l0) = (row.getString(0), row.getString(1))
          val (pn, score) = (row.getLong(2), row.getDouble(5))
          learned += ((learned.size.toLong, l0, r0,
            l0 + r0.stripPrefix("##"), pn, score))
          (l0, r0)
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
    val merges = learned.toSeq
      .toDF("rank", "left", "right", "merged", "pair_n", "score")
    val vocab = (basePieces ++ learned.map(_._4)).distinct.toSeq.sorted
      .toDF("piece")
    WordPieceModel(merges, vocab, words.select("word", "n", "syms"))
  }

  /** MAP-ONLY corpus encoding through the trained vocabulary: greedy
    * longest-match-first per pre-token, continuation matches tried with
    * their "##" form, `[UNK]` when some position matches nothing (the
    * BERT contract). The vocab rides the codegen'd kernel — no join, no
    * shuffle, OOV included. Output `(idCol, word, pieces, unk)`.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      model: WordPieceModel): DataFrame = {
    val pieces = model.vocab.select("piece").collect().map(_.getString(0))
    docs.select(col(idCol), explode(regexp_extract_all(col(textCol),
        lit(TextOps.BpeTokenPattern), lit(0))).as("word"))
      .withColumn("pieces", graft.functions.TextVectorExpressions
        .wordpiece_encode(col("word"), pieces))
      .withColumn("unk", array_contains(col("pieces"), "[UNK]"))
      .select(col(idCol), col("word"), col("pieces"), col("unk"))
  }
}
