package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextVectorExpressions

/** Distributed unigram-LM tokenizer-vocabulary training (Kudo 2018, the
  * SentencePiece unigram model) — the OTHER mainstream subword family
  * next to [[Bpe]]: instead of greedy merges, hold a probabilistic piece
  * vocabulary, Viterbi-segment the corpus under it, re-estimate piece
  * probabilities from the segmentation (hard EM), and prune the worst
  * pieces until the target size.
  *
  * Shape (the 100 TB contract, shared with [[Bpe.train]]): every EM
  * round runs over the WORD-FREQUENCY table ([[Bpe.wordCounts]] — one
  * corpus-sized pre-tokenize pass, then vocabulary-sized work per
  * round). The vocabulary itself is driver-bounded by construction
  * (`seedSize` rows — the same bounded rows-to-driver contract as BPE's
  * merge batches and every top-k), travels to executors as a foldable
  * literal inside the codegen'd [[graft.functions.UnigramViterbiExpr]]
  * kernel, and each round costs ONE map-only pass + ONE
  * partial-aggregated exchange over the word table.
  *
  * Determinism: seed candidates and every prune rank by
  * (count desc, piece asc); counts are exact longs; the Viterbi
  * tie-break is fixed (longer ending piece at equal score). Coverage:
  * every character observed in the corpus stays in the vocabulary
  * forever (floor count 1 when a round's segmentation never uses it),
  * so segmentation has no dead ends — the standard SentencePiece
  * character-coverage invariant.
  *
  * No reference analogue (SURVEY §2.11 text-analysis family; the
  * reference pipeline stores raw text only — its closest surface is the
  * raw-text archive path, /root/reference/transformer.py:384-420).
  */
object UnigramLm {

  /** `vocab`: `(rank, piece, n, logprob)` — ranks by (n desc, piece asc),
    * logprob = round(ln(n / total), 6). `maxPieceLen` rides the model:
    * segmentation must bound its DP window exactly the way training did.
    */
  final case class UnigramModel(vocab: DataFrame, maxPieceLen: Int)

  /** Train a unigram piece vocabulary of ≤ `vocabSize` pieces (all
    * observed single characters + the surviving multi-char pieces).
    * `seedSize` bounds the initial candidate pool (default 4×target);
    * each outer round prunes the multi-char tail to `pruneRatio` of its
    * size (never below the target) and re-runs `emRounds` hard-EM
    * passes, so the prune-train loop converges in
    * O(log(seed/target) / log(1/pruneRatio)) rounds.
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 6, emRounds: Int = 2, pruneRatio: Double = 0.75,
      seedSize: Int = 0): UnigramModel = {
    require(vocabSize >= 1, s"vocabSize ($vocabSize) must be >= 1")
    require(maxPieceLen >= 2, s"maxPieceLen ($maxPieceLen) must be >= 2")
    require(pruneRatio > 0 && pruneRatio < 1,
      s"pruneRatio ($pruneRatio) must be in (0, 1)")
    val spark = docs.sparkSession
    val seedN = if (seedSize > 0) seedSize else 4 * vocabSize
    val words = Bpe.wordCounts(docs, textCol).localCheckpoint(true)
    try {
      // seed: every substring of length ≤ maxPieceLen of every distinct
      // word, weighted by word frequency — one explode + one
      // partial-aggregated exchange, output substring-vocabulary-sized
      val subs = words.select(col("n"),
          explode(flatten(transform(
            sequence(lit(0), length(col("word")) - 1),
            i => transform(
              sequence(lit(1), least(lit(maxPieceLen), length(col("word")) - i)),
              l => col("word").substr(i + 1, l))))).as("piece"))
        .groupBy("piece").agg(sum(col("n")).as("pn"))
        .localCheckpoint(true)
      // ALL observed characters (coverage floor, never pruned) + the
      // top multi-char candidates — both driver-bounded pulls
      val singles = subs.filter(length(col("piece")) === 1)
        .orderBy(asc("piece")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val seedMulti = subs.filter(length(col("piece")) >= 2)
        .orderBy(desc("pn"), asc("piece"))
        .limit(math.max(0, seedN - singles.length)).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      Dedup.releaseLocalCheckpoint(subs)

      val singleSet = singles.map(_._1).toSet
      var vocab: Vector[(String, Long)] = (singles ++ seedMulti).toVector

      // one hard-EM pass: Viterbi-segment every distinct word under the
      // current probabilities, re-count pieces weighted by word
      // frequency. Unused multi-char pieces die; unused single chars
      // keep a floor count of 1 (coverage).
      def emRound(v: Vector[(String, Long)]): Vector[(String, Long)] = {
        val total = math.max(1L, v.map(_._2).sum)
        val pieces = v.map(_._1).toArray
        val lps = v.map(t => math.log(t._2.toDouble / total)).toArray
        val floor = math.log(0.5 / total)
        val counts = words.select(col("n"),
            explode(TextVectorExpressions.unigram_viterbi(col("word"),
              pieces, lps, maxPieceLen, floor)).as("piece"))
          .groupBy("piece").agg(sum(col("n")).as("pn"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        v.flatMap { case (p, _) =>
          val c = counts.getOrElse(p, 0L)
          if (singleSet.contains(p)) Some(p -> math.max(c, 1L))
          else if (c > 0) Some(p -> c)
          else None
        }
      }

      val targetMulti = math.max(0, vocabSize - singles.length)
      (1 to emRounds).foreach(_ => vocab = emRound(vocab))
      while (vocab.count(_._1.length > 1) > targetMulti) {
        val multis = vocab.filter(_._1.length > 1)
        val keep = math.max(targetMulti,
          (multis.length * pruneRatio).toInt)
        val kept = multis.sortBy { case (p, n) => (-n, p) }.take(keep)
          .map(_._1).toSet
        vocab = vocab.filter { case (p, _) =>
          singleSet.contains(p) || kept.contains(p) }
        (1 to emRounds).foreach(_ => vocab = emRound(vocab))
      }

      val total = math.max(1L, vocab.map(_._2).sum)
      val ranked = vocab.sortBy { case (p, n) => (-n, p) }.zipWithIndex
        .map { case ((p, n), r) =>
          (r.toLong, p, n,
            BigDecimal(math.log(n.toDouble / total))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      import spark.implicits._
      UnigramModel(
        ranked.toDF("rank", "piece", "n", "logprob"),
        maxPieceLen)
    } finally Dedup.releaseLocalCheckpoint(words)
  }

  /** Segment a corpus through a trained model: pre-tokenize (the
    * [[Bpe.segment]] contract), Viterbi each occurrence under the
    * model's logprobs. Out-of-vocab CHARACTERS (unseen in training)
    * fall back to a floor strictly below every vocab piece and flag the
    * row `oov`; by DP construction `concat(pieces) == word` always.
    * Output: `(idCol, word, pieces, oov)`.
    */
  def segment(docs: DataFrame, idCol: String, textCol: String,
      model: UnigramModel): DataFrame = {
    val rows = model.vocab.select("piece", "logprob")
      .orderBy(asc("piece")).collect()
    val pieces = rows.map(_.getString(0))
    val lps = rows.map(_.getDouble(1))
    val floor = (if (lps.isEmpty) 0.0 else lps.min) - math.log(1e6)
    docs.select(col(idCol), explode(regexp_extract_all(col(textCol),
        lit(TextOps.BpeTokenPattern), lit(0))).as("word"))
      .withColumn("pieces", TextVectorExpressions.unigram_viterbi(
        col("word"), pieces, lps, model.maxPieceLen, floor))
      .withColumn("oov",
        size(array_except(col("pieces"), typedLit(pieces.toSeq))) > 0)
      .select(col(idCol), col("word"), col("pieces"), col("oov"))
  }
}
