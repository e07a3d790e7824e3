package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unigram-LM (Kudo 2018) vocabulary training invariants: coverage,
  * determinism, size bound, round-trip fidelity, and the Viterbi
  * kernel's contracts — the BpeSpec posture for the other tokenizer
  * family.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ran to the mat"),
    (3L, "a cat and a rat sat"),
    (4L, "the rat sat on a cat"),
    (5L, "mats and rats and cats")
  ).toDF("doc_id", "text")

  test("kernel: empty word, oov fallback, coverage, tie-break") {
    import graft.functions.TextVectorKernels
    import org.apache.spark.unsafe.types.UTF8String
    val vocab = new java.util.HashMap[String, java.lang.Double]()
    vocab.put("ab", -1.0); vocab.put("a", -2.0); vocab.put("b", -2.0)
    def seg(w: String) =
      TextVectorKernels.unigramViterbi(UTF8String.fromString(w), vocab, 4, -50.0)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    assert(seg("") == Seq.empty)
    // "ab" as one piece (-1) beats "a"+"b" (-4)
    assert(seg("ab") == Seq("ab"))
    // oov char 'z' takes the floor but still segments (coverage)
    assert(seg("azb") == Seq("a", "z", "b"))
    // tie: put "aa" at exactly the cost of "a"+"a" — longer piece wins
    vocab.put("aa", -4.0)
    assert(seg("aa") == Seq("aa"))
  }

  test("train: all corpus chars kept, size bounded, deterministic, useful") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 40,
      maxPieceLen = 4, emRounds = 2)
    val vocab = m.vocab.collect()
    val pieces = vocab.map(_.getString(1))
    val corpusChars = corpus.select(explode(split(
        regexp_replace(col("text"), "\\s+", ""), "")).as("c"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(corpusChars.subsetOf(pieces.toSet), "coverage: every char is a piece")
    assert(pieces.length <= math.max(40, corpusChars.size))
    assert(pieces.exists(_.length > 1), "learned at least one multi-char piece")
    // ranks are dense and ordered by (n desc, piece asc)
    val byRank = vocab.sortBy(_.getLong(0))
    assert(byRank.map(_.getLong(0)).toSeq == (0L until vocab.length).toSeq)
    val key = byRank.map(r => (-r.getLong(2), r.getString(1))).toSeq
    assert(key == key.sorted, "rank order is (n desc, piece asc)")
    // identical corpus (different partitioning) → identical vocab
    val m2 = UnigramLm.train(corpus.repartition(7), "text", vocabSize = 40,
      maxPieceLen = 4, emRounds = 2)
    assert(m2.vocab.collect().toSeq.map(_.toSeq) ==
      m.vocab.collect().toSeq.map(_.toSeq))
  }

  test("segment: round-trip concat, zero oov on the training corpus, compression") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 40,
      maxPieceLen = 4, emRounds = 2)
    val seg = UnigramLm.segment(corpus, "doc_id", "text", m)
    val agg = seg.agg(
      count(lit(1)).as("n_words"),
      sum(when(concat_ws("", col("pieces")) =!= col("word"), 1L)
        .otherwise(0L)).as("n_mismatch"),
      sum(when(col("oov"), 1L).otherwise(0L)).as("n_oov"),
      sum(size(col("pieces"))).as("n_pieces"),
      sum(length(col("word"))).as("n_chars")).head()
    assert(agg.getLong(1) == 0, "concat(pieces) == word, always")
    assert(agg.getLong(2) == 0, "training corpus has no oov chars")
    assert(agg.getLong(3) < agg.getLong(4),
      "multi-char pieces compress below character segmentation")
    // genuinely unseen char flags oov but still round-trips
    val odd = Seq((9L, "zebra#cat")).toDF("doc_id", "text")
    val oddSeg = UnigramLm.segment(odd, "doc_id", "text", m)
      .agg(sum(when(col("oov"), 1L).otherwise(0L)),
        sum(when(concat_ws("", col("pieces")) =!= col("word"), 1L)
          .otherwise(0L))).head()
    assert(oddSeg.getLong(0) >= 1)
    assert(oddSeg.getLong(1) == 0)
  }

  test("prune loop lands exactly at the multi-char budget") {
    val m = UnigramLm.train(corpus, "text", vocabSize = 30,
      maxPieceLen = 4, emRounds = 1, seedSize = 200)
    val singles = m.vocab.filter(length(col("piece")) === 1).count()
    val multis = m.vocab.filter(length(col("piece")) > 1).count()
    assert(multis <= math.max(0L, 30L - singles))
  }
}
