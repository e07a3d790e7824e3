package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BPE training correctness: sequential-mode parity against a hand-rolled
  * in-memory reference, batched-mode invariants (determinism, in-round
  * symbol disjointness, round-trip), and the encoder's OOV fallback.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference sequential BPE over (word, count) pairs — the classic
    * algorithm, driver-side, for parity with `mergesPerRound = 1`.
    */
  private def referenceBpe(wordCounts: Map[String, Long], numMerges: Int,
      minPairCount: Long): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] =
      wordCounts.map { case (w, n) => w.split("").toVector -> n }
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var stop = false
    while (!stop && out.size < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _            =>
        }
      }
      val eligible = counts.filter(_._2 >= minPairCount)
      if (eligible.isEmpty) stop = true
      else {
        // same order as the engine: count desc, then (left, right) asc
        val ((l, r), pn) = eligible.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        out += ((l, r, pn))
        words = words.map { case (syms, n) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          syms.foreach { s =>
            if (merged.nonEmpty && merged.last == l && s == r)
              merged(merged.size - 1) = l + r
            else merged += s
          }
          merged.toVector -> n
        }.groupMapReduce(_._1)(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the dog sat on the log"),
    (3L, "a cat and a dog and a rat"),
    (4L, "the rat sat, the cat ran!"),
    (5L, "mats and rats and logs")).toDF("doc_id", "text")

  test("sequential mode (mergesPerRound=1) equals the reference BPE merge-for-merge") {
    val wc = Bpe.wordCounts(corpus, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = referenceBpe(wc, numMerges = 12, minPairCount = 2)
    val got = Bpe.train(corpus, "text", numMerges = 12,
      mergesPerRound = 1, minPairCount = 2)
      .merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq == expected,
      s"\ngot:      ${got.toSeq}\nexpected: $expected")
  }

  test("batched mode: deterministic, symbols disjoint per round, merges well-formed") {
    def run() = Bpe.train(corpus, "text", numMerges = 12,
      mergesPerRound = 4, minPairCount = 2)
    val m1 = run().merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val m2 = run().merges.orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(m1.toSeq == m2.toSeq, "batched training is nondeterministic")
    assert(m1.nonEmpty)
    // every merged symbol is exactly left+right; ranks are dense from 0
    m1.zipWithIndex.foreach { case ((rank, l, r, merged), i) =>
      assert(rank == i.toLong)
      assert(merged == l + r)
    }
  }

  test("selectBatch: chain-fuse guard rejects merged-symbol collisions either pick order") {
    def sel(ranked: Seq[(String, String)], want: Int = 8) =
      Bpe.selectBatch[(String, String)](ranked, want, identity, _ + _)
    // merged == later pair's LEFT: (a,bc) fuses to 'abc', (abc,d) would
    // chain onto it in the same one-scan pass (over-application)
    assert(sel(Seq(("a", "bc"), ("abc", "d"))) == Seq(("a", "bc")))
    assert(sel(Seq(("abc", "d"), ("a", "bc"))) == Seq(("abc", "d")))
    // merged == later pair's RIGHT: (x,abc) would miss fusions created
    // to its right in the same pass (under-application)
    assert(sel(Seq(("a", "bc"), ("x", "abc"))) == Seq(("a", "bc")))
    assert(sel(Seq(("x", "abc"), ("a", "bc"))) == Seq(("x", "abc")))
    // two pairs fusing to the SAME symbol defer the lower-ranked one
    assert(sel(Seq(("a", "bc"), ("ab", "c"))) == Seq(("a", "bc")))
    // plain symbol-disjointness still enforced; want respected
    assert(sel(Seq(("a", "b"), ("b", "c"))) == Seq(("a", "b")))
    assert(sel(Seq(("a", "b"), ("c", "d"), ("e", "f")), want = 2)
      == Seq(("a", "b"), ("c", "d")))
  }

  test("merge_fold one-scan chaining is real — why selectBatch guards merged symbols") {
    // the kernel fuses (a,bc)->abc and then IMMEDIATELY chains (abc,d)
    // onto the fusion it just created; sequential rounds would apply
    // (abc,d) only to 'abc' symbols that existed when it was ranked
    val out = Seq(Tuple1(Seq("a", "bc", "d"))).toDF("syms")
      .select(Bpe.applyMerges(col("syms"),
        Seq(("a", "bc"), ("abc", "d"))).as("o"))
      .head().getSeq[String](0)
    assert(out == Seq("abcd"))
  }

  test("round-trip: every trained word's segmentation concatenates back to the word") {
    val model = Bpe.train(corpus, "text", numMerges = 16,
      mergesPerRound = 4, minPairCount = 2)
    val bad = model.wordSegs
      .filter(concat_ws("", col("syms")) =!= col("word")).collect()
    assert(bad.isEmpty, s"round-trip broken for: ${bad.mkString(",")}")
    // and a merge actually happened (some word has fewer syms than chars)
    val mergedSomething = model.wordSegs
      .filter(size(col("syms")) < length(col("word"))).count()
    assert(mergedSomething > 0, "no word ever got a merged symbol")
  }

  test("segment: corpus re-segmentation joins trained segs; OOV falls back to chars") {
    val model = Bpe.train(corpus, "text", numMerges = 16,
      mergesPerRound = 4, minPairCount = 2)
    val seg = Bpe.segment(corpus, "doc_id", "text", model)
    assert(seg.filter(col("oov")).count() == 0)
    assert(seg.filter(concat_ws("", col("syms")) =!= col("word")).count() == 0)
    // word count conservation: one seg row per pre-token occurrence
    val nPretokens = corpus.select(
      sum(size(regexp_extract_all(col("text"),
        lit(TextOps.BpeTokenPattern), lit(0))))).head().getLong(0)
    assert(seg.count() == nPretokens)
    // OOV corpus: unseen words segment to chars, flagged
    val oovSeg = Bpe.segment(
      Seq((9L, "zyx unseen")).toDF("doc_id", "text"), "doc_id", "text", model)
    val rows = oovSeg.orderBy("word").collect()
    assert(rows.forall(_.getBoolean(3)), "unseen words not flagged oov")
    assert(rows.map(r => (r.getString(1), r.getSeq[String](2))).toSeq ==
      Seq(("unseen", Seq("u", "n", "s", "e", "e", "n")),
        ("zyx", Seq("z", "y", "x"))))
  }

  test("pair-count pass partial-aggregates before its exchange (the x39 shape)") {
    // the per-round plan property that makes training O(corpus) map +
    // one exchange per round: map-side combine on the pair counts
    val words = Bpe.wordCounts(corpus, "text")
      .withColumn("syms", split(col("word"), ""))
    val pairs = words.filter(size(col("syms")) >= 2)
      .select(col("n"), explode(
        transform(slice(col("syms"), lit(1), size(col("syms")) - 1),
          (x, i) => struct(x.as("l"),
            element_at(col("syms"), i + lit(2)).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("n")).as("pn"))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum"), plan)
  }
}
