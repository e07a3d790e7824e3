package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Exactness sweep, round 3 (round-13 verdict ask #7): every threshold
  * that gates an oracle, exercised with a value constructed EXACTLY at
  * the boundary.
  *
  * Audit map of the threshold sites:
  *  - x58 `containment >= 0.9` — the one CROSS-ENGINE threshold (live
  *    oracle recomputes ratio + gate in DuckDB). The raw `round(k/m, 4)`
  *    formulation was tie-possible: 3/160 = 0.01875 is an exact
  *    4-decimal midpoint whose nearest double sits BELOW it, so Spark's
  *    BigDecimal-of-the-double rounded DOWN (0.0187) while DuckDB's
  *    scale-multiply re-rounded ONTO 187.5 and went UP (0.0188) — found
  *    by exhaustive sweep of k/m, m < 4000. Fixed via
  *    [[Terms.ratioRound4]] (exact integer HALF_UP) with the `//`
  *    mirror in the oracle; pinned below on that exact witness.
  *  - x05/x59 `cos >= minCos` (0.99) — SINGLE-engine: both are frozen
  *    VALUES oracles, the filter only ever runs in Spark, and the
  *    per-pair dot product has a fixed evaluation order, so no
  *    cross-engine tie exists. The inclusive-at-exact-tie semantics are
  *    pinned below with Pythagorean-norm vectors (integer norms make
  *    the cosine bit-exact).
  *  - x25 `minRatio = 0.9` span verify and the x85 spec's `> 0.9` — the
  *    compared quantities are integer-ratio / measured-cos values never
  *    constructed near the boundary by the fixtures (x85 pair cosines
  *    are all ≥ 0.95); single-engine besides.
  */
class ThresholdExactnessSpec extends SparkSpec {

  test("x58 containment: exact-rational HALF_UP at the 3/160 midpoint witness") {
    import spark.implicits._
    // bench prompt with exactly 160 distinct 13-grams (172 distinct
    // tokens), doc covering exactly the first 3 grams (15 tokens)
    val benchToks = (1 to 172).map(i => s"w$i")
    val bench = Seq((5000L, benchToks.mkString(" "))).toDF("bench_id", "prompt")
    val doc = Seq((1L, benchToks.take(15).mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.containmentDecontaminate(doc, "doc_id", "text",
      bench, "bench_id", "prompt", n = 13, minRatio = 0.9).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_matched") == 3L &&
      r(0).getAs[Long]("n_bench_grams") == 160L)
    // 3/160 = 0.01875 exactly — HALF_UP must go UP to 0.0188 (the
    // double-round formulation gave 0.0187 here, disagreeing with the
    // oracle's 0.0188)
    assert(r(0).getAs[Double]("containment") == 0.0188,
      s"containment = ${r(0).getAs[Double]("containment")}")
    assert(!r(0).getAs[Boolean]("contaminated"))
  }

  test("x58 containment: a ratio exactly AT the 0.9 gate is contaminated (inclusive)") {
    import spark.implicits._
    val benchToks = (1 to 22).map(i => s"w$i") // 10 distinct 13-grams
    val bench = Seq((5000L, benchToks.mkString(" "))).toDF("bench_id", "prompt")
    val docs = Seq(
      (1L, benchToks.take(21).mkString(" ")), // 9 grams → 9/10 = 0.9 exact
      (2L, benchToks.take(20).mkString(" "))) // 8 grams → 0.8
      .toDF("doc_id", "text")
    val rows = Dedup.containmentDecontaminate(docs, "doc_id", "text",
      bench, "bench_id", "prompt", n = 13, minRatio = 0.9)
      .orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("containment") == 0.9 &&
      rows(0).getAs[Boolean]("contaminated"),
      "9/10 must land exactly at the gate and be INCLUDED")
    assert(rows(1).getAs[Double]("containment") == 0.8 &&
      !rows(1).getAs[Boolean]("contaminated"))
  }

  test("cosine tie exactness: integer-norm vectors make cos == threshold bit-exact") {
    import spark.implicits._
    // Pythagorean directions: |(3,4)| = 5 and |(4,3)| = 5 EXACTLY (IEEE
    // sqrt is exact on perfect squares), dot = 24 exactly, so
    // cos = 24/25 — and the correctly-rounded division yields the SAME
    // double the literal 0.96 parses to: a true bit-exact tie
    val pair = Seq((Seq(3.0, 4.0), Seq(4.0, 3.0)))
      .toDF("a", "b")
      .select(Similarity.cosineWithNorms(col("a"), col("b"),
        Similarity.norm(col("a")), Similarity.norm(col("b"))).as("cos"))
      .collect()(0).getDouble(0)
    assert(pair == 0.96, s"cos(3·4, 4·3) = $pair — expected a bit-exact 0.96")
    assert(pair >= 0.96 && !(pair >= math.nextUp(0.96)))
  }

  test("embeddingDups keeps a pair sitting exactly AT minCos (>= is inclusive)") {
    import spark.implicits._
    // colinear integer-norm vectors: same direction → same hyperplane
    // bucket deterministically; cos = 50/(5·10) = 1.0 EXACT — the most
    // extreme threshold value representable, exercised at minCos = 1.0
    val emb = Seq(
      (1L, Seq(3.0, 4.0)),
      (2L, Seq(6.0, 8.0)),
      (3L, Seq(-4.0, 3.0))) // orthogonal bystander
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDups(emb, "vec_id", "embedding",
      minCos = 1.0).collect()
    assert(pairs.length == 1 &&
      pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 2L,
      s"exact-tie pair lost at minCos = 1.0: ${pairs.mkString(", ")}")
    assert(pairs(0).getAs[Double]("cos") == 1.0)
    // nothing survives a threshold an ulp past the maximum
    assert(Dedup.embeddingDups(emb, "vec_id", "embedding",
      minCos = 1.0).filter(col("cos") >= math.nextUp(1.0)).count() == 0)
  }

  test("x90 rrf: kRrf + rank = 128 lands EXACTLY on the 1/128 = 0.0078125 " +
      "midpoint and HALF_UPs to 0.007813 (exact-integer pipeline witness)") {
    import spark.implicits._
    import graft.functions.TextVectorExpressions.hashed_tf_vec
    // kRrf is caller-chosen: 127 makes the rank-1 term 1/128 — an exact
    // 6-decimal midpoint, the round-12 hazard class. The exact-integer
    // rrf pipeline ((10¹⁵ + d div 2) div d summed, then 6-decimal integer
    // HALF_UP) must round UP here on every engine; the retired
    // round(double, 6) formulation sat one representability accident
    // from disagreeing with any future live oracle.
    val docs = (0L to 7L).map(d => (d, s"alpha w${d}a w${d}b w${d}c"))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_rrf128").toString
    val corpus = docs.select(col("doc_id").as("c_id"),
      hashed_tf_vec(col("text"), 64).as("c_vec"))
    AnnIndexStore.save(spark, s"$base/ann",
      Similarity.buildIvf(corpus, "c_id", "c_vec", k = 2, iters = 1),
      Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 4, iters = 1))
    LexIndexStore.build(spark, s"$base/lex", docs, "doc_id", "text",
      nBuckets = 4)
    // the query token appears in NO document: the lexical side returns
    // nothing, so every fused candidate is single-sided at its pure ANN
    // rank — rank r's rrf is exactly HALF_UP₆(1/(127+r))
    val q = Seq((9L, "qqqabsent")).toDF("query_id", "qtext")
    val rows = Retrieval.hybridTopK(spark, s"$base/ann", s"$base/lex",
      q, "query_id", "qtext", dim = 64, k = 3, nCand = 3, kRrf = 127,
      rerank = 8)
      .orderBy("rank").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.isNullAt(4)), "lexical side should be empty here")
    // 1/128 = .0078125 → UP; 1/129 = .00775193… → .007752; 1/130 → .007692
    assert(rows.map(_.getDouble(2)).toSeq ==
      Seq(0.007813, 0.007752, 0.007692),
      s"rrf midpoint witness broke: ${rows.map(_.getDouble(2)).toSeq}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
