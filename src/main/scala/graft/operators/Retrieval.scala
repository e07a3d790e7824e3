package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: reciprocal-rank fusion (RRF, Cormack et al. 2009)
  * of the two persisted search stores — BM25 postings
  * ([[LexIndexStore]]) for lexical match and IVF-PQ ANN
  * ([[AnnIndexStore]]) for semantic match — from NOTHING but query
  * text: the query embeds in-engine through the same `hashed_tf_vec`
  * kernel the x85 corpus pipeline uses, so the whole hybrid stack
  * (embed → two pruned index searches → fuse) runs with zero external
  * models. This is the standard first-stage retriever shape for
  * RAG-corpus curation and hard-negative mining: lexical recall catches
  * exact/rare-term matches the embedding blurs, semantic recall catches
  * paraphrases BM25 misses, and RRF — rank-only fusion — needs no score
  * calibration between the two (BM25 scores and cosines are not
  * commensurable; their RANKS are).
  *
  * rrf(d) = Σ_side 1 / (kRrf + rank_side(d)), summed over the sides
  * that returned d (a doc found by only one side scores that one term
  * — the fusion is a full outer join, never an intersection). Ties
  * (e.g. symmetric rank pairs) break on doc id, so the output order is
  * total and replay-stable.
  *
  * The score arithmetic is EXACT-INTEGER end to end (the
  * [[Terms.ratioRound4]] discipline): each term is the 10¹⁵-scaled
  * HALF_UP integer of 1/(kRrf+rank) — `(10¹⁵ + d div 2) div d` — the
  * terms sum as longs (≤ 2·nCand terms of ≤ 10¹⁵/(kRrf+1) each, far
  * inside Long), ranking orders on that exact sum, and the reported
  * `rrf` is the exact 6-decimal HALF_UP of it. A double-arithmetic
  * round(sum, 6) instead sits one representability accident from the
  * midpoint seam every avg-scored query already defused (round 12):
  * kRrf + rank = 128 makes 1/128 = 0.0078125 an exact 6-decimal
  * midpoint, and kRrf is caller-chosen. In integer space both engines
  * (and any future live oracle) agree bit for bit; the DuckDB mirror is
  * `(1000000000000000 + d//2)//d` summed, then `(S + 500000000)
  * //1000000000 / 1e6`.
  *
  * Scale posture: each side is its own pruned store read (token-bucket
  * postings / probed inverted lists — never a corpus scan); the fusion
  * joins two (queries × nCand)-bounded frames and ranks with a window
  * whose partitions hold ≤ 2·nCand rows — driver-safe and flat in the
  * corpus at any store size.
  */
object Retrieval {

  /** Fuse the two persisted stores' top-`nCand` lists into a hybrid
    * top-`k` per query: (query_id, doc_id, rrf, ann_rank, lex_rank,
    * rank). `annIdCol`/`annVecCol` are the names the ANN index was
    * built with; the lexical store's id column rides its own meta but
    * must be (or be renamed to) `doc_id`-compatible via `lexIdCol`.
    * `dim` must equal the hashed-TF dimension the ANN corpus was
    * embedded with — a mismatched query embedding would search a
    * different feature space and quietly return noise, so the load
    * asserts it against the stored codebook shape where possible.
    */
  def hybridTopK(spark: SparkSession, annIndexDir: String,
      lexIndexDir: String, queries: DataFrame, qidCol: String,
      qtextCol: String, dim: Int, k: Int, nCand: Int = 20, kRrf: Int = 60,
      rerank: Int = 50, annIdCol: String = "c_id",
      annVecCol: String = "c_vec", lexIdCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k ($k) must be >= 1")
    require(nCand >= k, s"nCand ($nCand) must be >= k ($k)")
    require(kRrf >= 1, s"kRrf ($kRrf) must be >= 1")
    import graft.functions.TextVectorExpressions.hashed_tf_vec
    val q = queries.select(col(qidCol).cast("long").as("_qid"),
      col(qtextCol).as("_qtext"))
    val ann = AnnIndexStore.searchTopK(
      AnnIndexStore.load(spark, annIndexDir),
      q.select(col("_qid").as("q_id"),
        hashed_tf_vec(col("_qtext"), dim).as("q_vec")),
      annIdCol, annVecCol, "q_id", "q_vec", k = nCand, rerank = rerank)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("rank").as("ann_rank"))
    val lex = LexIndexStore.searchTopK(spark, lexIndexDir,
      q.select(col("_qid").as("query_id"), col("_qtext").as("qtext")),
      "query_id", "qtext", k = nCand)
      .select(col("query_id"), col(lexIdCol).as("doc_id"),
        // normalize to INT alongside the ANN side's rank — a mixed
        // int/bigint rank pair would be a schema wart in every consumer
        col("rank").cast("int").as("lex_rank"))
    // exact 10¹⁵-scaled HALF_UP integer of 1/(kRrf + rank) — a missing
    // side's NULL rank coalesces to a 0 term (see the class doc for why
    // integer space, not round(double, 6))
    def rrfTerm(rank: org.apache.spark.sql.Column) = {
      val d = lit(kRrf.toLong) + rank.cast("long")
      coalesce(call_function("div",
        lit(1000000000000000L) + call_function("div", d, lit(2L)), d),
        lit(0L))
    }
    // full outer: a doc surfaced by one side only still fuses (its
    // missing side contributes 0) — hybrid recall is the UNION of the
    // two candidate sets, which is the whole point of running both
    val fused = ann.join(lex, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf_s", rrfTerm(col("ann_rank")) + rrfTerm(col("lex_rank")))
    // per-query candidate frames are ≤ 2·nCand rows — the window is
    // bounded by construction, never a global sort; ordering on the
    // EXACT integer sum keeps ranking and reported score one arithmetic
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_s").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        // exact 6-decimal HALF_UP of the 10⁻¹⁵-unit sum; the quotient
        // (≤ 2·nCand·10⁶/(kRrf+1)) is double-exact
        (call_function("div", col("rrf_s") + lit(500000000L),
          lit(1000000000L)).cast("double") / 1000000.0).as("rrf"),
        col("ann_rank"), col("lex_rank"), col("rank"))
  }
}
