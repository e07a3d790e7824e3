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
    // full outer: a doc surfaced by one side only still fuses (its
    // missing side contributes 0) — hybrid recall is the UNION of the
    // two candidate sets, which is the whole point of running both
    val fused = ann.join(lex, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("ann_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("lex_rank")), lit(0.0)))
    // per-query candidate frames are ≤ 2·nCand rows — the window is
    // bounded by construction, never a global sort
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), round(col("rrf"), 6).as("rrf"),
        col("ann_rank"), col("lex_rank"), col("rank"))
  }
}
