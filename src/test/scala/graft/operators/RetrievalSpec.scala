package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** Hybrid RRF retrieval over the two persisted stores. The fusion math
  * is re-derived independently in plain Scala from the two sides'
  * collected rank lists — the operator must match it row for row — and
  * the TVF form must equal the operator.
  */
class RetrievalSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def buildStores(base: String): Unit = {
    import graft.functions.TextVectorExpressions.hashed_tf_vec
    val docs = Tables.documents(spark, sf)
    val corpus = docs.select(col("doc_id").as("c_id"),
      hashed_tf_vec(col("text"), 64).as("c_vec"))
    AnnIndexStore.save(spark, s"$base/ann",
      Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2),
      Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 16, iters = 2))
    LexIndexStore.build(spark, s"$base/lex",
      docs.select(col("doc_id"), col("text")), "doc_id", "text",
      nBuckets = 16)
  }

  test("hybridTopK ≡ hand-computed RRF over the two sides' own rank lists") {
    import spark.implicits._
    import graft.functions.TextVectorExpressions.hashed_tf_vec
    val base = java.nio.file.Files.createTempDirectory("graft_hybrid").toString
    buildStores(base)
    val docs = Tables.documents(spark, sf)
    val queries = docs.filter(col("doc_id") < 3)
      .select((col("doc_id") + 9100L).as("query_id"),
        substring(col("text"), 1, 80).as("qtext"))
      .unionByName(Seq((9200L, "customer zzzunseen")).toDF("query_id", "qtext"))
    val k = 5
    val nCand = 10
    val kRrf = 60
    val got = Retrieval.hybridTopK(spark, s"$base/ann", s"$base/lex",
      queries, "query_id", "qtext", dim = 64, k = k, nCand = nCand,
      kRrf = kRrf, rerank = 50)
      .orderBy("query_id", "rank").collect()
    // independent fusion: collect each side's OWN top-nCand, fuse in
    // plain Scala (map arithmetic, no Spark), compare row for row
    val annRanks = AnnIndexStore.searchTopK(
      AnnIndexStore.load(spark, s"$base/ann"),
      queries.select(col("query_id").as("q_id"),
        hashed_tf_vec(col("qtext"), 64).as("q_vec")),
      "c_id", "c_vec", "q_id", "q_vec", k = nCand, rerank = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
    val lexRanks = LexIndexStore.searchTopK(spark, s"$base/lex",
      queries, "query_id", "qtext", k = nCand)
      .select("query_id", "doc_id", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        r.getAs[Number](2).intValue()).toMap
    val expected = (annRanks.keySet ++ lexRanks.keySet).toSeq
      .map { key =>
        val rrf = annRanks.get(key).map(r => 1.0 / (kRrf + r)).getOrElse(0.0) +
          lexRanks.get(key).map(r => 1.0 / (kRrf + r)).getOrElse(0.0)
        (key._1, key._2, rrf)
      }
      .groupBy(_._1).flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
          case ((_, did, rrf), i) => (qid, i + 1) ->
            (did, BigDecimal(rrf).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble)
        }
      }
    assert(got.nonEmpty)
    got.foreach { r =>
      val (did, rrf) = expected((r.getLong(0), r.getInt(5)))
      assert(r.getLong(1) == did && r.getDouble(2) == rrf,
        s"query ${r.getLong(0)} rank ${r.getInt(5)}: got " +
          s"(${r.getLong(1)}, ${r.getDouble(2)}), expected ($did, $rrf)")
    }
    assert(got.length == expected.size)
    // the full-outer contract is load-bearing: the result must carry
    // single-sided candidates from BOTH directions
    assert(got.exists(_.isNullAt(3)), "no lex-only candidate surfaced")
    assert(got.exists(_.isNullAt(4)), "no ann-only candidate surfaced")
    // a doc-prefix query's own document must make the hybrid top-k: it
    // is a verbatim lexical substring AND a high-cosine embedding.
    // (Rank 1 specifically is NOT guaranteed — the corpus carries
    // near-identical twin families and template-sharing docs that
    // legitimately out-fuse the source at an 80-char prefix.)
    (9100L to 9102L).foreach { qid =>
      val hits = got.filter(_.getLong(0) == qid).map(_.getLong(1)).toSet
      assert(hits.contains(qid - 9100L),
        s"prefix query $qid: source doc not in hybrid top-$k: $hits")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }

  test("hybrid_topk TVF ≡ Retrieval.hybridTopK") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_hybrid_tvf").toString
    buildStores(base)
    val queries = Seq((1L, "hash join"), (2L, "window merge sort"))
      .toDF("query_id", "qtext")
    queries.createOrReplaceTempView("tvf_hybrid_q")
    graft.sql.TableFunctions.registerOnce(spark)
    val viaSql = spark.sql(
      s"SELECT * FROM hybrid_topk('$base/ann', '$base/lex', " +
        "'tvf_hybrid_q', 'query_id', 'qtext', 64, 3) " +
        "ORDER BY query_id, rank").collect().toSeq
    val viaScala = Retrieval.hybridTopK(spark, s"$base/ann", s"$base/lex",
      queries, "query_id", "qtext", dim = 64, k = 3)
      .orderBy("query_id", "rank").collect().toSeq
    assert(viaSql.nonEmpty && viaSql == viaScala)
    // arity guard: 6 args must refuse at analysis
    intercept[Exception](spark.sql(
      s"SELECT * FROM hybrid_topk('$base/ann', '$base/lex', " +
        "'tvf_hybrid_q', 'query_id', 'qtext', 64)"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
  }
}
