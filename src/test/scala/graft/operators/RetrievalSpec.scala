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
    // the operator's exact-integer pipeline, re-derived independently:
    // 10¹⁵-scaled HALF_UP terms, long sum, 6-decimal HALF_UP quotient
    def term(rank: Option[Int]): Long = rank.fold(0L) { r =>
      val d = (kRrf + r).toLong
      (1000000000000000L + d / 2) / d
    }
    val expected = (annRanks.keySet ++ lexRanks.keySet).toSeq
      .map(key => (key._1, key._2,
        term(annRanks.get(key)) + term(lexRanks.get(key))))
      .groupBy(_._1).flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
          case ((_, did, s), i) => (qid, i + 1) ->
            (did, ((s + 500000000L) / 1000000000L).toDouble / 1000000.0)
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

  test("retrieval-quality floor: hybrid recall@k strictly beats EACH single " +
      "side at the same k on a planted mixed workload") {
    import spark.implicits._
    import graft.functions.TextVectorExpressions.hashed_tf_vec
    // The workload fusion exists for: one query family only the SEMANTIC
    // side can answer (docs sharing the query's embedding-space feature
    // bucket with ZERO token overlap — the paraphrase analog in hashed-TF
    // space), one only the LEXICAL side can (a rare exact term whose
    // embedding neighborhood is swamped by same-bucket impostors). Both
    // plantings are deterministic engine arithmetic (xxhash64 buckets),
    // discovered at runtime, never hardcoded.
    val dim = 64
    def bucketOf(tokens: Seq[String]): Map[String, Int] =
      tokens.toDF("t")
        .select(col("t"), hashed_tf_vec(col("t"), dim).as("v"))
        .collect()
        .map(r => r.getString(0) ->
          r.getSeq[Double](1).zipWithIndex.maxBy(_._1)._2)
        .toMap
    // two base terms in DISTINCT buckets, then a zero-overlap "synonym"
    // (collides with semA's bucket) and a swamp impostor token (collides
    // with lexA's bucket)
    val bases = bucketOf(Seq("alphaterm", "betaterm", "gammaterm", "deltaterm"))
    val Seq((semA, _), (lexA, _)) = bases.toSeq.sortBy(_._1).combinations(2)
      .collectFirst { case pair if pair(0)._2 != pair(1)._2 => pair }.get
    val cands = bucketOf((0 until 400).map(i => s"qq$i"))
    val synonym = cands.toSeq.sortBy(_._1)
      .collectFirst { case (t, b) if b == bases(semA) => t }.get
    val impostor = cands.toSeq.sortBy(_._1)
      .collectFirst { case (t, b) if b == bases(lexA) && t != synonym => t }.get
    // corpus: 0-2 semantic-relevant (semA only — found via the colliding
    // synonym, lexically invisible to it); 3-5 lexical-relevant (lexA
    // buried in 19 junk tokens — weak cosine); 6-19 filler; 20-25 swamp
    // (impostor only: cosine 1.0 with the lexA query, no lexA token)
    val docs = (
      (0L to 2L).map(d => (d, semA)) ++
      (3L to 5L).map(d => (d, (Seq(lexA) ++ (0 until 19).map(j => s"j${d}x$j"))
        .mkString(" "))) ++
      (6L to 19L).map(d => (d, s"f${d}a f${d}b f${d}c")) ++
      (20L to 25L).map(d => (d, impostor))
    ).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("graft_floor").toString
    val corpus = docs.select(col("doc_id").as("c_id"),
      hashed_tf_vec(col("text"), dim).as("c_vec"))
    AnnIndexStore.save(spark, s"$base/ann",
      Similarity.buildIvf(corpus, "c_id", "c_vec", k = 4, iters = 2),
      Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2))
    LexIndexStore.build(spark, s"$base/lex", docs, "doc_id", "text",
      nBuckets = 8)
    val relevance = Map(9001L -> Set(0L, 1L, 2L), 9002L -> Set(3L, 4L, 5L))
    val queries = Seq((9001L, synonym), (9002L, lexA)).toDF("query_id", "qtext")
    val k = 5
    def recall(hits: Map[Long, Set[Long]]): Double =
      relevance.map { case (q, rel) =>
        hits.getOrElse(q, Set.empty).intersect(rel).size.toDouble / rel.size
      }.sum / relevance.size
    val hybrid = recall(Retrieval.hybridTopK(spark, s"$base/ann", s"$base/lex",
      queries, "query_id", "qtext", dim = dim, k = k, nCand = 10, rerank = 50)
      .select("query_id", "doc_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet })
    val annOnly = recall(AnnIndexStore.searchTopK(
      AnnIndexStore.load(spark, s"$base/ann"),
      queries.select(col("query_id").as("q_id"),
        hashed_tf_vec(col("qtext"), dim).as("q_vec")),
      "c_id", "c_vec", "q_id", "q_vec", k = k, rerank = 50)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet })
    val lexOnly = recall(LexIndexStore.searchTopK(spark, s"$base/lex",
      queries, "query_id", "qtext", k = k)
      .select("query_id", "doc_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet })
    // the measured claim fusion stands on: each side alone caps at half
    // the workload; the fusion recovers (all of) both
    assert(annOnly <= 0.5 + 1e-9,
      s"planting broke: ann-only recall $annOnly should cap at 0.5")
    assert(lexOnly <= 0.5 + 1e-9,
      s"planting broke: lex-only recall $lexOnly should cap at 0.5")
    assert(hybrid > annOnly && hybrid > lexOnly,
      s"hybrid recall $hybrid does not beat both sides (ann $annOnly, lex $lexOnly)")
    assert(hybrid == 1.0, s"hybrid recall $hybrid != 1.0 on the planted corpus")
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
