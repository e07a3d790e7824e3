package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftExtensions, SparkSpec}
import graft.operators.{AnnIndexStore, Dedup, LexIndexStore, Similarity}
import graft.tables.Tables

/** The SQL-surface contract for the operator FAMILIES: a session built
  * with the extensions installed must answer ANN search, BM25 search, and
  * dedup keep-verdict queries from plain `spark.sql` strings, and those
  * answers must be ROW-IDENTICAL to the Scala API the TVFs wrap — the
  * TVF layer is a calling convention, never a second implementation.
  */
class SqlTableFunctionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withExtSession[T](f: SparkSession => T): T = {
    val master = spark.sparkContext.master
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    assert(ext ne spark, "builder returned the suite session — extensions untested")
    try f(ext)
    finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Row] = df.collect().toSeq

  test("ann_topk TVF ≡ AnnIndexStore.searchTopK (persisted index, rerank path)") {
    withExtSession { s =>
      val emb = Tables.embeddings(s, sf)
      val corpus = emb.select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
      val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 4, iters = 2)
      val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 8, k = 8, iters = 2)
      val dir = java.nio.file.Files.createTempDirectory("graft_tvf_ann").toString + "/idx"
      AnnIndexStore.save(s, dir, ivf, pq)
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      queries.createOrReplaceTempView("tvf_ann_q")
      val viaSql = rows(s.sql(
        s"SELECT query_id, neighbor_id, cos, rank FROM ann_topk('$dir', " +
          "'tvf_ann_q', 'c_id', 'c_vec', 'q_id', 'q_vec', 3, 20) " +
          "ORDER BY query_id, rank"))
      val viaScala = rows(AnnIndexStore.searchTopK(
        AnnIndexStore.load(s, dir), queries,
        "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 20)
        .select("query_id", "neighbor_id", "cos", "rank")
        .orderBy("query_id", "rank"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("bm25_topk TVF ≡ LexIndexStore.searchTopK (persisted inverted index)") {
    withExtSession { s =>
      val dir = java.nio.file.Files.createTempDirectory("graft_tvf_lex").toString + "/idx"
      LexIndexStore.build(s, dir, Tables.documents(s, sf), "doc_id", "text",
        nBuckets = 16)
      val q = s.createDataFrame(Seq((1L, "hash join"), (2L, "window merge sort")))
        .toDF("query_id", "qtext")
      q.createOrReplaceTempView("tvf_bm25_q")
      val viaSql = rows(s.sql(
        s"SELECT * FROM bm25_topk('$dir', 'tvf_bm25_q', 'query_id', 'qtext', 4) " +
          "ORDER BY query_id, rank"))
      val viaScala = rows(LexIndexStore.searchTopK(s, dir, q,
        "query_id", "qtext", k = 4).orderBy("query_id", "rank"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("dedup_keep TVF ≡ minhashLsh → keepDecisions, keepers load-bearing") {
    withExtSession { s =>
      val docs = graft.queries.ExtensionQueries.plantTextDups(
        Tables.documents(s, sf))
      docs.createOrReplaceTempView("tvf_dedup_docs")
      val viaSql = rows(s.sql(
        "SELECT doc_id, cluster_id, keep FROM dedup_keep('tvf_dedup_docs', " +
          "'doc_id', 'text', 3, 32, 8, 0.5) ORDER BY doc_id"))
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, minJaccard = 0.5)
      val viaScala = rows(Dedup.keepDecisions(docs, "doc_id", pairs)
        .select("doc_id", "cluster_id", "keep").orderBy("doc_id"))
      assert(viaSql == viaScala)
      // the planted copies (id ≥ 1,000,000) must all be dropped in favor
      // of their lower-id originals — keep=false rows are load-bearing
      val planted = viaSql.filter(_.getLong(0) >= 1000000L)
      assert(planted.nonEmpty && planted.forall(!_.getBoolean(2)))
    }
  }

  test("registerOnce: TVFs opt in on a plain session (no extensions), idempotently") {
    // the suite session was built WITHOUT the extensions — the
    // imperative path must make the TVFs resolvable there too
    TableFunctions.registerOnce(spark)
    TableFunctions.registerOnce(spark) // idempotent, no replace-warning churn
    val docs = Tables.documents(spark, sf)
    docs.select("doc_id", "text").createOrReplaceTempView("plain_docs")
    val out = spark.sql(
      "SELECT count(*) FROM dedup_keep('plain_docs', 'doc_id', 'text', 3, 16, 4, 0.5)")
      .head().getLong(0)
    assert(out == docs.count())
  }

  test("TVF arity errors surface as analysis-time failures, not wrong results") {
    withExtSession { s =>
      val e = intercept[Exception](
        s.sql("SELECT * FROM bm25_topk('x', 'y', 3)").collect())
      assert(e.getMessage.contains("5 arguments"))
    }
  }

  test("line_dedup TVF ≡ TextOps.lineDedup, boilerplate load-bearing") {
    withExtSession { s =>
      val docs = graft.queries.ExtensionQueries.plantBoilerplate(
        Tables.documents(s, sf).select(col("doc_id"), col("text")))
      docs.createOrReplaceTempView("tvf_line_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM line_dedup('tvf_line_docs', 'doc_id', 'text', 3) " +
          "ORDER BY doc_id"))
      val viaScala = rows(graft.operators.TextOps
        .lineDedup(docs, "doc_id", "text", minDocs = 3).orderBy("doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // planted template pages actually lost their nav/footer lines
      assert(viaSql.exists(r => r.getLong(1) > r.getLong(2)))
    }
  }

  test("bloom_new_ids TVF ≡ Skew.bloomNewIds, BIGINT mBits accepted") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf).select(col("doc_id"), col("text"))
      docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("tvf_bloom_seen")
      val inc = docs.filter(col("doc_id") % 2 === 1).unionByName(
        docs.filter(col("doc_id") % 2 === 0 && col("doc_id") < 10).select(
          (col("doc_id") + 5000L).as("doc_id"), col("text")))
      inc.createOrReplaceTempView("tvf_bloom_inc")
      // 8589934592 = 2^33: past Int range, the 100 TB-sized literal
      val viaSql = rows(s.sql(
        "SELECT doc_id, is_new FROM bloom_new_ids('tvf_bloom_seen', " +
          "'tvf_bloom_inc', 'doc_id', 'text', 8589934592, 5) ORDER BY doc_id"))
      val viaScala = rows(graft.operators.Skew
        .bloomNewIds(docs.filter(col("doc_id") % 2 === 0), inc,
          "doc_id", "text", mBits = 8589934592L, k = 5)
        .select("doc_id", "is_new").orderBy("doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // the planted exact copies are the keep=false mass
      assert(viaSql.count(r => !r.getBoolean(1)) == 5)
    }
  }

  test("media_probe TVF ≡ Multimodal.containerProbe, real ISO-BMFF probed") {
    withExtSession { s =>
      import s.implicits._
      val assets = graft.operators.Multimodal
        .syntheticAssets(Tables.documents(s, sf))
        .select("asset_id", "media_type", "content")
        .unionByName(Seq((900001L, "video",
          graft.operators.Multimodal.makeIsoBmff("isom", 12000L, 1, 1)))
          .toDF("asset_id", "media_type", "content"))
      assets.createOrReplaceTempView("tvf_media_assets")
      val viaSql = rows(s.sql(
        "SELECT * FROM media_probe('tvf_media_assets') ORDER BY asset_id"))
      val viaScala = rows(graft.operators.Multimodal.containerProbe(assets)
        .orderBy("asset_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // the planted MP4's box walk actually resolved
      val mp4 = viaSql.find(_.getLong(0) == 900001L).get
      assert(mp4.getString(2) == "isobmff" && mp4.getString(8) == "isom")
    }
  }

  test("weighted_sample TVF ≡ TextOps.weightedSample") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_ws_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM weighted_sample('tvf_ws_docs', 'doc_id', " +
          "'n_chars', 25, 'graft') ORDER BY doc_id"))
      val viaScala = rows(graft.operators.TextOps.weightedSample(
        docs, "doc_id", col("n_chars"), k = 25, seed = "graft")
        .orderBy("doc_id"))
      assert(viaSql.length == 25 && viaSql == viaScala)
    }
  }

  test("trigram_kn_score TVF ≡ scoreTrigramKn over a persisted model") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf).select(col("doc_id"), col("text"))
      val dir = java.nio.file.Files.createTempDirectory("tvf_kn").toString
      graft.operators.Terms.saveTrigramKn(
        graft.operators.Terms.trainTrigramKn(docs, "doc_id", "text"), dir)
      docs.createOrReplaceTempView("tvf_kn_docs")
      val viaSql = rows(s.sql(
        s"SELECT * FROM trigram_kn_score('$dir', 'tvf_kn_docs', " +
          "'doc_id', 'text') ORDER BY doc_id"))
      val viaScala = rows(graft.operators.Terms.scoreTrigramKn(
        graft.operators.Terms.loadTrigramKn(s, dir), docs, "doc_id", "text")
        .orderBy("doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("heavy_hitters TVF ≡ Skew.heavyHittersExact, planted heavies load-bearing") {
    withExtSession { s =>
      import s.implicits._
      // 60% one hot key, the rest spread over 40 light keys — only the
      // hot key crosses phi = 0.25
      val items = s.range(1000).select(
        when(col("id") % 5 < 3, lit("hot"))
          .otherwise(concat(lit("cold_"), pmod(col("id"), lit(40)))).as("item"))
      items.createOrReplaceTempView("tvf_hh_items")
      val viaSql = rows(s.sql(
        "SELECT * FROM heavy_hitters('tvf_hh_items', 'item', 0.25) ORDER BY item"))
      val viaScala = rows(graft.operators.Skew
        .heavyHittersExact(items, "item", phi = 0.25).orderBy("item"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      assert(viaSql.map(_.getString(0)) == Seq("hot") &&
        viaSql.head.getLong(1) == 600L)
    }
  }

  test("asof_join TVF ≡ AsofJoin.asofJoin (keys/rightCols CSV forms, tolerance arg)") {
    withExtSession { s =>
      val ev = Tables.events(s, sf)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"),
          col("value"))
      purchases.createOrReplaceTempView("tvf_asof_l")
      clicks.createOrReplaceTempView("tvf_asof_r")
      // the col:alias CSV form carries TWO right columns, one renamed
      val viaSql = rows(s.sql(
        "SELECT * FROM asof_join('tvf_asof_l', 'tvf_asof_r', 'user_id', " +
          "'ts', 'ts', 'click_id,value:click_value', 'click_id') " +
          "ORDER BY event_id"))
      val viaScala = rows(graft.operators.AsofJoin.asofJoin(
        purchases, clicks, Seq("user_id"), "ts", "ts",
        Map("click_id" -> "click_id", "value" -> "click_value"),
        rightTieBreak = "click_id").orderBy("event_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // 8th arg = tolerance in the ts column's own units (nanos here)
      val tolSql = rows(s.sql(
        "SELECT * FROM asof_join('tvf_asof_l', 'tvf_asof_r', 'user_id', " +
          "'ts', 'ts', 'click_id', 'click_id', 600000000000) " +
          "ORDER BY event_id"))
      val tolScala = rows(graft.operators.AsofJoin.asofJoin(
        purchases, clicks, Seq("user_id"), "ts", "ts",
        Map("click_id" -> "click_id"), rightTieBreak = "click_id",
        tolerance = Some(600000000000L)).orderBy("event_id"))
      assert(tolSql.nonEmpty && tolSql == tolScala)
    }
  }

  test("sessionize TVF ≡ Sessionize.sessionize and composes into SQL GROUP BY") {
    withExtSession { s =>
      val ev = Tables.events(s, sf)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      ev.createOrReplaceTempView("tvf_sess_ev")
      val viaSql = rows(s.sql(
        "SELECT user_id, session_seq, count(*) AS n " +
          "FROM sessionize('tvf_sess_ev', 'user_id', 'ts', 'event_id', " +
          "1800000000000) GROUP BY user_id, session_seq " +
          "ORDER BY user_id, session_seq"))
      val viaScala = rows(graft.operators.Sessionize.sessionize(
        ev, Seq("user_id"), "ts", "event_id", maxGap = 1800000000000L)
        .groupBy("user_id", "session_seq").agg(count(lit(1)).as("n"))
        .orderBy("user_id", "session_seq"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("chunk_docs TVF ≡ TextOps.chunk (overlapping stride)") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_chunk_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM chunk_docs('tvf_chunk_docs', 'doc_id', 'text', " +
          "64, 48) ORDER BY doc_id, chunk_idx"))
      val viaScala = rows(graft.operators.TextOps.chunk(
        docs, "doc_id", "text", chunkSize = 64, stride = 48)
        .orderBy("doc_id", "chunk_idx"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("pack_sequences TVF ≡ Pack.packSequences (documented analysis-time offsets)") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_pack_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM pack_sequences('tvf_pack_docs', 'doc_id', 'text', " +
          "128) ORDER BY doc_id, seq_id"))
      val viaScala = rows(graft.operators.Pack.packSequences(
        docs, "doc_id", "text", budget = 128)
        .orderBy("doc_id", "seq_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("stratified_sample TVF ≡ TextOps.stratifiedSample") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_strat_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM stratified_sample('tvf_strat_docs', 'doc_id', " +
          "'lang', 4) ORDER BY lang, rank"))
      val viaScala = rows(graft.operators.TextOps.stratifiedSample(
        docs, "doc_id", "lang", perStratum = 4)
        .orderBy("lang", "rank"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // every stratum is capped, ranks dense from 1
      viaSql.groupBy(_.getString(0)).foreach { case (_, rs) =>
        assert(rs.length <= 4)
        assert(rs.map(_.getLong(2)).sorted == (1L to rs.length.toLong))
      }
    }
  }

  test("shuffle_shards TVF ≡ TextOps.shuffleShards") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_shard_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM shuffle_shards('tvf_shard_docs', 'doc_id', 4, " +
          "'seedX') ORDER BY shard, pos"))
      val viaScala = rows(graft.operators.TextOps.shuffleShards(
        docs, "doc_id", nShards = 4, seed = "seedX")
        .orderBy("shard", "pos"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // total: every document landed in exactly one shard
      assert(viaSql.map(_.getLong(0)).distinct.length ==
        docs.count().toInt)
    }
  }

  test("budget_select TVF ≡ TextOps.budgetSelect (budgetsCsv form, malformed refused)") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_budget_docs")
      val viaSql = rows(s.sql(
        "SELECT doc_id, source, n_tokens, cum_tokens FROM budget_select(" +
          "'tvf_budget_docs', 'doc_id', 'source', 'text', " +
          "'src1:500,src2:300', 'n_chars') ORDER BY source, cum_tokens, doc_id"))
      val viaScala = rows(graft.operators.TextOps.budgetSelect(
        docs, "doc_id", "source", "text",
        Map("src1" -> 500L, "src2" -> 300L), quality = col("n_chars"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
        .orderBy("source", "cum_tokens", "doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // unlisted sources drop entirely
      assert(viaSql.map(_.getString(1)).toSet == Set("src1", "src2"))
      // malformed budget entries are analysis-time refusals
      intercept[Exception](s.sql(
        "SELECT * FROM budget_select('tvf_budget_docs', 'doc_id', " +
          "'source', 'text', 'src1:oops', 'n_chars')"))
      intercept[Exception](s.sql(
        "SELECT * FROM budget_select('tvf_budget_docs', 'doc_id', " +
          "'source', 'text', 'src1', 'n_chars')"))
    }
  }

  test("resample_locf TVF ≡ Resample.resampleLocf") {
    withExtSession { s =>
      val ev = Tables.events(s, sf).filter(col("user_id") < 10)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      ev.createOrReplaceTempView("tvf_locf_ev")
      val viaSql = rows(s.sql(
        "SELECT * FROM resample_locf('tvf_locf_ev', 'user_id', 'ts', " +
          "'value', 21600000000000, 'event_id') " +
          "ORDER BY user_id, grid_ts"))
      val viaScala = rows(graft.operators.Resample.resampleLocf(
        ev, "user_id", "ts", "value", step = 21600000000000L,
        tieBreak = "event_id").orderBy("user_id", "grid_ts"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("pii_scrub TVF ≡ TextOps.piiScrub, detections load-bearing") {
    withExtSession { s =>
      import s.implicits._
      val docs = Seq(
        (1L, "mail me at jo.doe@example.com or call 555-123-4567 today"),
        (2L, "server at 10.0.0.1 holds ssn 123-45-6789"),
        (3L, "nothing sensitive here at all")).toDF("doc_id", "text")
      docs.createOrReplaceTempView("tvf_pii_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM pii_scrub('tvf_pii_docs', 'doc_id', 'text') " +
          "ORDER BY doc_id"))
      val viaScala = rows(graft.operators.TextOps.piiScrub(
        docs, "doc_id", "text").orderBy("doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      // the fixture is load-bearing: detections actually fire
      assert(viaSql.head.getAs[Number]("n_email").longValue() == 1L)
    }
  }

  test("decontaminate TVF ≡ Dedup.decontaminate (verify arg honored)") {
    withExtSession { s =>
      import s.implicits._
      val toks = (1 to 40).map(i => s"t$i").mkString(" ")
      val corpus = Seq((1L, toks), (2L, "wholly unrelated text body here"))
        .toDF("doc_id", "text")
      val bench = Seq((100L, (5 to 20).map(i => s"t$i").mkString(" ")))
        .toDF("bench_id", "prompt")
      corpus.createOrReplaceTempView("tvf_dec_corpus")
      bench.createOrReplaceTempView("tvf_dec_bench")
      val viaSql = rows(s.sql(
        "SELECT * FROM decontaminate('tvf_dec_corpus', 'doc_id', 'text', " +
          "'tvf_dec_bench', 'bench_id', 'prompt', 8, true) " +
          "ORDER BY doc_id, benchmark_id, span_start"))
      val viaScala = rows(graft.operators.Dedup.decontaminate(
        corpus, "doc_id", "text", bench, "bench_id", "prompt",
        n = 8, verify = true)
        .orderBy("doc_id", "benchmark_id", "span_start"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("containment_decontaminate TVF ≡ Dedup.containmentDecontaminate") {
    withExtSession { s =>
      import s.implicits._
      val toks = (1 to 40).map(i => s"t$i").mkString(" ")
      val corpus = Seq((1L, toks), (2L, "wholly unrelated text body here"))
        .toDF("doc_id", "text")
      val bench = Seq((100L, (1 to 26).map(i => s"t$i").mkString(" ")))
        .toDF("bench_id", "prompt")
      corpus.createOrReplaceTempView("tvf_cont_corpus")
      bench.createOrReplaceTempView("tvf_cont_bench")
      val viaSql = rows(s.sql(
        "SELECT * FROM containment_decontaminate('tvf_cont_corpus', " +
          "'doc_id', 'text', 'tvf_cont_bench', 'bench_id', 'prompt', " +
          "13, 0.9) ORDER BY doc_id, benchmark_id"))
      val viaScala = rows(graft.operators.Dedup.containmentDecontaminate(
        corpus, "doc_id", "text", bench, "bench_id", "prompt",
        n = 13, minRatio = 0.9).orderBy("doc_id", "benchmark_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      assert(viaSql.head.getAs[Boolean]("contaminated"))
    }
  }

  test("semdedup_keep TVF ≡ Dedup.semDeDup") {
    withExtSession { s =>
      val emb = Tables.embeddings(s, sf)
      emb.createOrReplaceTempView("tvf_sem_emb")
      val viaSql = rows(s.sql(
        "SELECT * FROM semdedup_keep('tvf_sem_emb', 'vec_id', " +
          "'embedding', 8, 0.99, 2) ORDER BY vec_id"))
      val viaScala = rows(Dedup.semDeDup(emb, "vec_id", "embedding",
        nClusters = 8, minCos = 0.99, iters = 2).orderBy("vec_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
    }
  }

  test("mix_sample TVF ≡ TextOps.mixSample (ratesCsv form, malformed refused)") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_mix_docs")
      val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25)
      val viaSql = rows(s.sql(
        "SELECT * FROM mix_sample('tvf_mix_docs', 'doc_id', 'source', " +
          "'src0:1.0,src1:0.5,src2:0.25') ORDER BY doc_id"))
      val viaScala = rows(graft.operators.TextOps.mixSample(
        docs, "doc_id", "source", rates).orderBy("doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      val e = intercept[Exception](s.sql(
        "SELECT * FROM mix_sample('tvf_mix_docs', 'doc_id', 'source', " +
          "'src0:notanumber')").collect())
      assert(e.getMessage.contains("not a double"))
    }
  }

  test("split_assign TVF ≡ splitAssign (default + custom weights, bad sum refused)") {
    withExtSession { s =>
      val docs = Tables.documents(s, sf)
      docs.createOrReplaceTempView("tvf_split_docs")
      val viaSql = rows(s.sql(
        "SELECT * FROM split_assign('tvf_split_docs', 'doc_id') " +
          "ORDER BY doc_id"))
      val viaScala = rows(docs.select(col("doc_id"),
        graft.operators.TextOps.splitAssign(col("doc_id")).as("split"))
        .orderBy("doc_id"))
      assert(viaSql.nonEmpty && viaSql == viaScala)
      val custom = rows(s.sql(
        "SELECT * FROM split_assign('tvf_split_docs', 'doc_id', " +
          "'train:0.5,test:0.5') ORDER BY doc_id"))
      val customScala = rows(docs.select(col("doc_id"),
        graft.operators.TextOps.splitAssign(col("doc_id"),
          Seq(("train", 0.5), ("test", 0.5))).as("split"))
        .orderBy("doc_id"))
      assert(custom.nonEmpty && custom == customScala)
      // weights that don't sum to 1 are the operator's own refusal,
      // surfaced at analysis
      val e = intercept[Exception](s.sql(
        "SELECT * FROM split_assign('tvf_split_docs', 'doc_id', " +
          "'train:0.5,test:0.4')").collect())
      assert(e.getMessage.contains("sum to 1"))
    }
  }
}
