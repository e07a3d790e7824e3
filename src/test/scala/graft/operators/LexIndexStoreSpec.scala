package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.ManifestMergeEngine

/** Persisted inverted-index lifecycle: build/add/delete/purge/search
  * parity with the on-the-fly [[Terms.bm25TopK]], the bucket-pruned scan
  * plan guard, replay healing, and the crash-ordering contracts the
  * maintenance ops document (doclens-before-postings; meta recomputed,
  * never ±delta'd).
  */
class LexIndexStoreSpec extends SparkSpec {

  private val engine = new ManifestMergeEngine()

  private def docs(maxId: Long): DataFrame = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .filter(col("doc_id") < maxId)
    .select("doc_id", "text")

  private def queryBatch: DataFrame = {
    import spark.implicits._
    Seq((1L, "hash join"), (2L, "window merge sort"),
      (3L, "spark stream vector"), (4L, "customer zzzunseen"))
      .toDF("query_id", "qtext")
  }

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("lexidx_spec").toString

  private def rows(out: DataFrame) =
    out.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4))).toSeq

  private def meta(dir: String) =
    engine.read(spark, s"$dir/meta").get
      .select("n_docs", "total_dl").head()

  test("metadata-filtered search: Lucene semantics, exact parity, mismatched increment refused") {
    import spark.implicits._
    val corpus = docs(400)
    val metadata = corpus.select(col("doc_id"),
      concat(lit("src"), pmod(col("doc_id"), lit(3))).as("source"))
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, corpus, "doc_id", "text", nBuckets = 16,
      engine = engine, metadata = Some(metadata))
    val pred = col("source") === "src1"
    val got = rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine, docPred = Some(pred)))
    // slice containment
    assert(got.nonEmpty && got.forall(_._2 % 3 == 1), got.toString)
    // EXACT parity with the Lucene filtered-query semantics: corpus-level
    // idf/avgdl, candidates restricted, re-ranked — i.e. the unfiltered
    // search with a huge k, post-filtered to the slice, re-ranked per
    // query and cut to k. BM25 scores must match to the digit.
    val unfiltered = LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 100000, engine = engine)
    val expect = unfiltered.filter(col("doc_id") % 3 === 1)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "doc_id", "n_hit_terms", "score", "rank")
    assert(got == rows(expect), s"got=$got expect=${rows(expect)}")
    // an increment WITHOUT the metadata column refuses loudly
    val inc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") >= 400 && col("doc_id") < 410)
      .select("doc_id", "text")
    val err = intercept[IllegalArgumentException] {
      LexIndexStore.addDocuments(spark, dir, inc, "doc_id", "text", engine)
    }
    assert(err.getMessage.contains("metadata columns"), err.getMessage)
    // with the column supplied, growth works and stays filterable
    LexIndexStore.addDocuments(spark, dir, inc, "doc_id", "text", engine,
      metadata = Some(inc.select(col("doc_id"),
        concat(lit("src"), pmod(col("doc_id"), lit(3))).as("source"))))
    val dl = engine.read(spark, s"$dir/doclens").get
    assert(dl.filter(col("source").isNull).count() == 0)
  }

  test("per-query matchCols: each query restricted to ITS OWN slice, exact re-rank parity") {
    import spark.implicits._
    val corpus = docs(400)
    val metadata = corpus.select(col("doc_id"),
      concat(lit("s"), pmod(col("doc_id"), lit(2))).as("source"))
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, corpus, "doc_id", "text", nBuckets = 16,
      engine = engine, metadata = Some(metadata))
    // the slice varies per query: q1/q3 want s0 docs, q2 wants s1
    val q = Seq((1L, "hash join", "s0"), (2L, "window merge sort", "s1"),
      (3L, "spark stream vector", "s0")).toDF("query_id", "qtext", "source")
    val got = rows(LexIndexStore.searchTopK(spark, dir, q,
      "query_id", "qtext", k = 5, engine = engine,
      matchCols = Seq("source")))
    val want = Map(1L -> 0L, 2L -> 1L, 3L -> 0L)
    assert(got.nonEmpty && got.forall(r => r._2 % 2 == want(r._1)), got.toString)
    // exact parity: unfiltered search with huge k, post-filtered to each
    // query's own slice, re-ranked, cut to k
    val unfiltered = LexIndexStore.searchTopK(spark, dir,
      q.drop("source"), "query_id", "qtext", k = 100000, engine = engine)
    val expect = unfiltered
      .join(q.select(col("query_id"), col("source").as("_want")), "query_id")
      .filter(concat(lit("s"), pmod(col("doc_id"), lit(2))) === col("_want"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rank") <= 5)
      .select("query_id", "doc_id", "n_hit_terms", "score", "rank")
    assert(got == rows(expect), s"got=$got expect=${rows(expect)}")
    // a matchCols column absent from doclens fails fast
    val err = intercept[IllegalArgumentException] {
      LexIndexStore.searchTopK(spark, dir,
        q.withColumnRenamed("source", "lang"), "query_id", "qtext", k = 5,
        engine = engine, matchCols = Seq("lang"))
    }
    assert(err.getMessage.contains("not stored in doclens"), err.getMessage)
  }

  test("build + searchTopK equals bm25TopK; scan is bucket-pruned") {
    val corpus = docs(400)
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, corpus, "doc_id", "text", nBuckets = 16,
      engine = engine)
    val live = rows(Terms.bm25TopK(corpus, "doc_id", "text",
      queryBatch, "query_id", "qtext", k = 5))
    val storedDf = LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine)
    assert(rows(storedDf) == live)

    // the query vocabulary's bucket set must reach the postings scan as a
    // literal partition filter — the read that keeps a search O(matched
    // postings) instead of O(corpus)
    val plan = storedDf.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters: [")).toSeq
    assert(pf.exists(l => l.contains("tb") && l.contains(" IN (")),
      s"tb bucket set not pushed as a partition filter:\n$plan")

    // a second build at the same path must refuse (rebuild = new path)
    intercept[IllegalArgumentException] {
      LexIndexStore.build(spark, dir, corpus, "doc_id", "text",
        engine = engine)
    }
  }

  test("addDocuments: growth parity, replay heals, stale meta self-repairs") {
    val all = docs(400)
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, all.filter(col("doc_id") < 200),
      "doc_id", "text", nBuckets = 16, engine = engine)

    // second add RE-SHIPS part of the first (checkpoint replay) plus
    // already-indexed base ids — absorbed, never double-counted
    LexIndexStore.addDocuments(spark, dir,
      all.filter(col("doc_id") >= 200 && col("doc_id") < 300),
      "doc_id", "text", engine = engine)
    LexIndexStore.addDocuments(spark, dir,
      all.filter(col("doc_id") >= 250 || col("doc_id") < 10),
      "doc_id", "text", engine = engine)

    val dl = engine.read(spark, s"$dir/doclens").get
    assert(dl.count() == dl.select("doc_id").distinct().count())
    val post = engine.read(spark, s"$dir/postings").get
    assert(post.groupBy("doc_id", "token").count()
      .filter(col("count") > 1).isEmpty, "duplicate postings after replay")

    assert(rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine)) ==
      rows(Terms.bm25TopK(all, "doc_id", "text",
        queryBatch, "query_id", "qtext", k = 5)))

    // crash-sim: meta lost/stale after an interrupted add — the next add
    // recomputes from doclens instead of stacking a delta on a lie
    val good = meta(dir)
    engine.overwrite(spark, s"$dir/meta",
      engine.read(spark, s"$dir/meta").get
        .withColumn("n_docs", lit(1L)).withColumn("total_dl", lit(1L)))
    LexIndexStore.addDocuments(spark, dir,
      docs(410).filter(col("doc_id") >= 400), "doc_id", "text",
      engine = engine)
    val healed = meta(dir)
    assert(healed.getLong(0) > good.getLong(0) &&
      healed.getLong(1) > good.getLong(1),
      s"meta not recomputed from doclens: $healed vs pre-corruption $good")
  }

  test("delete tombstones correct scores; purge is physically + meta idempotent") {
    import spark.implicits._
    val all = docs(400)
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, all, "doc_id", "text", nBuckets = 16,
      engine = engine)

    // tombstone the live top-1 of query 1 — it must vanish from results
    // and the corpus stats must shrink as if it were never indexed
    val live = rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine))
    val victim = live.find(_._1 == 1L).get._2
    LexIndexStore.deleteDocuments(spark, dir,
      Seq(victim).toDF("doc_id"), "doc_id", engine = engine)

    val expected = rows(Terms.bm25TopK(all.filter(col("doc_id") =!= victim),
      "doc_id", "text", queryBatch, "query_id", "qtext", k = 5))
    assert(rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine)) == expected)

    // capture tombstones, purge, re-search: same results off the
    // physically-rewritten tables
    val tombstones = engine.read(spark, s"$dir/deleted").get
      .localCheckpoint(true)
    LexIndexStore.purgeDeleted(spark, dir, engine = engine)
    assert(engine.read(spark, s"$dir/deleted").get.isEmpty)
    assert(engine.read(spark, s"$dir/doclens").get
      .filter(col("doc_id") === victim).isEmpty)
    assert(engine.read(spark, s"$dir/postings").get
      .filter(col("doc_id") === victim).isEmpty)
    val purgedMeta = meta(dir)
    assert(rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine)) == expected)

    // crash-sim: purge died AFTER the rewrites but BEFORE the tombstone
    // clear — restore the tombstones and re-run. A delta-subtracting meta
    // update would shrink n_docs/total_dl a second time; the recompute
    // must land on the same truth.
    engine.overwrite(spark, s"$dir/deleted", tombstones)
    LexIndexStore.purgeDeleted(spark, dir, engine = engine)
    val rerunMeta = meta(dir)
    assert(rerunMeta.getLong(0) == purgedMeta.getLong(0) &&
      rerunMeta.getLong(1) == purgedMeta.getLong(1),
      s"re-run purge skewed meta: $rerunMeta vs $purgedMeta")
    assert(rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine)) == expected)
    Dedup.releaseLocalCheckpoint(tombstones)
  }

  test("streaming growth: arrival-split ingest equals batch; replay heals") {
    val all = docs(400)
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, all.filter(col("doc_id") < 200),
      "doc_id", "text", nBuckets = 16, engine = engine)

    val srcBase = java.nio.file.Files.createTempDirectory("lexstream").toString
    val src = s"$srcBase/src"
    new java.io.File(src).mkdirs()
    def land(df: DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("lexarr").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/$name"))
    }
    // two arrivals; the second RE-SHIPS part of the first plus
    // base-corpus ids already indexed — both must be absorbed
    land(all.filter(col("doc_id") >= 200 && col("doc_id") < 300), "a1.parquet")
    val q = LexIndexStore.streamingAddDocuments(spark, src, all.schema,
      dir, s"$srcBase/ckpt", "doc_id", "text", engine = engine)
    try {
      q.processAllAvailable()
      land(all.filter(col("doc_id") >= 250 || col("doc_id") < 10), "a2.parquet")
      q.processAllAvailable()
    } finally q.stop()

    val dl = engine.read(spark, s"$dir/doclens").get
    assert(dl.count() == 400)
    assert(dl.select("doc_id").distinct().count() == 400)
    val m = meta(dir)
    assert(m.getLong(0) == 400)
    // search through the streamed-grown index equals the live scorer
    // over the full corpus — batch addDocuments parity, end to end
    assert(rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
      "query_id", "qtext", k = 5, engine = engine)) ==
      rows(Terms.bm25TopK(all, "doc_id", "text",
        queryBatch, "query_id", "qtext", k = 5)))
  }

  test("interleaved churn (add/delete/add/purge/delete/add/purge) keeps exact search parity") {
    val all = docs(500)
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, all.filter(col("doc_id") < 250),
      "doc_id", "text", nBuckets = 16, engine = engine)
    var live = all.filter(col("doc_id") < 250)
    // parity oracle after EVERY step: the on-the-fly scorer over exactly
    // the live docs — stored postings/doclens/meta/tombstones must keep
    // reproducing it through interleaved lifecycle ops, not just each op
    // tested once in isolation
    def parity(step: String): Unit =
      assert(rows(LexIndexStore.searchTopK(spark, dir, queryBatch,
        "query_id", "qtext", k = 5, engine = engine)) ==
        rows(Terms.bm25TopK(live, "doc_id", "text",
          queryBatch, "query_id", "qtext", k = 5)),
        s"churn parity broke at $step")
    parity("base")
    LexIndexStore.addDocuments(spark, dir,
      all.filter(col("doc_id") >= 250 && col("doc_id") < 350),
      "doc_id", "text", engine = engine)
    live = all.filter(col("doc_id") < 350); parity("add1")
    val del1 = col("doc_id") < 20 ||
      (col("doc_id") >= 250 && col("doc_id") < 270)
    LexIndexStore.deleteDocuments(spark, dir,
      live.filter(del1).select("doc_id"), "doc_id", engine = engine)
    live = live.filter(!del1); parity("del1")
    LexIndexStore.addDocuments(spark, dir,
      all.filter(col("doc_id") >= 350 && col("doc_id") < 420),
      "doc_id", "text", engine = engine)
    live = live.unionByName(all.filter(col("doc_id") >= 350 && col("doc_id") < 420))
    parity("add2")
    LexIndexStore.purgeDeleted(spark, dir, engine = engine); parity("purge1")
    val del2 = (col("doc_id") >= 100 && col("doc_id") < 110) ||
      (col("doc_id") >= 350 && col("doc_id") < 360)
    LexIndexStore.deleteDocuments(spark, dir,
      live.filter(del2).select("doc_id"), "doc_id", engine = engine)
    live = live.filter(!del2); parity("del2")
    LexIndexStore.addDocuments(spark, dir, all.filter(col("doc_id") >= 420),
      "doc_id", "text", engine = engine)
    live = live.unionByName(all.filter(col("doc_id") >= 420)); parity("add3")
    LexIndexStore.purgeDeleted(spark, dir, engine = engine); parity("purge2")
    // physical state is clean after the final purge: meta matches the
    // live doc count, no tombstones remain
    assert(meta(dir).getLong(0) == live.count())
    assert(engine.read(spark, s"$dir/deleted").get.isEmpty)
  }

  test("metadata must cover every id exactly once; id column name persisted in meta") {
    val corpus = docs(100)
    // a metadata frame MISSING some doc ids refuses loudly — the inner
    // denormalizing join would otherwise drop those docs from doclens
    // while their postings were still written (unscorable + permanent
    // double-count on a later re-add)
    val partial = corpus.filter(col("doc_id") < 50)
      .select(col("doc_id"), lit("s0").as("source"))
    val e1 = intercept[IllegalArgumentException] {
      LexIndexStore.build(spark, tmpIndex(), corpus, "doc_id", "text",
        nBuckets = 8, engine = engine, metadata = Some(partial))
    }
    assert(e1.getMessage.contains("does not cover"), e1.getMessage)
    // duplicated metadata ids refuse — the join would multiply rows
    val full = corpus.select(col("doc_id"), lit("s0").as("source"))
    val e2 = intercept[IllegalArgumentException] {
      LexIndexStore.build(spark, tmpIndex(), corpus, "doc_id", "text",
        nBuckets = 8, engine = engine, metadata = Some(full.union(full.limit(1))))
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    // a clean build persists the id column NAME in meta (read back by
    // searches/purges instead of positional inference) and an increment
    // naming a different id column refuses
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, corpus, "doc_id", "text", nBuckets = 8,
      engine = engine)
    assert(engine.read(spark, s"$dir/meta").get
      .select("id_col").head().getString(0) == "doc_id")
    val e3 = intercept[IllegalArgumentException] {
      LexIndexStore.addDocuments(spark, dir,
        docs(110).filter(col("doc_id") >= 100).withColumnRenamed("doc_id", "id"),
        "id", "text", engine = engine)
    }
    assert(e3.getMessage.contains("id column"), e3.getMessage)
    // a legacy index whose meta predates id_col refuses LOUDLY with a
    // rebuild instruction, not an opaque unresolved-column error
    engine.overwrite(spark, s"$dir/meta",
      engine.read(spark, s"$dir/meta").get.drop("id_col"))
    val e4 = intercept[IllegalStateException] {
      LexIndexStore.searchTopK(spark, dir, queryBatch,
        "query_id", "qtext", k = 5, engine = engine)
    }
    assert(e4.getMessage.contains("predates"), e4.getMessage)
  }

  test("interrupted add degrades, never corrupts (both reachable crash windows)") {
    val all = docs(300)
    val dir = tmpIndex()
    LexIndexStore.build(spark, dir, all.filter(col("doc_id") < 200),
      "doc_id", "text", nBuckets = 16, engine = engine)

    // crash window 2 of the appendCorpus order (sidecar + doclens
    // landed, postings lost): the replay must SKIP — no duplicate
    // postings, which would double-sum BM25 contributions forever
    val lost = all.filter(col("doc_id") >= 200 && col("doc_id") < 250)
    val lostDl = Terms.tokens(lost, "doc_id", "text")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    IdSidecar.append(dir, lostDl.select(col("doc_id")), "doc_id", engine)
    engine.append(s"$dir/doclens", lostDl)
    LexIndexStore.addDocuments(spark, dir, lost, "doc_id", "text",
      engine = engine)
    val post = engine.read(spark, s"$dir/postings").get
    assert(post.filter(col("doc_id") >= 200).isEmpty,
      "replayed batch re-appended postings for sidecar-present ids")
    assert(post.groupBy("doc_id", "token").count()
      .filter(col("count") > 1).isEmpty)

    // crash window 1 (sidecar landed alone): the replay skips too — the
    // batch is absent-and-uncounted, the CLEAN loss shape (doclens and
    // postings agree it never happened; n_docs/avgdl see nothing)
    val lost2 = all.filter(col("doc_id") >= 250 && col("doc_id") < 260)
    IdSidecar.append(dir, lost2.select(col("doc_id")), "doc_id", engine)
    LexIndexStore.addDocuments(spark, dir, lost2, "doc_id", "text",
      engine = engine)
    val dl1 = engine.read(spark, s"$dir/doclens").get
    assert(dl1.filter(col("doc_id") >= 250).isEmpty,
      "sidecar-present ids re-entered doclens")

    // a DIFFERENT batch still lands normally and meta covers everything
    // physically in doclens (the recompute contract)
    LexIndexStore.addDocuments(spark, dir,
      all.filter(col("doc_id") >= 260), "doc_id", "text", engine = engine)
    val m = meta(dir)
    val dl = engine.read(spark, s"$dir/doclens").get
    assert(m.getLong(0) == dl.count())
  }

  test("meta subtotal cache: exact through grow/compact/purge, keyed hit, garbage ignored") {
    import spark.implicits._
    // the cache path only engages above graft.lex.subCacheMinDocs stored
    // docs (small stores take the cheaper direct agg — covered by every
    // other test here); force it on for this fixture-scale corpus via a
    // CLONED session's conf — a System property would reroute every other
    // suite's refreshMeta in this JVM for the duration of the test
    val forced = spark.newSession()
    forced.conf.set("graft.lex.subCacheMinDocs", "0")
    meteSubtotalBody(forced)
  }

  private def meteSubtotalBody(forced: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    val all = docs(400)
    val dir = tmpIndex()
    def directAgg = {
      val dl = engine.read(spark, s"$dir/doclens").get
      val r = dl.agg(count(lit(1)), coalesce(sum(col("dl")), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    def metaVals = { val m = meta(dir); (m.getLong(0), m.getLong(1)) }

    LexIndexStore.build(forced, dir, all.filter(col("doc_id") < 200),
      "doc_id", "text", nBuckets = 8, engine = engine)
    assert(metaVals == directAgg, "meta != full re-aggregation after build")

    // two grows: each refresh must aggregate only files MISSING from the
    // cache. A scheme-mismatched key (file:/ vs file:///) would silently
    // re-append every live file per refresh — pinned by the no-duplicate
    // and full-coverage asserts below.
    LexIndexStore.addDocuments(forced, dir,
      all.filter(col("doc_id") >= 200 && col("doc_id") < 260),
      "doc_id", "text", engine = engine)
    LexIndexStore.addDocuments(forced, dir,
      all.filter(col("doc_id") >= 260 && col("doc_id") < 300),
      "doc_id", "text", engine = engine)
    assert(metaVals == directAgg, "meta != full re-aggregation after grows")
    val subKeys = engine.read(spark, s"$dir/doclens_sub").get
      .collect().map(_.getString(0)).toSeq
    assert(subKeys.distinct.size == subKeys.size,
      s"duplicate cache keys — basename matching broke: $subKeys")
    val liveNames = engine.read(spark, s"$dir/doclens").get.inputFiles
      .map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    assert(liveNames.subsetOf(subKeys.toSet),
      "live doclens file missing from the subtotal cache after refresh")

    // garbage cache row (crash debris / a compacted-away file): not in
    // the live set, must not leak into meta
    engine.append(s"$dir/doclens_sub",
      Seq(("deadbeef.parquet", 999L, 999999L)).toDF("file", "n_docs", "sum_dl"))
    LexIndexStore.addDocuments(forced, dir,
      all.filter(col("doc_id") >= 300 && col("doc_id") < 310),
      "doc_id", "text", engine = engine)
    assert(metaVals == directAgg, "stale cache row leaked into meta")

    // losing the whole cache is a recompute, never a wrong answer
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$dir/doclens_sub"))
    LexIndexStore.addDocuments(forced, dir,
      all.filter(col("doc_id") >= 310 && col("doc_id") < 320),
      "doc_id", "text", engine = engine)
    assert(metaVals == directAgg, "meta wrong after cache loss")

    // compact + purge rewrite the doclens filenames — refresh must key
    // off the NEW files, and the dead rows must not count
    LexIndexStore.compact(forced, dir, engine = engine)
    LexIndexStore.deleteDocuments(forced, dir,
      all.filter(col("doc_id") < 50).select("doc_id"), "doc_id", engine)
    LexIndexStore.purgeDeleted(forced, dir, engine)
    assert(metaVals == directAgg, "meta != re-aggregation after compact+purge")
    assert(metaVals._1 == 270L, s"expected 270 surviving docs, got $metaVals")
  }

  test("increment identity probe never shuffles the corpus (broadcast-semi flip)") {
    // the round-12 datadom2 finding: increment.join(corpusIds, anti)
    // can't broadcast (only an anti-join's RIGHT side broadcasts), so
    // it shuffled the whole corpus id column per ingest batch. The
    // flipped probe + final anti must plan as broadcast joins only —
    // zero hash-partition exchanges anywhere in the dedup path.
    import spark.implicits._
    val corpus = spark.range(0, 100000).select(col("id").as("doc_id"),
      concat(lit("w"), col("id")).as("text"))
    val inc = Seq((5L, "a"), (99999L, "b"), (200000L, "c"))
      .toDF("doc_id", "text")
    val fresh = inc.dropDuplicates("doc_id")
      .join(broadcast(Dedup.presentIds(corpus, inc, "doc_id")),
        Seq("doc_id"), "left_anti")
    val plan = fresh.queryExecution.executedPlan
    // increment-sized dedup aggregates may shuffle (tiny); the CORPUS
    // scan must never sit under a hash-partition exchange — it enters
    // only as the streamed side of broadcast joins
    val shuffledCorpus = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.toString.contains("Range (0, 100000") => e
    }
    assert(shuffledCorpus.isEmpty, plan.toString)
    assert(plan.toString.contains("LeftSemi, BuildRight"), plan.toString)
    assert(plan.toString.contains("LeftAnti, BuildRight"), plan.toString)
    // and the identity semantics are unchanged: only the unseen id lands
    assert(fresh.select("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(200000L))
  }
}
