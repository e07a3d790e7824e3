package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted ANN index lifecycle: save/load round-trip fidelity,
  * incremental growth parity with a frozen-model re-encode, and the
  * search-against-stored-artifact path matching the in-memory search.
  */
class AnnIndexStoreSpec extends SparkSpec {

  private def corpusOf(maxId: Long) = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .filter(col("vec_id") < maxId)
    .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))

  private def queries = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def tmpIndex(): String =
    java.nio.file.Files.createTempDirectory("annidx_spec").toString

  private def searchRows(out: org.apache.spark.sql.DataFrame) =
    out.orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq

  test("save/load round-trip: models bit-identical, search equals in-memory index") {
    val corpus = corpusOf(300)
    val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq)
    val loaded = AnnIndexStore.load(spark, dir)

    assert(loaded.ivf.centroids.map(_.toSeq).toSeq == ivf.centroids.map(_.toSeq).toSeq)
    assert(loaded.pq.codebooks.map(_.toSeq).toSeq == pq.codebooks.map(_.toSeq).toSeq)
    assert(loaded.pq.m == pq.m && loaded.pq.k == pq.k)
    // data tables: same (id → cid) and (id → codes, norm) maps
    val memAssigned = ivf.assigned.select("c_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val stAssigned = loaded.ivf.assigned.select("c_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(stAssigned == memAssigned)
    val memCodes = pq.encoded.collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    val stCodes = loaded.pq.encoded.select("c_id", "codes", "_cn").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    assert(stCodes == memCodes)

    val inMem = searchRows(Similarity.ivfPqTopKAdaptive(ivf, pq, corpus, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 20))
    val storedDf = AnnIndexStore.searchTopK(loaded, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 20)
    val stored = searchRows(storedDf)
    assert(stored == inMem, s"stored=$stored inMem=$inMem")

    // the probe set prunes the STORED scans: the cid-partitioned layout
    // turns the literal cid IN (...) into PartitionFilters at the file
    // scan — the nprobe/nlists read that makes an IVF index pay off
    val plan = storedDf.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters: [")).toSeq
    assert(pf.nonEmpty, s"no partition filters in stored-search plan:\n$plan")
    assert(pf.exists(l => l.contains("cid") && l.contains(" IN (")),
      s"cid probe set not pushed as a partition filter:\n${pf.mkString("\n")}")

    // a second save at the same path must refuse (rebuild = new path)
    intercept[IllegalArgumentException] {
      AnnIndexStore.save(spark, dir, ivf, pq)
    }
  }

  test("streaming growth: arrival-split ingest equals batch addVectors; replay heals") {
    val all = corpusOf(500)
    val base = all.filter(col("c_id") < 250)
    val ivf = Similarity.buildIvf(base, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(base, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq)

    val srcBase = java.nio.file.Files.createTempDirectory("annstream").toString
    val src = s"$srcBase/src"
    new java.io.File(src).mkdirs()
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("annarr").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$name"))
    }
    // two arrivals; the second RE-SHIPS part of the first (replay/overlap)
    // plus base-corpus ids already in the index — both must be absorbed
    land(all.filter(col("c_id") >= 250 && col("c_id") < 400), "a1.parquet")
    val q = AnnIndexStore.streamingAddVectors(spark, src,
      all.schema, dir, s"$srcBase/ckpt", "c_id", "c_vec")
    try {
      q.processAllAvailable()
      land(all.filter(col("c_id") >= 350 || col("c_id") < 10), "a2.parquet")
      q.processAllAvailable()
    } finally q.stop()

    val grown = AnnIndexStore.load(spark, dir)
    val gotAssigned = grown.ivf.assigned.select("c_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expAssigned = Similarity.assignCid(all, "c_vec", ivf.centroids)
      .select("c_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotAssigned == expAssigned) // every id exactly once, frozen-model cids
    assert(grown.pq.encoded.count() == 500)
  }

  test("compact after growth: fewer files, cid layout preserved, search identical") {
    val all = corpusOf(400)
    val base = all.filter(col("c_id") < 200)
    val ivf = Similarity.buildIvf(base, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(base, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    // retain only the current version so on-disk file counts reflect the
    // live snapshot (default retention keeps prior versions' files)
    val engine = new graft.sinks.ManifestMergeEngine(retainVersions = 1)
    AnnIndexStore.save(spark, dir, ivf, pq, engine)
    // three increments accrete files per list
    Seq((200L, 270L), (270L, 340L), (340L, 400L)).foreach { case (lo, hi) =>
      AnnIndexStore.addVectors(spark, dir,
        all.filter(col("c_id") >= lo && col("c_id") < hi), "c_id", "c_vec", engine)
    }
    val before = searchRows(AnnIndexStore.searchTopK(
      AnnIndexStore.load(spark, dir, engine), queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 20))
    def dataFiles(sub: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub/data")).map(_.getPath)
        .filter(_.endsWith(".parquet"))
    }
    val filesBefore = dataFiles("assigned").size
    AnnIndexStore.compact(spark, dir, engine)
    assert(dataFiles("assigned").size < filesBefore,
      s"compact did not reduce file count ($filesBefore)")
    // layout survived: every data file still under a cid= directory
    assert(dataFiles("assigned").forall(_.contains("cid=")))
    assert(dataFiles("encoded").forall(_.contains("cid=")))
    val after = searchRows(AnnIndexStore.searchTopK(
      AnnIndexStore.load(spark, dir, engine), queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 20))
    assert(after == before)
  }

  test("addVectors: frozen-model encode parity with full re-encode; search sees new rows") {
    val all = corpusOf(500)
    val base = all.filter(col("c_id") < 250)
    val increment = all.filter(col("c_id") >= 250)
    // models train on the BASE corpus only
    val ivf = Similarity.buildIvf(base, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(base, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq)
    AnnIndexStore.addVectors(spark, dir, increment, "c_id", "c_vec")
    val grown = AnnIndexStore.load(spark, dir)

    // parity: grown tables == full re-encode of ALL vectors with the SAME
    // frozen models (assignment and codes must not depend on arrival path)
    val expAssigned = Similarity.assignCid(all, "c_vec", ivf.centroids)
      .select("c_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotAssigned = grown.ivf.assigned.select("c_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotAssigned == expAssigned)
    assert(gotAssigned.size == 500)
    val expCodes = Similarity.pqEncode(all, "c_id", "c_vec", pq.codebooks, pq.m, pq.k)
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    val gotCodes = grown.pq.encoded.select("c_id", "codes", "_cn").collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    assert(gotCodes == expCodes)

    // search parity against an in-memory index holding the same frozen
    // models over the full corpus — and the increment's rows are reachable
    val memIvf = Similarity.IvfIndex(ivf.centroids,
      Similarity.assignCid(all, "c_vec", ivf.centroids))
    val memPq = Similarity.PqModel(pq.codebooks, pq.m, pq.k,
      Similarity.pqEncode(all, "c_id", "c_vec", pq.codebooks, pq.m, pq.k))
    val inMem = searchRows(Similarity.ivfPqTopKAdaptive(memIvf, memPq, all, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 5, rerank = 30))
    val stored = searchRows(AnnIndexStore.searchTopK(grown, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 5, rerank = 30))
    assert(stored == inMem)
    assert(stored.exists(_._2 >= 250), // at least one neighbor from the increment
      s"no increment row in top-k — planted growth not searchable: $stored")
  }

  test("filtered search: slice-only results, brute-force parity, predicate pushed under the partition pruning") {
    val corpus = corpusOf(300)
    val pred = col("c_id") < 150L
    val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq)
    val loaded = AnnIndexStore.load(spark, dir)
    val storedDf = AnnIndexStore.searchTopK(loaded, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 60,
      corpusPred = Some(pred))
    val stored = searchRows(storedDf)

    // every neighbor is inside the slice, and each query still gets k rows
    // (filter-then-rank — a post-filtered top-k would come up short)
    assert(stored.nonEmpty && stored.forall(_._2 < 150L), stored.toString)
    assert(stored.groupBy(_._1).forall(_._2.size == 3), stored.toString)

    // parity with the in-memory filtered search over the same frozen models
    val inMem = searchRows(Similarity.ivfPqTopKAdaptive(ivf, pq, corpus, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 60,
      corpusPred = Some(pred)))
    assert(stored == inMem, s"stored=$stored inMem=$inMem")

    // recall vs brute force over the FILTERED corpus (the semantics the
    // filtered search promises); rerank=60 over a 150-row slice makes the
    // shortlist near-exhaustive, so recall should be essentially exact
    val exact = searchRows(Similarity.bruteForceTopK(corpus.filter(pred), queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3))
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val hit = stored.count(r => exactSet((r._1, r._2)))
    assert(hit.toDouble / exact.size >= 0.9,
      s"filtered recall ${hit.toDouble / exact.size} < 0.9 (stored=$stored exact=$exact)")

    // the slice predicate reaches the stored parquet scans as a pushed
    // filter, composed with (not instead of) the cid partition pruning
    val plan = storedDf.queryExecution.executedPlan.toString
    val scanLines = plan.linesIterator.filter(_.contains("PushedFilters: [")).toSeq
    assert(scanLines.exists(_.contains("LessThan(c_id,150)")),
      s"slice predicate not pushed into a stored scan:\n${scanLines.mkString("\n")}")
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters: [")).toSeq
    assert(pf.exists(l => l.contains("cid") && l.contains(" IN (")),
      s"cid partition pruning lost under the slice predicate:\n${pf.mkString("\n")}")
  }

  test("metadata index: attribute predicate pushed to stored scans; mismatched increment refused") {
    import spark.implicits._
    val corpus = corpusOf(300)
    // deterministic metadata: source = src<id mod 3>
    val meta = corpus.select(col("c_id"),
      concat(lit("src"), pmod(col("c_id"), lit(3))).as("source"))
    val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq, metadata = Some(meta))
    val loaded = AnnIndexStore.load(spark, dir)
    val out = AnnIndexStore.searchTopK(loaded, queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 60,
      corpusPred = Some(col("source") === "src1"))
    val rows = searchRows(out)
    // every neighbor is in the slice (id ≡ 1 mod 3), k rows per query
    assert(rows.nonEmpty && rows.forall(_._2 % 3 == 1), rows.toString)
    assert(rows.groupBy(_._1).forall(_._2.size == 3), rows.toString)
    // the attribute predicate reaches the stored scan — no join against a
    // side table at query time
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(source,src1)"),
      s"metadata predicate not pushed:\n$plan")
    // parity vs brute force over the metadata-filtered corpus
    val exact = searchRows(Similarity.bruteForceTopK(
      corpus.join(meta.filter(col("source") === "src1").select("c_id"), "c_id"),
      queries, "c_id", "c_vec", "q_id", "q_vec", k = 3))
    val exactSet = exact.map(r => (r._1, r._2)).toSet
    val hit = rows.count(r => exactSet((r._1, r._2)))
    assert(hit.toDouble / exact.size >= 0.9,
      s"metadata-filtered recall ${hit.toDouble / exact.size} < 0.9")
    // an increment WITHOUT the metadata column must refuse loudly (a
    // null-filled source would vanish from every filtered search)
    val inc = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") >= 300 && col("vec_id") < 320)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val err = intercept[IllegalArgumentException] {
      AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec")
    }
    assert(err.getMessage.contains("metadata columns"), err.getMessage)
    // with the column supplied, growth works and the new rows are
    // reachable under the filter
    AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec",
      metadata = Some(inc.select(col("c_id"),
        concat(lit("src"), pmod(col("c_id"), lit(3))).as("source"))))
    val grown = AnnIndexStore.load(spark, dir)
    assert(grown.ivf.assigned.filter(col("source") === "src1").count() ==
      (0L until 320L).count(_ % 3 == 1))
  }

  test("interleaved churn (add/delete/add/purge/delete/add/purge) keeps exact search parity") {
    import graft.operators.Similarity.{IvfIndex, PqModel}
    val all = corpusOf(500)
    val base = all.filter(col("c_id") < 250)
    val ivf = Similarity.buildIvf(base, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(base, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq)
    var live = base
    // parity oracle: frozen-model re-encode of exactly the live rows —
    // the stored layout (appends, tombstones, partial purges, meta)
    // must reproduce it byte-for-byte after EVERY lifecycle step, not
    // just after each op tested once in isolation
    def parity(step: String): Unit = {
      val loaded = AnnIndexStore.load(spark, dir)
      val stored = AnnIndexStore.searchTopK(loaded, queries,
        "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 30)
        .collect().map(_.toString).sorted.toSeq
      val aRef = Similarity.assignCid(live.select(col("c_id"), col("c_vec")),
        "c_vec", loaded.ivf.centroids)
      val eRef = Similarity.pqEncode(live, "c_id", "c_vec",
        loaded.pq.codebooks, loaded.pq.m, loaded.pq.k)
      val ref = AnnIndexStore.PersistedAnnIndex(
        IvfIndex(loaded.ivf.centroids, aRef),
        PqModel(loaded.pq.codebooks, loaded.pq.m, loaded.pq.k, eRef),
        eRef.join(aRef.select("c_id", "cid"), "c_id"))
      val mem = AnnIndexStore.searchTopK(ref, queries,
        "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 30)
        .collect().map(_.toString).sorted.toSeq
      assert(stored == mem, s"churn parity broke at $step")
    }
    parity("base")
    // add, then delete a MIX of old and just-added ids
    AnnIndexStore.addVectors(spark, dir,
      all.filter(col("c_id") >= 250 && col("c_id") < 350), "c_id", "c_vec")
    live = all.filter(col("c_id") < 350); parity("add1")
    val del1 = col("c_id") < 20 || (col("c_id") >= 250 && col("c_id") < 270)
    AnnIndexStore.deleteVectors(spark, dir, live.filter(del1).select("c_id"), "c_id")
    live = live.filter(!del1); parity("del1")
    // add on top of LIVE tombstones, then purge under the new rows
    AnnIndexStore.addVectors(spark, dir,
      all.filter(col("c_id") >= 350 && col("c_id") < 420), "c_id", "c_vec")
    live = live.unionByName(all.filter(col("c_id") >= 350 && col("c_id") < 420))
    parity("add2")
    AnnIndexStore.purgeDeleted(spark, dir); parity("purge1")
    // delete again (rows that survived purge AND rows added after it)
    val del2 = (col("c_id") >= 100 && col("c_id") < 110) ||
      (col("c_id") >= 350 && col("c_id") < 360)
    AnnIndexStore.deleteVectors(spark, dir, live.filter(del2).select("c_id"), "c_id")
    live = live.filter(!del2); parity("del2")
    AnnIndexStore.addVectors(spark, dir,
      all.filter(col("c_id") >= 420), "c_id", "c_vec")
    live = live.unionByName(all.filter(col("c_id") >= 420)); parity("add3")
    AnnIndexStore.purgeDeleted(spark, dir); parity("purge2")
    // and the physical state is clean: no tombstones, no deleted rows
    assert(AnnIndexStore.load(spark, dir).ivf.assigned.count() == live.count())
  }

  test("metadata must cover every id exactly once, at save AND at increment") {
    val corpus = corpusOf(200)
    val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val full = corpus.select(col("c_id"), lit("s0").as("source"))
    // save: metadata missing ids refuses (the inner join would silently
    // drop those vectors from the index — never searchable again)
    val e1 = intercept[IllegalArgumentException] {
      AnnIndexStore.save(spark, tmpIndex(), ivf, pq,
        metadata = Some(full.filter(col("c_id") < 100)))
    }
    assert(e1.getMessage.contains("does not cover"), e1.getMessage)
    // save: duplicated metadata ids refuse (the join would multiply rows)
    val e2 = intercept[IllegalArgumentException] {
      AnnIndexStore.save(spark, tmpIndex(), ivf, pq,
        metadata = Some(full.union(full.limit(1))))
    }
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    // increment: same two refusals against a valid stored index
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq, metadata = Some(full))
    val inc = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") >= 200 && col("vec_id") < 220)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val incMeta = inc.select(col("c_id"), lit("s0").as("source"))
    val e3 = intercept[IllegalArgumentException] {
      AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec",
        metadata = Some(incMeta.filter(col("c_id") < 210)))
    }
    assert(e3.getMessage.contains("does not cover"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException] {
      AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec",
        metadata = Some(incMeta.union(incMeta.limit(1))))
    }
    assert(e4.getMessage.contains("duplicate"), e4.getMessage)
    // refusals left no partial increment behind: the stored index still
    // holds exactly the 200 saved rows, and a clean add then works
    assert(AnnIndexStore.load(spark, dir).ivf.assigned.count() == 200)
    AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec",
      metadata = Some(incMeta))
    assert(AnnIndexStore.load(spark, dir).ivf.assigned.count() == 220)
  }

  test("per-query matchCols: each query restricted to ITS OWN slice in one call") {
    val corpus = corpusOf(300)
    val srcOf = concat(lit("src"), pmod(col("c_id"), lit(3)))
    val meta = corpus.select(col("c_id"), srcOf.as("source"))
    val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    AnnIndexStore.save(spark, dir, ivf, pq, metadata = Some(meta))
    val loaded = AnnIndexStore.load(spark, dir)
    // queries span all three sources — the slice varies per query
    val q = corpus.filter(col("c_id") < 6)
      .select(col("c_id").as("q_id"), col("c_vec").as("q_vec"),
        concat(lit("src"), pmod(col("c_id"), lit(3))).as("source"))
    val got = searchRows(AnnIndexStore.searchTopK(loaded, q,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 60,
      matchCols = Seq("source")))
    // every neighbor shares its query's source (id mod 3), k per query
    assert(got.nonEmpty && got.forall(r => r._2 % 3 == r._1 % 3), got.toString)
    assert(got.groupBy(_._1).forall(_._2.size == 3), got.toString)
    // per-query parity vs brute force over THAT query's slice
    (0L until 6L).foreach { qid =>
      val slice = corpus.filter(pmod(col("c_id"), lit(3)) === qid % 3)
      val exact = searchRows(Similarity.bruteForceTopK(slice,
        q.filter(col("q_id") === qid).drop("source"),
        "c_id", "c_vec", "q_id", "q_vec", k = 3))
      val mine = got.filter(_._1 == qid)
      val hit = mine.count(r => exact.exists(e => e._2 == r._2))
      assert(hit >= 2, s"q$qid recall $hit/3 vs slice brute force " +
        s"(mine=$mine exact=$exact)")
    }
    // a matchCols column absent from the index fails fast
    val err = intercept[IllegalArgumentException] {
      AnnIndexStore.searchTopK(loaded,
        q.withColumnRenamed("source", "lang"),
        "c_id", "c_vec", "q_id", "q_vec", k = 3, matchCols = Seq("lang"))
    }
    assert(err.getMessage.contains("not stored in the index"), err.getMessage)
  }

  test("deleteVectors: tombstoned ids never surface; purge physically drops them") {
    import spark.implicits._
    val corpus = corpusOf(300)
    val ivf = Similarity.buildIvf(corpus, "c_id", "c_vec", k = 8, iters = 2)
    val pq = Similarity.buildPq(corpus, "c_id", "c_vec", m = 16, k = 8, iters = 2)
    val dir = tmpIndex()
    val engine = new graft.sinks.ManifestMergeEngine(retainVersions = 1)
    AnnIndexStore.save(spark, dir, ivf, pq, engine)
    def search() = searchRows(AnnIndexStore.searchTopK(
      AnnIndexStore.load(spark, dir, engine), queries,
      "c_id", "c_vec", "q_id", "q_vec", k = 3, rerank = 20))
    // victims: actual current neighbors, so the delete MUST change results
    val before = search()
    val victims = before.map(_._2).distinct.take(4)
    val vdf = victims.toDF("c_id")
    AnnIndexStore.deleteVectors(spark, dir, vdf, "c_id", engine)
    // replayed delete (same ids + one unknown id) is idempotent
    AnnIndexStore.deleteVectors(spark, dir,
      (victims :+ 999999L).toDF("c_id"), "c_id", engine)
    val tombs = engine.read(spark, s"$dir/deleted").get.collect()
    assert(tombs.length == victims.size,
      s"tombstones not replay-idempotent: ${tombs.length} rows for ${victims.size} ids")
    val loaded = AnnIndexStore.load(spark, dir, engine)
    val after = search()
    assert(after.nonEmpty)
    assert(!after.exists(r => victims.contains(r._2)),
      s"deleted id surfaced in search: $after (deleted $victims)")
    assert(loaded.ivf.assigned.filter(col("c_id").isin(victims: _*)).count() == 0)
    // purge: rows physically gone, tombstones cleared, search unchanged
    AnnIndexStore.purgeDeleted(spark, dir, engine)
    val rawAssigned = engine.read(spark, s"$dir/assigned").get
    val rawEncoded = engine.read(spark, s"$dir/encoded").get
    assert(rawAssigned.filter(col("c_id").isin(victims: _*)).count() == 0,
      "purge left tombstoned rows in assigned/")
    assert(rawEncoded.filter(col("c_id").isin(victims: _*)).count() == 0,
      "purge left tombstoned rows in encoded/")
    assert(rawAssigned.count() == 300L - victims.size)
    assert(rawEncoded.count() == 300L - victims.size)
    assert(engine.read(spark, s"$dir/deleted").forall(_.isEmpty),
      "purge did not clear the tombstone table")
    assert(search() == after,
      "post-purge search differs from tombstone-filtered search")
    // layout survived the partition replace: pruning stays intact
    def files(sub: String): Seq[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/$sub/data")).map(_.getPath)
        .filter(_.endsWith(".parquet"))
    }
    assert(files("assigned").forall(_.contains("cid=")))
    assert(files("encoded").forall(_.contains("cid=")))
  }
}
