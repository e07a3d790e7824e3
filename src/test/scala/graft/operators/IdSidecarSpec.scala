package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** The id-hash-bucketed stored-id sidecar that makes both stores'
  * streaming replay probe O(increment): probe ≡ the full-scan probe
  * (exactness), the stored-id read is partition-pruned to the
  * increment's ib buckets (plan guard), purged ids leave the sidecar
  * (re-arrival contract), and sidecar-less stores fall back.
  */
class IdSidecarSpec extends SparkSpec {

  private val engine = new graft.sinks.ManifestMergeEngine()

  test("sidecar probe ≡ full-scan probe; read is ib-partition-pruned") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val dir = java.nio.file.Files.createTempDirectory("sidecar").toString + "/idx"
    AnnIndexStore.save(spark, dir,
      Similarity.buildIvf(emb, "c_id", "c_vec", k = 4, iters = 1),
      Similarity.buildPq(emb, "c_id", "c_vec", m = 8, k = 8, iters = 1))
    // increment: 2 replays + 1 genuinely new id
    val inc = Seq((0L, "x"), (7L, "y"), (999999L, "z")).toDF("c_id", "pad")
    val assigned = engine.read(spark, s"$dir/assigned").get
    val viaSidecar = IdSidecar.presentIds(spark, dir, assigned, inc, "c_id",
      engine)
    val viaScan = Dedup.presentIds(assigned, inc, "c_id")
    assert(viaSidecar.collect().map(_.getLong(0)).sorted.toSeq ==
      viaScan.collect().map(_.getLong(0)).sorted.toSeq)
    assert(viaSidecar.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(0L, 7L))
    // plan guard: the sidecar scan must carry the increment's ib set as
    // a PartitionFilters literal — the read that keeps a 100 ms trigger
    // O(increment) against a billion-row store
    val plan = viaSidecar.queryExecution.executedPlan.toString
    val pf = plan.linesIterator
      .filter(_.contains("PartitionFilters: [")).toSeq
    assert(pf.nonEmpty, s"no partition filters in sidecar probe plan:\n$plan")
    assert(pf.exists(l => l.contains("ib") && l.contains(" IN (")),
      s"ib bucket set not pushed as a partition filter:\n${pf.mkString("\n")}")
    // and the small-increment literal probe reaches the parquet reader
    // as an id IN (...) — with id-sorted buckets, row-group min/max
    // stats prune INSIDE each touched bucket
    assert(plan.contains("PushedFilters: [In(c_id"),
      s"increment id set not pushed for row-group pruning:\n$plan")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("purged ids leave the sidecar; tombstoned ids stay until purge") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val dir = java.nio.file.Files.createTempDirectory("sidecar2").toString + "/idx"
    AnnIndexStore.save(spark, dir,
      Similarity.buildIvf(emb, "c_id", "c_vec", k = 4, iters = 1),
      Similarity.buildPq(emb, "c_id", "c_vec", m = 8, k = 8, iters = 1))
    val probe = Seq((3L, "p")).toDF("c_id", "pad")
    def present(): Seq[Long] = IdSidecar.presentIds(spark, dir,
      engine.read(spark, s"$dir/assigned").get, probe, "c_id", engine)
      .collect().map(_.getLong(0)).toSeq
    assert(present() == Seq(3L))
    AnnIndexStore.deleteVectors(spark, dir, Seq(3L).toDF("c_id"), "c_id")
    // tombstoned-but-stored: still filtered (the re-arrival contract)
    assert(present() == Seq(3L))
    AnnIndexStore.purgeDeleted(spark, dir)
    // physically gone: a re-arrival would re-index
    assert(present().isEmpty)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("LSM shape: grow appends land in the pending log, probe unions it, compact folds it") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val dir = java.nio.file.Files.createTempDirectory("sidecar_lsm").toString + "/idx"
    AnnIndexStore.save(spark, dir,
      Similarity.buildIvf(emb, "c_id", "c_vec", k = 4, iters = 1),
      Similarity.buildPq(emb, "c_id", "c_vec", m = 8, k = 8, iters = 1))
    // grow: the increment's ids must land in the PENDING log (one-file
    // appends — the bucketed-fanout-per-trigger design measured slower
    // than the scan it replaced), not the folded layout
    val inc = emb.filter(col("c_id") < 5)
      .select((col("c_id") + 800000L).as("c_id"), col("c_vec"))
    AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec")
    val pending = engine.read(spark, s"$dir/ids_pending").get
    assert(pending.count() == 5, "grow ids missing from the pending log")
    val probe = Seq((800001L, "p"), (1L, "q"), (999999L, "r")).toDF("c_id", "pad")
    def present(): Seq[Long] = IdSidecar.presentIds(spark, dir,
      engine.read(spark, s"$dir/assigned").get, probe, "c_id", engine)
      .collect().map(_.getLong(0)).sorted.toSeq
    // union semantics: folded (1) + pending (800001) both answer
    assert(present() == Seq(1L, 800001L))
    // compact folds pending into the bucketed layout and clears the log
    AnnIndexStore.compact(spark, dir)
    assert(engine.read(spark, s"$dir/ids_pending").forall(_.isEmpty),
      "compact left the pending log unfolded")
    assert(present() == Seq(1L, 800001L),
      "fold changed a probe verdict")
    // purge drops from the folded layout too, post-fold
    AnnIndexStore.deleteVectors(spark, dir, Seq(800001L).toDF("c_id"), "c_id")
    AnnIndexStore.purgeDeleted(spark, dir)
    assert(present() == Seq(1L))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(dir).getParentFile)
  }

  test("sidecar-less store falls back to the exact full-scan probe") {
    import spark.implicits._
    val fallback = spark.range(0, 100).select(col("id").as("doc_id"))
    val inc = Seq((5L, "a"), (200L, "b")).toDF("doc_id", "text")
    val noSuchIndex = java.nio.file.Files
      .createTempDirectory("sidecar_none").toString + "/idx"
    val got = IdSidecar.presentIds(spark, noSuchIndex, fallback, inc,
      "doc_id", engine).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(5L))
  }

  test("id column named 'ib' is refused at append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sidecar3").toString
    intercept[IllegalArgumentException](IdSidecar.append(dir,
      Seq(1L).toDF("ib"), "ib", engine))
  }

  private def dropSidecar(dir: String): Unit =
    Seq("ids", "ids_pending", "ids_meta").foreach(t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$dir/$t")))

  test("growing a pre-sidecar ANN store backfills the fold from the " +
      "complete stored-id set — later grows filter replayed ORIGINAL ids") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val nSeed = emb.count()
    val dir = java.nio.file.Files.createTempDirectory("sidecar_pre").toString + "/idx"
    AnnIndexStore.save(spark, dir,
      Similarity.buildIvf(emb, "c_id", "c_vec", k = 4, iters = 1),
      Similarity.buildPq(emb, "c_id", "c_vec", m = 8, k = 8, iters = 1))
    // simulate a store written before the sidecar existed
    dropSidecar(dir)
    // grow #1: 5 genuinely new ids — the round-14 bug seeded the fold
    // from THESE alone, so every later grow re-admitted original ids
    val g1 = emb.filter(col("c_id") < 5)
      .select((col("c_id") + 800000L).as("c_id"), col("c_vec"))
    AnnIndexStore.addVectors(spark, dir, g1, "c_id", "c_vec")
    // the rebuilt sidecar must answer for the ORIGINAL corpus, not just
    // the increment
    val probe = emb.filter(col("c_id") < 3).select(col("c_id"))
      .unionByName(g1.select(col("c_id")).limit(1))
    val present = IdSidecar.presentIds(spark, dir,
      engine.read(spark, s"$dir/assigned").get, probe, "c_id", engine)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(present == Seq(0L, 1L, 2L, 800000L),
      s"backfilled sidecar missing original/new ids: $present")
    // grow #2 re-ships originals + grow-1 rows + 3 new: the streaming
    // ingest's presentIds filter must pass ONLY the new rows (admitting
    // a replayed original here was the round-14 ADVICE bug — the fold
    // had been seeded from grow #1's increment alone)
    val g2 = emb.limit(10).unionByName(g1).unionByName(
      emb.filter(col("c_id") < 3)
        .select((col("c_id") + 900000L).as("c_id"), col("c_vec")))
    val fresh = g2.dropDuplicates("c_id")
      .join(broadcast(IdSidecar.presentIds(spark, dir,
        engine.read(spark, s"$dir/assigned").get, g2, "c_id", engine)),
        Seq("c_id"), "left_anti")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(fresh == Seq(900000L, 900001L, 900002L),
      s"pre-sidecar grow would re-admit replayed ids: $fresh " +
        s"(store holds ${nSeed + 5} rows)")
  }

  test("growing a pre-sidecar LEX store backfills from stored doclens") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"alpha bravo w$i common"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("sidecar_prelex")
      .toString + "/idx"
    LexIndexStore.build(spark, dir, docs, "doc_id", "text", nBuckets = 8)
    dropSidecar(dir)
    val g1 = Seq((100L, "alpha new one")).toDF("doc_id", "text")
    LexIndexStore.addDocuments(spark, dir, g1, "doc_id", "text")
    // replay of originals + g1 + one new doc: exactly one new doclens row
    val g2 = docs.limit(7).unionByName(g1)
      .unionByName(Seq((101L, "bravo new two")).toDF("doc_id", "text"))
    LexIndexStore.addDocuments(spark, dir, g2, "doc_id", "text")
    val n = engine.read(spark, s"$dir/doclens").get.count()
    assert(n == 42, s"pre-sidecar lex grow duplicated doclens: $n vs 42")
  }

  test("a fold replay (crash between fold-append and log clear) changes no verdict") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val dir = java.nio.file.Files.createTempDirectory("sidecar_crash")
      .toString + "/idx"
    AnnIndexStore.save(spark, dir,
      Similarity.buildIvf(emb, "c_id", "c_vec", k = 4, iters = 1),
      Similarity.buildPq(emb, "c_id", "c_vec", m = 8, k = 8, iters = 1))
    val inc = emb.filter(col("c_id") < 4)
      .select((col("c_id") + 800000L).as("c_id"), col("c_vec"))
    AnnIndexStore.addVectors(spark, dir, inc, "c_id", "c_vec")
    val pendingRows = engine.read(spark, s"$dir/ids_pending").get
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(pendingRows.nonEmpty)
    IdSidecar.fold(spark, dir, engine)
    // simulate the crash window: the fold-append landed but the clear
    // was lost — re-append the already-folded ids to the pending log
    engine.append(s"$dir/ids_pending",
      pendingRows.toDF("c_id").coalesce(1))
    val probe = Seq((800001L, "p"), (2L, "q"), (999999L, "r"))
      .toDF("c_id", "pad")
    def present(): Seq[Long] = IdSidecar.presentIds(spark, dir,
      engine.read(spark, s"$dir/assigned").get, probe, "c_id", engine)
      .collect().map(_.getLong(0)).sorted.toSeq
    // duplicated ids (folded layout + replayed pending) are harmless for
    // presence — and a streaming re-delivery must still filter them all
    assert(present() == Seq(2L, 800001L))
    val fresh = inc.join(broadcast(IdSidecar.presentIds(spark, dir,
      engine.read(spark, s"$dir/assigned").get, inc, "c_id", engine)),
      Seq("c_id"), "left_anti").count()
    assert(fresh == 0L,
      s"fold replay let $fresh re-delivered ids through the probe")
    // the re-fold coalesces: pending clears, verdicts hold
    IdSidecar.fold(spark, dir, engine)
    assert(engine.read(spark, s"$dir/ids_pending").forall(_.isEmpty))
    assert(present() == Seq(2L, 800001L))
  }

  test("streaming growth folds the pending log on the foldEvery cadence") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("c_id"), col("embedding").as("c_vec"))
    val dir = java.nio.file.Files.createTempDirectory("sidecar_cad")
      .toString + "/idx"
    AnnIndexStore.save(spark, dir,
      Similarity.buildIvf(emb, "c_id", "c_vec", k = 4, iters = 1),
      Similarity.buildPq(emb, "c_id", "c_vec", m = 8, k = 8, iters = 1))
    val srcBase = java.nio.file.Files.createTempDirectory("sidecar_cads").toString
    val src = s"$srcBase/src"
    new java.io.File(src).mkdirs()
    def land(lo: Long, hi: Long, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("cadarr").toString
      emb.filter(col("c_id") >= lo && col("c_id") < hi)
        .select((col("c_id") + 800000L).as("c_id"), col("c_vec"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$src/$name"))
    }
    val q = AnnIndexStore.streamingAddVectors(spark, src,
      emb.select((col("c_id") + 800000L).as("c_id"), col("c_vec")).schema,
      dir, s"$srcBase/ckpt", "c_id", "c_vec", foldEvery = 2)
    try {
      land(0L, 3L, "a1.parquet")
      q.processAllAvailable()
      // batch 1: pending holds the increment (no fold yet)
      assert(engine.read(spark, s"$dir/ids_pending").exists(!_.isEmpty),
        "first trigger should append to the pending log, not fold")
      land(3L, 6L, "a2.parquet")
      q.processAllAvailable()
      // batch 2 trips the cadence: the log folds and clears IN-STREAM
      assert(engine.read(spark, s"$dir/ids_pending").forall(_.isEmpty),
        "foldEvery=2 cadence did not fold the pending log in-stream")
    } finally q.stop()
    // folded ids still answer the probe (replay keeps healing)
    val probe = emb.filter(col("c_id") < 6)
      .select((col("c_id") + 800000L).as("c_id"))
    val present = IdSidecar.presentIds(spark, dir,
      engine.read(spark, s"$dir/assigned").get, probe, "c_id", engine)
      .count()
    assert(present == 6L, s"folded ids lost from the probe: $present/6")
  }
}
