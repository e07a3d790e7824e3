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
}
