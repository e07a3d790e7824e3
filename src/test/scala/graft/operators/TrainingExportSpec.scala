package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.ExtensionQueries
import graft.tables.Tables

/** Streaming training-export parity: the composed streaming release path
  * (dedup state → gates → split → per-split incremental pack) over ≥ 3
  * id-ordered arrival batches must converge to the one-shot x43 export —
  * same per-split span/sequence/token counts.
  */
class TrainingExportSpec extends SparkSpec {

  test("3-batch streaming export equals the one-shot x43 per-split counts") {
    val dir = "/root/testdata/sf0.001"
    // the exact x43 corpus: planted near-dups + PII + boilerplate
    val corpus = ExtensionQueries.plantBoilerplate(
      ExtensionQueries.plantPii(
        ExtensionQueries.plantTextDups(Tables.documents(spark, dir))))
      .localCheckpoint(true)
    try {
      val base = java.nio.file.Files.createTempDirectory("texport").toString
      val src = s"$base/src"
      new java.io.File(src).mkdirs()
      def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("texparr").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$src/$name"))
      }
      // id-ordered arrivals (the packIncremental contract): two original
      // ranges, then the planted copies (ids ≥ 1,000,000)
      land(corpus.filter(col("doc_id") < 250), "b1.parquet")
      val q = TrainingExport.start(spark, src, corpus.schema,
        "doc_id", "text", budget = 256,
        s"$base/state", s"$base/out", s"$base/ckpt")
      try {
        q.processAllAvailable()
        land(corpus.filter(col("doc_id") >= 250 && col("doc_id") < 1000000L),
          "b2.parquet")
        q.processAllAvailable()
        land(corpus.filter(col("doc_id") >= 1000000L), "b3.parquet")
        q.processAllAvailable()
      } finally q.stop()
      def streamed(sp: String): (Long, Long, Long) = {
        val d = new java.io.File(s"$base/out/split=$sp")
        if (!d.isDirectory) (0L, 0L, 0L)
        else {
          val r = spark.read.parquet(d.toString)
            .agg(count(lit(1)), countDistinct(col("seq_id")),
              coalesce(sum(col("tok_end") - col("tok_start")), lit(0L)))
            .head()
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
      }
      val want = graft.SparkEntry.queries("x43_training_export")(spark, dir)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      Seq("train", "val", "test").foreach { sp =>
        assert(streamed(sp) == want(sp),
          s"split $sp: streaming ${streamed(sp)} != one-shot ${want(sp)}")
      }
      // the counts are load-bearing: something actually packed
      assert(want.values.map(_._3).sum > 0)
    } finally Dedup.releaseLocalCheckpoint(corpus)
  }
}
