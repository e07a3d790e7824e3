package graft.tools

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Micro-benchmark for manifest-engine commit costs (round-16 dev
  * tooling): times the building blocks a store trigger is made of —
  * local-frame overwrite (meta), small distributed append (pending log),
  * partitioned append, snapshot-token lookup — so per-commit overhead is
  * measured, not inferred.
  */
object EngineMicroBench {
  def main(args: Array[String]): Unit = {
    val spark = Harness.buildSession()
    val engine = new graft.sinks.ManifestMergeEngine(gcEvery = 16)
    val base = java.nio.file.Files.createTempDirectory("embench").toString

    def time(name: String, n: Int)(f: Int => Unit): Unit = {
      val t0 = System.nanoTime()
      (1 to n).foreach(f)
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/op (n=$n)")
    }

    val metaSchema = StructType(Seq(
      StructField("n_docs", LongType, nullable = false),
      StructField("total_dl", LongType, nullable = false)))
    def metaDf(i: Int) = spark.createDataFrame(
      java.util.Collections.singletonList(Row(i.toLong, i.toLong * 10)),
      metaSchema).coalesce(1)

    // warm-up
    engine.overwrite(spark, s"$base/warm", metaDf(0))

    time("local overwrite (meta)", 20)(i =>
      engine.overwrite(spark, s"$base/meta", metaDf(i)))

    val dist = spark.range(5000).select(col("id"), (col("id") % 97).as("v"))
    dist.write.parquet(s"$base/src")
    val src = spark.read.parquet(s"$base/src")
    time("small distributed append", 20)(i =>
      engine.append(s"$base/dist", src.filter(col("id") % 20 === i % 20)
        .coalesce(1)))

    time("partitioned append (16)", 10)(i =>
      engine.appendPartitioned(s"$base/part",
        src.filter(col("id") % 10 === i % 10)
          .withColumn("tb", pmod(col("id"), lit(16)).cast("int"))
          .repartition(col("tb")), "tb"))

    time("snapshotToken", 200)(_ =>
      engine.snapshotToken(spark, s"$base/meta"))

    time("engine.read meta + head", 20)(_ =>
      engine.read(spark, s"$base/meta").get.head())

    time("noop job (range 1)", 20)(_ =>
      spark.range(1).write.format("noop").mode("overwrite").save())

    time("bare write flat 250", 20)(i =>
      src.filter(col("id") % 20 === i % 20).coalesce(1)
        .write.mode("overwrite").parquet(s"$base/bare$i"))

    time("bare write part (16)", 10)(i =>
      src.filter(col("id") % 10 === i % 10)
        .withColumn("tb", pmod(col("id"), lit(16)).cast("int"))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$base/barep$i"))

    time("bare write part noAQE", 10) { i =>
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try src.filter(col("id") % 10 === i % 10)
        .withColumn("tb", pmod(col("id"), lit(16)).cast("int"))
        .repartition(col("tb"))
        .write.mode("overwrite").partitionBy("tb").parquet(s"$base/barenp$i")
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    time("bare write flat v2commit", 20) { i =>
      spark.sparkContext.hadoopConfiguration
        .setInt("mapreduce.fileoutputcommitter.algorithm.version", 2)
      src.filter(col("id") % 20 === i % 20).coalesce(1)
        .write.mode("overwrite").parquet(s"$base/barev2_$i")
    }

    time("localCheckpoint 5k", 10)(_ =>
      graft.operators.Dedup.releaseLocalCheckpoint(
        src.limit(4000).localCheckpoint(true)))

    spark.stop()
  }
}
