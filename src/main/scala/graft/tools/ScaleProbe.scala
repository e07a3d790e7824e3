package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.f1.Fixtures
import graft.streaming.{F1Pipeline, Metrics}

/** Streaming-path scale probe (BASELINE.md evidence, not a driver gate):
  * generates an n-line synthetic capture, drains it through the unified
  * multi-table ETL and/or the per-topic monitor topology, and prints one
  * JSON line with rows/s and per-batch latency percentiles.
  *
  *   sbt "runMain graft.tools.ScaleProbe 240000 unified"
  *   sbt "runMain graft.tools.ScaleProbe 240000 pertopic"
  *
  * The capture is split into 16 files paced 2-per-trigger so the run
  * exercises real micro-batch boundaries (merge sinks see cross-batch
  * keys), not one giant batch.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(240000)
    val mode = args.lift(1).getOrElse("unified")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Files.createTempDirectory("scaleprobe").toString
    val src = s"$base/src"; Files.createDirectories(Paths.get(src))
    val lines = Fixtures.syntheticCapture(n)
    val files = 16
    lines.grouped((lines.length + files - 1) / files).zipWithIndex.foreach {
      case (chunk, i) =>
        Files.write(Paths.get(f"$src/c$i%02d.txt"), chunk.mkString("\n").getBytes)
    }

    val metrics = new Metrics(batchIntervalMs = 100)
    spark.streams.addListener(metrics)
    val t0 = System.nanoTime()
    mode match {
      case "unified" =>
        val q = F1Pipeline.startUnified(spark, src, s"$base/tables", s"$base/ckpt",
          trigger = Trigger.ProcessingTime("100 milliseconds"),
          maxFilesPerTrigger = Some(2))
        try q.processAllAvailable() finally q.stop()
      case "pertopic" =>
        val qs = F1Pipeline.startPerTopic(spark, src, s"$base/tables", s"$base/ckpt",
          trigger = Trigger.ProcessingTime("100 milliseconds"),
          maxFilesPerTrigger = Some(2))
        try qs.foreach(_.processAllAvailable()) finally qs.foreach(_.stop())
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    spark.streams.removeListener(metrics)

    val batches = metrics.batchReports.filter(_.numInputRows > 0)
    val times = batches.map(_.processMs).sorted
    def pct(p: Double): Long =
      if (times.isEmpty) 0L else times(math.min(times.size - 1, (p * times.size).toInt))
    val derived = Seq("lap_data", "weather", "telemetry", "positions",
      "car_positions", "race_control").map { t =>
      val p = s"$base/tables/$t"
      t -> (if (Files.exists(Paths.get(p))) spark.read.parquet(p).count() else 0L)
    }
    println(s"""{"probe":"$mode","lines":${lines.length},"wall_sec":$wallSec,""" +
      s""""lines_per_sec":${(lines.length / wallSec).toInt},""" +
      s""""batches":${batches.size},"batch_ms_p50":${pct(0.5)},"batch_ms_p95":${pct(0.95)},""" +
      s""""batch_ms_max":${times.lastOption.getOrElse(0L)},""" +
      derived.map { case (t, c) => s""""rows_$t":$c""" }.mkString(",") + "}")
    spark.stop()
  }
}
