package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.analytics.Dashboard
import graft.streaming.F1Pipeline

/** The `orchestrator-simple.py` analogue end to end (reference
  * `/root/reference/orchestrator-simple.py:24-111`): ONE entry point that
  * launches the per-topic monitors against a paced replay of a wire file,
  * polls the dashboard panel on an interval while they drain, and exits
  * clean on SIGTERM/SIGINT. The reference forks four Python processes
  * tailing one file and re-parsing every topic in each; here the monitors
  * are four independent Structured Streaming queries (own checkpoints,
  * own sinks — the ST2 shape) sharing one Spark session, and pacing is a
  * feeder that lands the wire file in timed chunks on the stream's source
  * dir — the same replay-at-pace posture `extractor.py` produces live.
  *
  * Usage:
  * {{{
  *   runMain graft.tools.Orchestrate <inputFile> [workDir] [topics] [pollRounds] [paceMs]
  *     inputFile  wire-format lines (py-list format, one message per line)
  *     workDir    scratch root for src/tables/ckpt   (default: a temp dir)
  *     topics     comma list of weather,telemetry,car_positions,race_control
  *                (default: all four — the reference's default monitor set)
  *     pollRounds dashboard polls while draining     (default 3)
  *     paceMs     delay between replay chunks        (default 200)
  * }}}
  *
  * Exit discipline: a JVM shutdown hook stops every live query before the
  * session closes, so SIGTERM mid-replay leaves committed parquet +
  * checkpoints from which a restart RESUMES (the reference's Ctrl-C
  * handler just terminates the children; replayed state is lost).
  */
object Orchestrate {

  /** Testable core: returns the final per-table dashboard row count map.
    * `out` receives the human panel (println in main, captured in spec).
    *
    * `stopAfterChunk` (test seam, default off): when ≥ 0, the run is
    * INTERRUPTED right after landing that chunk index — the registered
    * shutdown hook's own body runs (the exact code a real SIGTERM/SIGINT
    * executes), no further chunks land, no drain, no dashboard — and the
    * partial counts return. OrchestrateSpec uses it to prove the
    * crash-resilience claim the scaladoc makes: a second launch over the
    * SAME workDir resumes from the committed checkpoints, skips the
    * already-processed chunk files, drains the remainder, and lands the
    * full-file per-topic totals with nothing double-counted.
    */
  def run(spark: SparkSession, inputFile: String, workDir: String,
      topics: Seq[String] = F1Pipeline.MonitorTopics,
      pollRounds: Int = 3, paceMs: Long = 200L, chunks: Int = 4,
      out: String => Unit = println(_),
      stopAfterChunk: Int = -1): Map[String, Long] = {
    require(Files.exists(Paths.get(inputFile)), s"no input file $inputFile")
    val src = s"$workDir/src"
    val tables = s"$workDir/tables"
    val ckpt = s"$workDir/ckpt"
    new java.io.File(src).mkdirs()
    val lines = Files.readAllLines(Paths.get(inputFile))
    out(s"orchestrate: ${lines.size()} wire lines, topics=${topics.mkString(",")}")

    val queries = F1Pipeline.startPerTopic(spark, src, tables, ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"),
      topics = topics)
    // clean exit on SIGTERM/SIGINT: stop queries BEFORE the JVM tears the
    // session down, so every sink commit is complete and restartable
    val hook = new Thread(() => queries.foreach { q =>
      try if (q.isActive) q.stop() catch { case _: Throwable => }
    })
    Runtime.getRuntime.addShutdownHook(hook)
    try {
      // paced replay: land the file in timed chunks (the live-feed pace,
      // minus the socket — EventSource's file stream picks each up on
      // its next trigger)
      val per = math.max(1, math.ceil(lines.size().toDouble / chunks).toInt)
      // c*per can pass end-of-list when lines < chunks·per (small
      // inputs) — stop instead of letting subList throw. `exists`
      // short-circuits at the interruption seam: a SIGTERM'd process
      // lands nothing after the signal.
      val interrupted = (0 until chunks)
        .takeWhile(c => c * per < lines.size()).exists { c =>
          val slice = new java.util.ArrayList[String](
            lines.subList(c * per, math.min(lines.size(), (c + 1) * per)))
          if (!slice.isEmpty) {
            // land atomically: a micro-batch listing the source dir
            // between create and flush would read (and mark processed) a
            // truncated file — write outside the watched dir, then move in
            val tmp = Files.createTempFile(Paths.get(src).getParent,
              s"chunk_$c", ".tmp")
            Files.write(tmp, slice)
            Files.move(tmp, Paths.get(s"$src/chunk_$c.txt"),
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            if (paceMs > 0) Thread.sleep(paceMs)
          }
          c == stopAfterChunk
        }
      if (interrupted) {
        // signal arrival mid-replay: run the hook's OWN body (stop every
        // live query, commits complete), skip drain/dashboard — exactly
        // what the process does under a real SIGTERM — and report
        // whatever had committed when the signal landed
        hook.run()
        // a sink dir can exist with ZERO committed files when the signal
        // lands between table-dir creation and the first parquet commit —
        // that's an honest count of 0, not a crash
        val partial = topics
          .filter(t => Files.exists(Paths.get(s"$tables/$t")))
          .map(t => t -> (
            try spark.read.parquet(s"$tables/$t").count()
            catch { case _: org.apache.spark.sql.AnalysisException => 0L }))
          .toMap
        out(s"orchestrate: INTERRUPTED after chunk $stopAfterChunk " +
          partial.map { case (k, v) => s"$k=$v" }.mkString(" "))
        return partial
      }
      queries.foreach(_.processAllAvailable())
      // dashboard poll loop over the landed tables (dashboard.py:59-108:
      // counts + 5-min window + MAX(ts) per table)
      val landed = topics.filter(t => Files.exists(Paths.get(s"$tables/$t")))
        .map(t => (t, spark.read.parquet(s"$tables/$t"), "timestamp"))
      if (landed.nonEmpty)
        Dashboard.poll(landed,
          () => org.apache.spark.sql.functions.current_timestamp(),
          rounds = math.max(1, pollRounds), intervalMs = paceMs, out = out)
      val counts = landed.map { case (t, df, _) => t -> df.count() }.toMap
      out(s"orchestrate: done ${counts.map { case (k, v) => s"$k=$v" }.mkString(" ")}")
      counts
    } finally {
      queries.foreach { q => try if (q.isActive) q.stop() catch { case _: Throwable => } }
      try Runtime.getRuntime.removeShutdownHook(hook)
      catch { case _: IllegalStateException => } // already shutting down
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Orchestrate <inputFile> [workDir] [topics] [pollRounds] [paceMs]")
    val inputFile = args(0)
    val workDir =
      if (args.length > 1) args(1)
      else Files.createTempDirectory("graft_orchestrate").toString
    val topics =
      if (args.length > 2) args(2).split(",").toSeq
      else F1Pipeline.MonitorTopics
    val pollRounds = if (args.length > 3) args(3).toInt else 3
    val paceMs = if (args.length > 4) args(4).toLong else 200L
    val spark = Harness.buildSession()
    try run(spark, inputFile, workDir, topics, pollRounds, paceMs)
    finally spark.stop()
  }
}
