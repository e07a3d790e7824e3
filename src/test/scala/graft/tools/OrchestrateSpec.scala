package graft.tools

import java.nio.file.Files

import graft.SparkSpec
import graft.f1.Fixtures

/** End-to-end orchestrator parity (`orchestrator-simple.py:24-111`): one
  * entry point launches the monitors against a paced chunked replay,
  * polls the dashboard, drains, and returns the landed table counts —
  * previously only assembled piecewise inside F1PipelineSpec.
  */
class OrchestrateSpec extends SparkSpec {

  private def writeWire(): String = {
    val f = Files.createTempFile("graft_wire", ".txt")
    Files.write(f, Fixtures.pyLines.mkString("\n").getBytes)
    f.toString
  }

  test("orchestrate: all four monitors drain a paced replay, dashboard polls, counts match the fixture") {
    val panel = new scala.collection.mutable.ArrayBuffer[String]
    val counts = Orchestrate.run(spark, writeWire(),
      Files.createTempDirectory("graft_orch").toString,
      pollRounds = 1, paceMs = 10L, chunks = 3, out = panel.append(_))
    // the fixture's known per-topic yield (same pins as F1PipelineSpec's
    // per-topic test, race_control deduped by the watermarked A2 path)
    assert(counts == Map("weather" -> 3L, "telemetry" -> 5L,
      "car_positions" -> 5L, "race_control" -> 2L), counts.toString)
    assert(panel.exists(_.contains("dashboard poll")), panel.mkString("\n"))
    assert(panel.exists(_.contains("race_control")), panel.mkString("\n"))
  }

  test("orchestrate: more chunks than wire lines replays cleanly (small-input guard)") {
    // regression (round-12 review): c·per past end-of-list made subList
    // throw on inputs smaller than the chunk count
    val counts = Orchestrate.run(spark, writeWire(),
      Files.createTempDirectory("graft_orch_small").toString,
      topics = Seq("weather"), pollRounds = 1, paceMs = 0L,
      chunks = Fixtures.pyLines.size * 2, out = _ => ())
    assert(counts == Map("weather" -> 3L), counts.toString)
  }

  test("orchestrate: SIGTERM mid-replay leaves resumable checkpoints — relaunch drains to full totals") {
    val wire = writeWire()
    val work = Files.createTempDirectory("graft_orch_sig").toString
    val panel = new scala.collection.mutable.ArrayBuffer[String]
    // first launch: the signal lands right after chunk 0 of 3 — the
    // run's own shutdown-hook body executes (stop every query, commits
    // complete), later chunks never land. paceMs = 500 gives the 50 ms
    // triggers time to commit chunk 0 before the signal, so the
    // interruption point is deterministic.
    val partial = Orchestrate.run(spark, wire, work, pollRounds = 1,
      paceMs = 500L, chunks = 3, out = panel.append(_), stopAfterChunk = 0)
    assert(panel.exists(_.contains("INTERRUPTED")), panel.mkString("\n"))
    // load-bearing interruption: the full fixture is 15 rows across the
    // four topics — the killed run must NOT have landed them all
    assert(partial.values.sum < 15,
      s"interrupted run landed the whole file: $partial")
    // second launch over the SAME workDir: checkpoints resume, the
    // re-landed chunk_0 file is skipped by the source's seen-files log,
    // the remainder drains — full per-topic totals, nothing
    // double-counted (an append replay would overshoot and fail here)
    val counts = Orchestrate.run(spark, wire, work, pollRounds = 1,
      paceMs = 10L, chunks = 3, out = panel.append(_))
    assert(counts == Map("weather" -> 3L, "telemetry" -> 5L,
      "car_positions" -> 5L, "race_control" -> 2L), counts.toString)
  }

  test("orchestrate: a topic subset launches only those monitors; unknown topics refuse") {
    val panel = new scala.collection.mutable.ArrayBuffer[String]
    val counts = Orchestrate.run(spark, writeWire(),
      Files.createTempDirectory("graft_orch2").toString,
      topics = Seq("weather", "race_control"),
      pollRounds = 1, paceMs = 0L, chunks = 1, out = panel.append(_))
    assert(counts == Map("weather" -> 3L, "race_control" -> 2L), counts.toString)
    intercept[IllegalArgumentException](
      Orchestrate.run(spark, writeWire(),
        Files.createTempDirectory("graft_orch3").toString,
        topics = Seq("weather", "nope")))
  }
}
