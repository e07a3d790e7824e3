package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold/warm attribution bench (dev-loop tooling, BASELINE.md §cold/warm):
  * runs EVERY registry query twice in one session — run 1 is the cold
  * number a driver-style serial bench sees (whole-stage-codegen compile +
  * codec JIT + first-touch classloading for that query's operators), run 2
  * is the immediately-following steady state. The gap is the compile tax
  * that amortizes to zero on a real 100 TB corpus; the warm column is what
  * extrapolates, and `scripts/check_bench_regression.py` reads it to
  * classify a flagged per-query regression as ambient compile/JIT variance
  * vs a real slowdown.
  *
  * Output: `BENCH_COLDWARM.json`
  * (`{"sf":…,"queries":{name:{"cold":s,"warm":s}}}`) plus the BASELINE.md
  * markdown table on stdout between COLDWARM_TABLE_BEGIN/END markers.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain
  * graft.tools.ColdWarmBench"`.
  */
object ColdWarmBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.buildSession()

    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      Harness.timeNoop(spark, sfDir, name, fn)

    // No pre-warmup here, on purpose: the whole point is measuring what a
    // cold serial run (the driver's protocol) pays per query. Session init
    // lands on the first query; its row calls that out in the table.
    val results = graft.SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val cold = once(name, fn)
        val warm = once(name, fn)
        (name, cold, warm)
    }

    val qs = results.map { case (n, c, w) =>
      "\"" + n + "\":{\"cold\":" + c + ",\"warm\":" + w + "}"
    }.mkString("{", ",", "}")
    // stamp the commit: check_bench_regression.py only honors the
    // cold-band (AMBIENT) exemption when this table was measured on the
    // code being benched — a stale table could mask real warm-path
    // regressions up to the old cold ceiling
    val commit = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString.trim
      if (p.waitFor() == 0 && out.matches("[0-9a-f]{40}")) out else "unknown"
    } catch { case _: Exception => "unknown" }
    val line = s"""{"sf":"$sfDir","commit":"$commit","queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_COLDWARM.json"),
      (line + "\n").getBytes("UTF-8"))

    println("COLDWARM_TABLE_BEGIN")
    println("| Query | Cold | Warm | Compile/JIT share |")
    println("|---|---|---|---|")
    results.foreach { case (n, c, w) =>
      val share =
        if (c <= 0 || w <= 0) "—"
        else f"${math.max(0.0, (c - w) / c * 100)}%.0f%%"
      println(f"| $n | $c%.2f s | $w%.2f s | $share |")
    }
    println("COLDWARM_TABLE_END")
    val totC = results.map(_._2).filter(_ >= 0).sum
    val totW = results.map(_._3).filter(_ >= 0).sum
    println(f"totals: cold $totC%.1f s, warm $totW%.1f s")
    spark.stop()
  }
}
