package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd+ args: query names to dump (dev loop for one new
    // entry — the driver always runs the full two-arg form)
    val Array(sfDir, outDir) = args.take(2)
    val only = args.drop(2).toSet
    // shared builder: correctness must run under the SAME session config
    // the bench runners use (it had drifted to AQE-off before extraction)
    val spark = graft.tools.Harness.buildSession()
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // oracle_sql.json FIRST: a crash in any single query must cost that
    // query, never the whole artifact (round 8 lost all 94 results to an
    // exception thrown after the dumps but before this write)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // queries may persist intermediates (e.g. LSH signature frames) or
      // leak localCheckpoint blocks clearCache can't see; release both so
      // a 90+-query run stays bounded (graft.tools.Harness scaladoc)
      graft.tools.Harness.releaseAllPinned(spark)
    }
    spark.stop()
  }
}
