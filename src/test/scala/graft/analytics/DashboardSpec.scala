package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Dashboard read path: single-pass all-tables stats and the reference's
  * TUI polling loop (rendered through the injectable `out` seam).
  */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  test("poll renders one panel per round; empty tables keep a zero row") {
    val laps = Seq(
      (1L, java.sql.Timestamp.valueOf("2025-05-17 14:59:00")),
      (2L, java.sql.Timestamp.valueOf("2025-05-17 13:00:00"))).toDF("id", "ts")
    val ghost = Seq.empty[(Long, java.sql.Timestamp)].toDF("id", "ts")
    val now = lit("2025-05-17 15:00:00").cast("timestamp")

    val panels = scala.collection.mutable.ArrayBuffer[String]()
    Dashboard.poll(Seq(("laps", laps, "ts"), ("ghost", ghost, "ts")),
      () => now, rounds = 2, intervalMs = 0, out = panels += _)

    assert(panels.size == 2)
    val p = panels.head
    assert(p.linesIterator.exists(l =>
      l.startsWith("laps") && l.contains("rows=2") && l.contains("last5min=1")))
    // groupBy alone would drop the empty table; the names join keeps it
    assert(p.linesIterator.exists(l =>
      l.startsWith("ghost") && l.contains("rows=0") && l.contains("latest=-")))
  }
}
