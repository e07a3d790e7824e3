package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** As-of join semantics: inclusive most-recent match per key, tie-break
  * determinism, tolerance nulling, left rows with no match — and the plan
  * property that makes it scale (one Window, no join node).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq(
    // (id, key, ts)
    (1L, "a", 100L), (2L, "a", 205L), (3L, "a", 50L),
    (4L, "b", 100L), (5L, "c", 100L))
    .toDF("id", "key", "ts")
  private val right = Seq(
    // (rid, key, ts, v)
    (10L, "a", 100L, 1.0), (11L, "a", 200L, 2.0), (12L, "a", 210L, 3.0),
    (13L, "b", 90L, 4.0))
    .toDF("rid", "key", "ts", "v")

  private def run(tolerance: Option[Long] = None) =
    AsofJoin.asofJoin(left, right, Seq("key"), "ts", "ts",
      Map("v" -> "v", "rid" -> "rid"), rightTieBreak = "rid", tolerance)
      .orderBy("id").collect()

  test("most-recent-at-or-before per key; no-match rows null; ties inclusive") {
    val rows = run()
    assert(rows.length == 5)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // id 1 at ts=100: right (a,100) matches INCLUSIVELY
    assert(byId(1L).getAs[Double]("v") == 1.0)
    assert(byId(1L).getAs[Long]("asof_ts") == 100L)
    // id 2 at ts=205: latest at-or-before is (a,200); (a,210) is future
    assert(byId(2L).getAs[Double]("v") == 2.0)
    // id 3 at ts=50: nothing before → nulls
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("v")))
    assert(byId(3L).isNullAt(byId(3L).fieldIndex("asof_ts")))
    // id 4 key=b: (b,90)
    assert(byId(4L).getAs[Double]("v") == 4.0)
    // id 5 key=c: right has no c rows at all → nulls
    assert(byId(5L).isNullAt(byId(5L).fieldIndex("v")))
  }

  test("tolerance nulls stale matches only") {
    val rows = run(tolerance = Some(4L)).map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Double]("v") == 1.0) // age 0 ≤ 4 → kept
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("v"))) // age 205-200=5 > 4 → stale
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("asof_ts")))
    assert(rows(4L).isNullAt(rows(4L).fieldIndex("v"))) // age 100-90=10 > 4 → stale
    // exact-age boundary is inclusive: age == tolerance survives
    val kept = run(tolerance = Some(5L)).map(r => r.getLong(0) -> r).toMap
    assert(kept(2L).getAs[Double]("v") == 2.0) // age 5 ≤ 5 → kept
  }

  test("duplicate right (key, ts): tie-break column decides deterministically") {
    val dupRight = right.unionByName(
      Seq((14L, "a", 200L, 9.9)).toDF("rid", "key", "ts", "v"))
    val rows = AsofJoin.asofJoin(left, dupRight, Seq("key"), "ts", "ts",
      Map("v" -> "v"), rightTieBreak = "rid")
      .orderBy("id").collect().map(r => r.getLong(0) -> r).toMap
    // two right rows at (a,200): rid 14 > rid 11 → last in tie order wins
    assert(rows(2L).getAs[Double]("v") == 9.9)
  }

  test("matched right row carries atomically: a null value is NOT backfilled from older rows") {
    // the chimera hazard: per-column last(ignoreNulls) would skip the
    // matched row's null v and surface ts=0's value with a fresh asof_ts
    val l = Seq((1L, "a", 101L)).toDF("id", "key", "ts")
    val r = Seq((10L, "a", 0L, Some(5.0)), (11L, "a", 100L, None))
      .toDF("rid", "key", "ts", "v")
    val row = AsofJoin.asofJoin(l, r, Seq("key"), "ts", "ts",
      Map("v" -> "v", "rid" -> "rid"), rightTieBreak = "rid").head()
    assert(row.getAs[Long]("asof_ts") == 100L)
    assert(row.getAs[Long]("rid") == 11L)
    assert(row.isNullAt(row.fieldIndex("v")), "null v of the matched row must survive")
  }

  test("output-name collision with a left column is rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(left, right, Seq("key"), "ts", "ts",
        Map("v" -> "id"), rightTieBreak = "rid") // "id" already on the left
    }
  }

  test("plan: single Window over one shuffle, no join node") {
    val plan = AsofJoin.asofJoin(left, right, Seq("key"), "ts", "ts",
      Map("v" -> "v"), rightTieBreak = "rid")
      .queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("Join"), s)
    // count printed Window nodes (collect can't see through the
    // un-finalized AdaptiveSparkPlan wrapper)
    val windows = s.linesIterator.count(_.trim.stripPrefix("+- ").startsWith("Window "))
    assert(windows == 1,
      s"all carried columns must share ONE Window operator:\n$s")
  }
}
