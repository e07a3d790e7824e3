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

  test("streaming as-of: 3 arrival batches with late right rows converge to the batch join") {
    // one interleaved event stream (the x29 shape): purchases = left,
    // clicks = right
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("typ",
        org.apache.spark.sql.types.StringType)))
    // batch 1: u1 click@10, u1 purchase@20 (matches c1), u2 purchase@40 (no match)
    val b1 = Seq((101L, 1L, 10L, "click"), (201L, 1L, 20L, "purchase"),
      (202L, 2L, 40L, "purchase"))
    // batch 2: u1 purchase@30 (matches c1 for now), u2 click@35 → revises
    // NOTHING for u2's purchase@40? it precedes it → matches
    val b2 = Seq((203L, 1L, 30L, "purchase"), (102L, 2L, 35L, "click"))
    // batch 3: LATE right rows — u1 click@15 must REVISE purchase@20
    // (10 → 15) but not purchase@30's... click@25 revises purchase@30;
    // and a tie pair: two clicks at u2 ts=35 — max event_id wins
    val b3 = Seq((103L, 1L, 15L, "click"), (104L, 1L, 25L, "click"),
      (105L, 2L, 35L, "click"))
    val all = (b1 ++ b2 ++ b3).toDF("event_id", "user_id", "ts", "typ")

    val base = java.nio.file.Files.createTempDirectory("asofstream").toString
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    def land(rows: Seq[(Long, Long, Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("asofarr").toString
      rows.toDF("event_id", "user_id", "ts", "typ").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$name"))
    }
    land(b1, "b1.parquet")
    val q = AsofJoin.streamingAsofJoin(spark, src, schema,
      s"$base/state", s"$base/out", s"$base/ckpt", Seq("user_id"),
      leftFilter = "typ = 'purchase'", rightFilter = "typ = 'click'",
      leftId = "event_id", leftTs = "ts", rightTs = "ts",
      rightCols = Map("event_id" -> "click_id"), rightTieBreak = "event_id",
      watermark = 1000L)
    try {
      q.processAllAvailable()
      // after batch 1: purchase@20 matched click@10
      val mid = spark.read.parquet(s"$base/out")
        .filter(col("event_id") === 201L).head()
      assert(mid.getAs[Long]("click_id") == 101L)
      land(b2, "b2.parquet"); q.processAllAvailable()
      land(b3, "b3.parquet"); q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(s"$base/out")
      .select("event_id", "user_id", "ts", "asof_ts", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    val batch = AsofJoin.asofJoin(
      all.filter(col("typ") === "purchase").drop("typ"),
      all.filter(col("typ") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("cid")),
      Seq("user_id"), "ts", "ts", Map("cid" -> "click_id"),
      rightTieBreak = "cid")
      .select("event_id", "user_id", "ts", "asof_ts", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(streamed == batch, s"streamed=$streamed\nbatch=$batch")
    // the late click revisions actually landed (batch-1 match was 101)
    assert(streamed.exists(t => t._1 == 201L && t._5.contains(103L)))
    // the u2 ts=35 tie resolved to max event_id (105 > 102)
    assert(streamed.exists(t => t._1 == 202L && t._5.contains(105L)))
  }

  test("streaming as-of: right rows beyond the watermark cannot revise") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("typ",
        org.apache.spark.sql.types.StringType)))
    val base = java.nio.file.Files.createTempDirectory("asofwm").toString
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    def land(rows: Seq[(Long, Long, Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("asofarr2").toString
      rows.toDF("event_id", "user_id", "ts", "typ").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$name"))
    }
    land(Seq((201L, 1L, 1000L, "purchase"), (101L, 1L, 900L, "click")), "b1.parquet")
    val q = AsofJoin.streamingAsofJoin(spark, src, schema,
      s"$base/state", s"$base/out", s"$base/ckpt", Seq("user_id"),
      leftFilter = "typ = 'purchase'", rightFilter = "typ = 'click'",
      leftId = "event_id", leftTs = "ts", rightTs = "ts",
      rightCols = Map("event_id" -> "click_id"), rightTieBreak = "event_id",
      watermark = 50L)
    try {
      q.processAllAvailable()
      // click@950 is 50 behind the 1000 high-water: exactly at the
      // watermark edge (>= cutoff) → allowed, revises 900 → 950
      land(Seq((102L, 1L, 950L, "click")), "b2.parquet"); q.processAllAvailable()
      // click@940 is beyond the watermark → dropped, no revision
      land(Seq((103L, 1L, 940L, "click")), "b3.parquet"); q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(s"$base/out").filter(col("event_id") === 201L).head()
    assert(out.getAs[Long]("click_id") == 102L, out)
    assert(out.getAs[Long]("asof_ts") == 950L, out)
  }

  test("streaming as-of: compaction prunes state to the watermark horizon, results intact") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("typ",
        org.apache.spark.sql.types.StringType)))
    val base = java.nio.file.Files.createTempDirectory("asofprune").toString
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    def land(rows: Seq[(Long, Long, Long, String)], name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("asofarr3").toString
      rows.toDF("event_id", "user_id", "ts", "typ").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$name"))
    }
    val b1 = Seq((101L, 1L, 10L, "click"), (201L, 1L, 20L, "purchase"))
    val b2 = Seq((102L, 1L, 150L, "click"), (202L, 1L, 160L, "purchase"))
    // batchId 2 triggers the compaction: highWater=310, horizon=210 →
    // left keeps only ts>=210 (one row), right keeps in-horizon (300)
    // plus the newest-below-horizon row per key (150); 10 drops
    val b3 = Seq((103L, 1L, 300L, "click"), (203L, 1L, 310L, "purchase"))
    land(b1, "b1.parquet")
    val q = AsofJoin.streamingAsofJoin(spark, src, schema,
      s"$base/state", s"$base/out", s"$base/ckpt", Seq("user_id"),
      leftFilter = "typ = 'purchase'", rightFilter = "typ = 'click'",
      leftId = "event_id", leftTs = "ts", rightTs = "ts",
      rightCols = Map("event_id" -> "click_id"), rightTieBreak = "event_id",
      watermark = 100L, compactEvery = 2)
    try {
      q.processAllAvailable()
      land(b2, "b2.parquet"); q.processAllAvailable()
      land(b3, "b3.parquet"); q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(s"$base/state/right").count() == 2) // 150 + 300
    assert(spark.read.parquet(s"$base/state/left").count() == 1)  // 310 only
    val out = spark.read.parquet(s"$base/out")
      .select("event_id", "click_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(201L -> 101L, 202L -> 102L, 203L -> 103L), out)
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
