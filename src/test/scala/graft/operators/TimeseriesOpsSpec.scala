package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sessionization + bucketed range join: planted-case semantics and the
  * plan properties that make each scale (one Window; equi-join instead of
  * broadcast-nested-loop).
  */
class TimeseriesOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize: gap splits sessions, ties ordered by tie-break, per-key ordinals") {
    val ev = Seq(
      // user 1: two sessions (gap 100 > maxGap 50 between ts 120 and 300)
      (1L, 1L, 100L), (2L, 1L, 120L), (3L, 1L, 300L), (4L, 1L, 330L),
      // user 2: one session, with an equal-ts tie (ids 6,5 at ts 20)
      (6L, 2L, 20L), (5L, 2L, 20L), (7L, 2L, 60L))
      .toDF("event_id", "user_id", "ts")
    val out = Sessionize.sessionize(ev, Seq("user_id"), "ts", "event_id", maxGap = 50L)
      .orderBy("user_id", "ts", "event_id").collect()
    val seqs = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(seqs.toSeq == Seq(
      (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 2L), (4L, 1L, 2L),
      (5L, 2L, 1L), (6L, 2L, 1L), (7L, 2L, 1L)), seqs.toSeq)

    val stats = Sessionize.sessionStats(ev, Seq("user_id"), "ts", "event_id",
      maxGap = 50L).orderBy("user_id", "session_seq").collect()
    assert(stats.length == 3)
    assert(stats(0).getAs[Long]("n_events") == 2)
    assert(stats(1).getAs[Long]("session_start") == 300L)
    assert(stats(1).getAs[Long]("session_end") == 330L)
    assert(stats(2).getAs[Long]("n_events") == 3)

    // plan: lag and the cumulative sum need different frames (two Window
    // operators) but share partitioning+ordering — so ONE exchange and
    // ONE sort serve both; a second sort/shuffle would mean the specs
    // drifted apart
    val plan = Sessionize.sessionize(ev, Seq("user_id"), "ts", "event_id", 50L)
      .queryExecution.executedPlan.toString
    def countNodes(prefix: String) = plan.linesIterator
      .count(_.trim.stripPrefix("+- ").startsWith(prefix))
    assert(countNodes("Window ") == 2, plan)
    assert(countNodes("Exchange") <= 1, s"windows must share one exchange:\n$plan")
    assert(countNodes("Sort ") <= 1, s"windows must share one sort:\n$plan")
  }

  test("range join: exact interval membership, multi-bucket intervals meet each point once") {
    val points = Seq((1L, "k", 5L), (2L, "k", 25L), (3L, "k", 99L), (4L, "z", 25L))
      .toDF("pid", "key", "pt")
    val intervals = Seq(
      ("k", 0L, 30L, 100L),   // spans buckets 0..3 at width 10 — covers pts 5 and 25
      ("k", 24L, 26L, 200L),  // narrow — covers pt 25 only
      ("z", 0L, 10L, 300L))   // other key — covers nothing (z point at 25)
      .toDF("key", "s", "e", "iid")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "pt", "s", "e", bucketWidth = 10L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    // each matching pair appears EXACTLY once despite interval 100 spanning
    // 4 buckets (no dedup pass in the operator — multiset parity)
    assert(out.toSeq == Seq((1L, 100L), (2L, 100L), (2L, 200L)), out.toSeq)

    // plan: a real equi-join on (key, bucket) — never a nested-loop scan
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "pt", "s", "e", 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("sessionize parity with streaming session_window aggregation") {
    // the scaladoc claim: batch backfill (Sessionize) and the
    // streaming-native session_window share semantics. Same instants, gap
    // 50 s: per-session (user, n_events, start, end) sets must be equal.
    // (Boundary nuance: at a gap of EXACTLY maxGap, Sessionize merges
    // (`> maxGap` splits) while session_window splits (exclusive end) —
    // the fixture avoids the boundary, as real gap choices should.)
    val rows = Seq(
      (1L, 1L, 100L), (2L, 1L, 120L), (3L, 1L, 300L), (4L, 1L, 330L),
      (5L, 2L, 20L), (6L, 2L, 21L), (7L, 2L, 60L))
    val srcDir = java.nio.file.Files.createTempDirectory("sesssrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sessckpt").toString
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("user_id", LongType), StructField("sec", LongType)))
    rows.toDF("event_id", "user_id", "sec").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)

    val streamed = spark.readStream.schema(schema).parquet(srcDir)
      .withColumn("ts", timestamp_seconds(col("sec")))
      .groupBy(session_window(col("ts"), "50 seconds"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        unix_timestamp(col("session_window.start")).as("start_sec"),
        // session_window end is exclusive: last event + gap
        unix_timestamp(col("session_window.end")).as("end_sec"))
    val q = streamed.writeStream.outputMode("complete")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("sess_parity").start()
    try q.processAllAvailable() finally q.stop()
    val streaming = spark.table("sess_parity").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3) - 50))
      .toSet

    val batch = Sessionize.sessionStats(rows.toDF("event_id", "user_id", "sec"),
      Seq("user_id"), "sec", "event_id", maxGap = 50L).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
        r.getAs[Long]("session_start"), r.getAs[Long]("session_end")))
      .toSet
    assert(streaming == batch, s"streaming=$streaming batch=$batch")
  }

  test("overlap join: naive-join parity, exactly-once across shared buckets, equi-join plan") {
    // left/right intervals engineered so pairs co-cover MANY buckets at
    // width 10 (the exactly-once hazard), plus touching-endpoint overlaps
    // (inclusive bounds) and disjoint / other-key negatives
    val left = Seq(
      ("k", 0L, 50L, 1L),   // wide — overlaps r100 (5 shared buckets), r200 (touch at 50)
      ("k", 60L, 65L, 2L),  // overlaps r200 only
      ("k", 90L, 95L, 3L),  // disjoint from everything
      ("z", 0L, 50L, 4L))   // other key — no partner
      .toDF("key", "ls", "le", "lid")
    val right = Seq(
      ("k", 5L, 45L, 100L),  // inside l1
      ("k", 50L, 62L, 200L), // touches l1 at 50 (inclusive), overlaps l2
      ("z", 60L, 70L, 300L)) // other key, disjoint from z's left
      .toDF("key", "rs", "re", "rid")

    def pairs(w: Long) = RangeJoin.intervalOverlap(left, right, Seq("key"),
      "ls", "le", "rs", "re", bucketWidth = w)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val expected = Seq((1L, 100L), (1L, 200L), (2L, 200L))
    // exactly once per overlapping pair at every width regime (shared
    // buckets at 10, single bucket at huge, per-unit at 1)
    assert(pairs(10L) == expected, pairs(10L))
    assert(pairs(1L) == expected)
    assert(pairs(1000000L) == expected)

    val plan = RangeJoin.intervalOverlap(left, right, Seq("key"),
      "ls", "le", "rs", "re", 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("range join: degenerate bucket widths stay correct (1 and huge)") {
    val points = Seq((1L, "k", 7L)).toDF("pid", "key", "pt")
    val intervals = Seq(("k", 5L, 9L, 10L), ("k", 8L, 12L, 20L))
      .toDF("key", "s", "e", "iid")
    def pairs(w: Long) = RangeJoin.pointInInterval(points, intervals,
      Seq("key"), "pt", "s", "e", w)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(pairs(1L) == Seq((1L, 10L)))
    assert(pairs(1000000L) == Seq((1L, 10L)))
  }
}
