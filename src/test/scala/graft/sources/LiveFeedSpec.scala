package graft.sources

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.f1.Fixtures

/** S1 live-feed path: a paced TCP replay served by [[LiveFeedServer]] must
  * parse through [[EventSource.readLiveFeed]] identically to the batch
  * file path.
  */
class LiveFeedSpec extends SparkSpec {

  test("socket live feed: paced TCP replay parses like the file path (S1)") {
    val server = LiveFeedServer.start(Fixtures.pyLines, paceMs = 1)
    try {
      val events = EventSource.readLiveFeed(spark, "localhost", server.port)
      val q = events.writeStream.format("memory").queryName("livefeed")
        .trigger(Trigger.ProcessingTime("100 milliseconds"))
        .start()
      try {
        def cnt(): Long = spark.sql("SELECT count(*) FROM livefeed").head().getLong(0)
        val deadline = System.currentTimeMillis() + 60000
        while (cnt() < Fixtures.pyLines.length && System.currentTimeMillis() < deadline)
          Thread.sleep(200)
        assert(cnt() == Fixtures.pyLines.length,
          s"timed out at ${cnt()}/${Fixtures.pyLines.length} lines")
        // the live path normalizes exactly like the batch path — same
        // topics, payloads, timestamps (line_id differs by design)
        val live = spark.sql("SELECT topic, payload, ts FROM livefeed")
        val batch = EventSource.fromLines(spark, Fixtures.pyLines)
          .select("topic", "payload", "ts")
        assert(live.exceptAll(batch).count() == 0)
        assert(batch.exceptAll(live).count() == 0)
      } finally q.stop()
    } finally server.close()
  }

  test("full ETL off the live feed: tables converge like the file path") {
    val base = java.nio.file.Files.createTempDirectory("livefeed").toString
    val server = LiveFeedServer.start(Fixtures.pyLines, paceMs = 1)
    try {
      val q = graft.streaming.F1Pipeline.startUnifiedLive(spark,
        "localhost", server.port, s"$base/tables", s"$base/ckpt",
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      try {
        def laps(): Long =
          try spark.read.parquet(s"$base/tables/lap_data").count()
          catch { case _: Exception => 0L }
        val deadline = System.currentTimeMillis() + 60000
        while (laps() < 2 && System.currentTimeMillis() < deadline) {
          q.processAllAvailable(); Thread.sleep(200)
        }
      } finally q.stop()
      // same converged tables as the file-tail pipeline produces
      assert(spark.read.parquet(s"$base/tables/lap_data").count() == 2)
      assert(spark.read.parquet(s"$base/tables/weather").count() == 3)
      assert(spark.read.parquet(s"$base/tables/drivers").count() == 3)
    } finally server.close()
  }
}
