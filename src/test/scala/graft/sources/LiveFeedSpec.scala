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
}
