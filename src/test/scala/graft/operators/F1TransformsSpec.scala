package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.f1.Fixtures
import graft.sources.EventSource
import graft.sources.EventSource.WireFormat

/** Golden-ish end-to-end over the deterministic fixture capture: every
  * topic transform produces the expected typed rows (SURVEY §5 plan #2).
  */
class F1TransformsSpec extends SparkSpec {

  private lazy val events: DataFrame =
    EventSource.fromLines(spark, Fixtures.pyLines).cache()

  test("malformed lines are counted, not dropped silently (T13)") {
    val corrupt = EventSource.corruptCount(events).collect().head.getLong(0)
    assert(corrupt == 2)
  }

  test("drivers: map-explode + first-wins dedup (T2/A1)") {
    val d = F1Transforms.drivers(events).orderBy("driver_number").collect()
    assert(d.length == 3)
    val d1 = d.find(_.getAs[Int]("driver_number") == 1).get
    assert(d1.getAs[String]("name") == "A DRIVERONE") // first wins, not 'A RENAMED'
    assert(d1.getAs[String]("team") == "Team Red")
    assert(d1.getAs[String]("short_name") == "AAA")
    val d55 = d.find(_.getAs[Int]("driver_number") == 55).get
    assert(d55.getAs[String]("team") == "Team Blue")
  }

  test("sessions: nested SessionInfo projection (T3)") {
    val s = F1Transforms.sessions(events).collect()
    assert(s.length == 1)
    val r = s.head
    assert(r.getAs[Int]("session_key") == 9001)
    assert(r.getAs[Int]("meeting_key") == 1261)
    assert(r.getAs[String]("circuit") == "Test Ring")
    assert(r.getAs[String]("country_name") == "Testland")
    assert(r.getAs[java.sql.Timestamp]("date").toInstant.toString == "2025-05-17T14:00:00Z")
  }

  test("laps: T4+T6 fragments consolidate last-non-null per (driver, lap) (A3)") {
    val laps = F1Transforms.laps(events).orderBy("driver_number", "lap_number").collect()
    assert(laps.length == 2)
    val l1 = laps(0)
    assert(l1.getAs[Int]("driver_number") == 1)
    assert(l1.getAs[Int]("lap_number") == 1)
    assert(math.abs(l1.getAs[Double]("lap_time") - 92.633) < 1e-9)
    assert(math.abs(l1.getAs[Double]("sector_1_time") - 28.111) < 1e-9)
    assert(math.abs(l1.getAs[Double]("sector_3_time") - 33.300) < 1e-9)
    assert(l1.getAs[Int]("speed_trap") == 315) // TimingAppData overrode BestSpeed 312
    val l16 = laps(1)
    assert(l16.getAs[Int]("driver_number") == 16)
    assert(l16.getAs[Double]("lap_time") == 93.5)
    assert(l16.getAs[Double]("sector_2_time") == 31.5) // only from TimingAppData
  }

  test("positions from TimingData deltas (T5)") {
    val p = F1Transforms.positionsFromTiming(events)
      .orderBy("timestamp", "driver_number").collect()
    // ts65: d1 pos1; ts70: d1 pos1 then d16 pos2 (ordered by ts, driver)
    assert(p.length == 3)
    assert(p.map(_.getAs[Int]("position")).toSeq == Seq(1, 1, 2))
  }

  test("telemetry: CarData.z decode + double explode + channel map (T9/P3)") {
    val t = F1Transforms.telemetry(events)
      .orderBy("timestamp", "driver_number").collect()
    assert(t.length == 5) // entry1: drivers 1,16; entry2: drivers 1,16,55
    val first = t.head
    assert(first.getAs[Int]("driver_number") == 1)
    assert(first.getAs[Int]("rpm") == 10500)
    assert(first.getAs[Int]("speed") == 280)
    assert(first.getAs[Int]("gear") == 7)
    assert(first.getAs[Int]("drs") == 12)
    assert(first.getAs[java.sql.Timestamp]("timestamp").toInstant.toString ==
      "2025-05-17T14:00:01.100Z") // per-entry Utc, not envelope ts
    val braking = t.find(r => r.getAs[Int]("driver_number") == 16 &&
      r.getAs[Int]("brake") == 100).get
    assert(braking.getAs[Int]("gear") == 3)
  }

  test("car positions: Position.z full explode, rows ALWAYS emitted (T8, fixes R2)") {
    val p = F1Transforms.carPositions(events)
      .orderBy("timestamp", "driver_number").collect()
    assert(p.length == 5) // snap1: 2 drivers; snap2: 3 drivers
    val d16pit = p.find(r => r.getAs[Int]("driver_number") == 16 &&
      r.getAs[String]("status") == "InPit").get
    assert(d16pit.getAs[Int]("x") == 0)
    val d1 = p.head
    assert(d1.getAs[Int]("x") == -5533 && d1.getAs[Int]("y") == -1218)
  }

  test("race control: both payload shapes union; dedup by msg_id (T10/T11/A2)") {
    val rc = F1Transforms.raceControl(events)
    assert(rc.count() == 3) // 1 list-form + 2 dict-form (dup id 5)
    val dedup = rc.orderBy("line_id").dropDuplicates("msg_id")
    assert(dedup.count() == 2)
    val flag = rc.filter(col("flag") === "GREEN").collect().head
    assert(flag.getAs[String]("message") == "GREEN LIGHT - PIT EXIT OPEN")
    assert(flag.getAs[String]("scope") == "Track")
    val tl = rc.filter(col("msg_id") === "5").collect().head
    assert(tl.getAs[Int]("driver_number") == 16)
    assert(tl.getAs[Int]("sector") == 7)
  }

  test("weather: coercions incl. both rainfall semantics (T12/P7/P8/P9/R1)") {
    val w = F1Transforms.weather(events).orderBy("line_id").collect()
    assert(w.length == 3)
    val w0 = w(0)
    assert(w0.getAs[Double]("air_temp") == 22.2)
    assert(w0.getAs[Int]("wind_direction") == 301)
    assert(w0.getAs[Boolean]("rainfall_bool") == false)
    assert(w0.getAs[Double]("rainfall_num") == 0.0)
    val w1 = w(1)
    assert(w1.getAs[Boolean]("rainfall_bool") == true)
    assert(w1.getAs[Double]("rainfall_num") == 1.0)
    val w2 = w(2) // '' and junk coerce to null, row still emitted
    assert(w2.isNullAt(w2.fieldIndex("air_temp")))
    assert(w2.isNullAt(w2.fieldIndex("humidity")))
    assert(w2.isNullAt(w2.fieldIndex("wind_direction")))
    assert(w2.getAs[Double]("pressure") == 1008.0)
  }

  test("second wire format (JSON lines) normalizes into the same frames (§1.2)") {
    val ev2 = EventSource.fromLines(spark, Fixtures.jsonLines, WireFormat.Json).cache()
    assert(EventSource.corruptCount(ev2).collect().head.getLong(0) == 1)
    assert(F1Transforms.drivers(ev2).count() == 1)
    val laps = F1Transforms.laps(ev2).collect()
    assert(laps.length == 1 && math.abs(laps.head.getAs[Double]("lap_time") - 92.633) < 1e-9)
    val pos = F1Transforms.telemetryPositionsSimplified(ev2)
      .orderBy("driver_number").collect()
    assert(pos.length == 2)
    assert(pos.head.getAs[Double]("x") == -5533.0)
    assert(F1Transforms.weather(ev2).count() == 1)
  }

  test("q18 golden: decode pipeline output is pinned row-for-row") {
    // SURVEY §2.10 Q18: oracle is a pre-computed golden, not DuckDB — pin
    // the exact decoded telemetry rows from the fixture capture
    val rows = F1Transforms.telemetry(events)
      .orderBy("timestamp", "driver_number")
      .collect()
      .map(r => (r.getAs[java.sql.Timestamp]("timestamp").toInstant.toString,
        r.getAs[Int]("driver_number"), r.getAs[Int]("rpm"), r.getAs[Int]("speed"),
        r.getAs[Int]("gear"), r.getAs[Int]("throttle"), r.getAs[Int]("brake"),
        r.getAs[Int]("drs")))
      .toSeq
    val golden = Seq(
      ("2025-05-17T14:00:01.100Z", 1, 10500, 280, 7, 99, 0, 12),
      ("2025-05-17T14:00:01.100Z", 16, 9800, 255, 6, 80, 0, 8),
      ("2025-05-17T14:00:01.340Z", 1, 10700, 288, 7, 100, 0, 12),
      ("2025-05-17T14:00:01.340Z", 16, 4200, 120, 3, 0, 100, 8),
      ("2025-05-17T14:00:01.340Z", 55, 7000, 190, 5, 50, 0, 8))
    assert(rows == golden)
  }

  test("lap consolidation is idempotent under replay (U3 semantics)") {
    val once = F1Transforms.laps(events)
    // Replaying the same fragments (batch re-delivery) must not change results.
    val fragments = F1Transforms.lapFragmentsFromTiming(events)
      .unionByName(F1Transforms.lapFragmentsFromApp(events))
    val replayed = F1Transforms.consolidateLaps(fragments.unionByName(fragments))
    val a = once.orderBy("driver_number", "lap_number").collect().map(_.toString).toSeq
    val b = replayed.orderBy("driver_number", "lap_number").collect().map(_.toString).toSeq
    assert(a == b)
  }
}
