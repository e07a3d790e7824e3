package graft.catalog

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.f1.Fixtures
import graft.operators.F1Transforms
import graft.sources.EventSource

class SchemaVerifySpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = EventSource.fromLines(spark, Fixtures.pyLines).cache()

  test("C3: every derived table matches its expected schema contract") {
    val derived = Map(
      "sessions" -> F1Transforms.sessions(events),
      "drivers" -> F1Transforms.drivers(events),
      "lap_data" -> F1Transforms.laps(events),
      "positions" -> F1Transforms.positionsFromTiming(events),
      "telemetry" -> F1Transforms.telemetry(events),
      "race_control" -> F1Transforms.raceControl(events),
      "weather" -> F1Transforms.weather(events))
    derived.foreach { case (name, df) =>
      val report = SchemaVerify.verifySchema(df, name, SchemaVerify.expectedTables(name))
      val bad = report.filter(!col("compatible")).collect()
      assert(bad.isEmpty, s"$name: ${bad.mkString(", ")}")
    }
  }

  test("C3/§1.4: Supabase-shaped tables match the reference's hosted schema") {
    val canonical = Map(
      "sessions" -> F1Transforms.sessions(events),
      "drivers" -> F1Transforms.drivers(events),
      "positions" -> F1Transforms.positionsFromTiming(events),
      "telemetry" -> F1Transforms.telemetry(events),
      "race_control" -> F1Transforms.raceControl(events),
      "car_positions" -> F1Transforms.carPositions(events),
      "weather" -> F1Transforms.weather(events))
    graft.sinks.SupabaseShapes.mappings.foreach { case (supaName, srcName, shape) =>
      val shaped = shape(canonical(srcName))
      val report = SchemaVerify.verifySchema(shaped, supaName,
        SchemaVerify.expectedSupabaseTables(supaName))
      val bad = report.filter(!col("compatible")).collect()
      assert(bad.isEmpty, s"$supaName: ${bad.mkString(", ")}")
      // the §1.4 divergences are real in the output, not just declared:
      if (shaped.columns.contains("driver_number"))
        assert(shaped.schema("driver_number").dataType.typeName == "string",
          s"$supaName driver_number must be varchar-shaped")
    }
  }

  test("C3: incompatibilities and missing columns are reported, not thrown") {
    val df = Seq((1, "x")).toDF("driver_number", "name")
    val report = SchemaVerify.verifySchema(df, "drivers",
      Seq("driver_number" -> "text", "name" -> "text", "team" -> "text"))
      .collect().map(r => r.getString(1) -> (r.getBoolean(4), r.getBoolean(5))).toMap
    assert(report("driver_number") == ((true, false))) // exists, wrong class
    assert(report("name") == ((true, true)))
    assert(report("team") == ((false, false)))          // missing
  }

  test("C1/C2: catalog listing over registered temp views") {
    F1Transforms.weather(events).createOrReplaceTempView("weather_v")
    assert(SchemaVerify.listTables(spark).contains("weather_v"))
    val cols = SchemaVerify.listColumns(spark, "weather_v")
      .orderBy("ordinal").collect()
    assert(cols.head.getAs[String]("column_name") == "timestamp")
    assert(cols.map(_.getAs[String]("column_name")).contains("rainfall_bool"))
    assert(cols.forall(_.getAs[String]("table_name") == "weather_v"))
  }

  test("C4: referential probe — telemetry drivers all exist in drivers table") {
    val orphans = SchemaVerify.orphanCount(
      F1Transforms.telemetry(events), "driver_number",
      F1Transforms.drivers(events), "driver_number")
      .head().getLong(0)
    assert(orphans == 0)
    // and a violation is actually detected when present
    val parent = Seq(1).toDF("driver_number")
    val bad = SchemaVerify.orphanCount(
      F1Transforms.telemetry(events), "driver_number", parent, "driver_number")
      .head().getLong(0)
    assert(bad > 0)
  }

  test("profile: per-column nulls, distincts, min/max; one row per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("aa"), 10),
      (2L, None, 20),
      (3L, Some("zz"), 20),
      (4L, Some("aa"), 30)
    ).toDF("id", "name", "score")
    val out = graft.catalog.Profile.profile(df, Seq("id", "name", "score"))
      .orderBy("column").collect()
    assert(out.length == 3)
    val byCol = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getString(3), r.getString(4))).toMap
    assert(byCol("id") == (0L, 4L, "1", "4"))
    // null is not a distinct value, and min/max skip it
    assert(byCol("name") == (1L, 2L, "aa", "zz"))
    assert(byCol("score") == (0L, 3L, "10", "30"))
  }
}
