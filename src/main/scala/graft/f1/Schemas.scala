package graft.f1

import org.apache.spark.sql.types._

/** Spark `StructType`s for every decoded F1 live-timing payload
  * (SURVEY §1.3, verified against /root/reference/f1_data_q1.txt samples;
  * literals in FIXTURES.md §A).
  *
  * Design note: the reference's model classes accept arbitrary extra
  * attributes (/root/reference/models.py:16-18); Spark schemas are fixed, so
  * we pin explicit nullable columns and keep the raw JSON payload column
  * alongside for anything unmodeled.
  */
object Schemas {

  /** The wire event envelope after P1/P2 parsing. */
  val wireEvent: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("payload", StringType),
    StructField("ts", StringType)))

  /** CarData.z decoded JSON (/root/reference/monitor_car_telemetry.py:122-147):
    * Entries[] × Cars map × Channels map (channel id → int value).
    */
  val carData: StructType = StructType(Seq(
    StructField("Entries", ArrayType(StructType(Seq(
      StructField("Utc", StringType),
      StructField("Cars", MapType(StringType, StructType(Seq(
        StructField("Channels", MapType(StringType, IntegerType))))))))))))

  /** Position.z decoded JSON (/root/reference/monitor_car_positions.py:119-137). */
  val positionZ: StructType = StructType(Seq(
    StructField("Position", ArrayType(StructType(Seq(
      StructField("Timestamp", StringType),
      StructField("Entries", MapType(StringType, StructType(Seq(
        StructField("Status", StringType),
        StructField("X", IntegerType),
        StructField("Y", IntegerType),
        StructField("Z", IntegerType)))))))))))

  /** One driver's TimingData delta fields — only fields the reference
    * consumes (/root/reference/transformer.py:162-212). Values arrive as a
    * mix of strings and numbers; strings here + coercion downstream.
    */
  val timingLine: StructType = StructType(Seq(
    StructField("Position", StringType),
    StructField("NumberOfLaps", IntegerType),
    StructField("InPit", BooleanType),
    StructField("PitOut", BooleanType),
    StructField("Status", IntegerType),
    StructField("LastLapTime", StructType(Seq(
      StructField("Value", StringType),
      StructField("PersonalFastest", BooleanType)))),
    StructField("Sector1Time", StructType(Seq(StructField("Value", StringType)))),
    StructField("Sector2Time", StructType(Seq(StructField("Value", StringType)))),
    StructField("Sector3Time", StructType(Seq(StructField("Value", StringType)))),
    StructField("BestSpeed", StructType(Seq(StructField("Value", StringType))))))

  /** TimingData payload: real wire shape wraps drivers in `Lines`
    * (FIXTURES.md §A.1); the transformer's simplified JSON shape is the bare
    * driver map — both are modeled, see [[F1Transforms.timingLines]].
    */
  val timingData: StructType = StructType(Seq(
    StructField("Lines", MapType(StringType, timingLine))))

  val timingDataSimplified: MapType = MapType(StringType, timingLine)

  /** TimingAppData (/root/reference/transformer.py:226-266). */
  val timingAppLine: StructType = StructType(Seq(
    StructField("NumberOfLaps", IntegerType),
    StructField("Sector1", StructType(Seq(StructField("Value", StringType)))),
    StructField("Sector2", StructType(Seq(StructField("Value", StringType)))),
    StructField("Sector3", StructType(Seq(StructField("Value", StringType)))),
    StructField("SpeedTrap", StructType(Seq(StructField("Value", StringType))))))

  val timingAppData: StructType = StructType(Seq(
    StructField("Lines", MapType(StringType, timingAppLine))))

  /** DriverList: driver number → attributes (/root/reference/transformer.py:97-113). */
  val driverEntry: StructType = StructType(Seq(
    StructField("RacingNumber", StringType),
    StructField("Name", StringType),
    StructField("FirstName", StringType),
    StructField("LastName", StringType),
    StructField("Tla", StringType),
    StructField("TeamName", StringType),
    StructField("TeamColour", StringType),
    StructField("BroadcastName", StringType),
    StructField("HeadshotUrl", StringType),
    StructField("CountryCode", StringType),
    StructField("Line", IntegerType)))

  val driverList: MapType = MapType(StringType, driverEntry)

  /** SessionInfo (/root/reference/transformer.py:127-144; full nested shape
    * FIXTURES.md §A.4).
    */
  val sessionInfo: StructType = StructType(Seq(
    StructField("Key", IntegerType),
    StructField("Type", StringType),
    StructField("Name", StringType),
    StructField("StartDate", StringType),
    StructField("EndDate", StringType),
    StructField("GmtOffset", StringType),
    StructField("Path", StringType),
    StructField("Meeting", StructType(Seq(
      StructField("Key", IntegerType),
      StructField("Name", StringType),
      StructField("OfficialName", StringType),
      StructField("Location", StringType),
      StructField("Country", StructType(Seq(
        StructField("Key", IntegerType),
        StructField("Code", StringType),
        StructField("Name", StringType)))),
      StructField("Circuit", StructType(Seq(
        StructField("Key", IntegerType),
        StructField("ShortName", StringType)))))))))

  /** RaceControlMessages — message struct shared by both payload shapes
    * (list form /root/reference/transformer.py:354-378; dict form
    * /root/reference/monitor_race_control.py:122-135).
    */
  val raceControlMessage: StructType = StructType(Seq(
    StructField("Utc", StringType),
    StructField("Category", StringType),
    StructField("Flag", StringType),
    StructField("Scope", StringType),
    StructField("Message", StringType),
    StructField("Sector", IntegerType),
    StructField("Lap", IntegerType),
    StructField("RacingNumber", StringType),
    StructField("DriverNumber", StringType)))

  val raceControlList: StructType = StructType(Seq(
    StructField("Messages", ArrayType(raceControlMessage))))

  val raceControlDict: StructType = StructType(Seq(
    StructField("Messages", MapType(StringType, raceControlMessage))))

  /** WeatherData — all values arrive as strings
    * (/root/reference/transformer.py:397-403).
    */
  val weatherData: StructType = StructType(Seq(
    StructField("AirTemp", StringType),
    StructField("TrackTemp", StringType),
    StructField("Humidity", StringType),
    StructField("Pressure", StringType),
    StructField("Rainfall", StringType),
    StructField("WindDirection", StringType),
    StructField("WindSpeed", StringType)))
}
