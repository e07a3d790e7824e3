package graft.f1

import java.util.Base64
import java.util.zip.Deflater

/** Deterministic, programmatically-generated wire-format fixture lines in
  * the shapes documented in FIXTURES.md §A / SURVEY §1.2-1.3. Nothing here
  * is copied from the reference repo — payloads are synthesized to exercise
  * every topic, both wire formats, both RaceControl shapes, compressed
  * topics, delta-encoded TimingData, and malformed-line handling.
  */
object Fixtures {

  /** base64(raw-deflate(json)) — the `.z` topic payload encoding. */
  def deflateB64(json: String): String = {
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION, true) // nowrap
    deflater.setInput(json.getBytes("UTF-8"))
    deflater.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    Base64.getEncoder.encodeToString(out.toByteArray)
  }

  private def ts(sec: Int, frac: String = "000"): String =
    f"2025-05-17T14:${sec / 60}%02d:${sec % 60}%02d.${frac}Z"

  val carDataJson: String =
    """{"Entries": [
      |{"Utc": "2025-05-17T14:00:01.100Z", "Cars": {
      |  "1":  {"Channels": {"0": 10500, "2": 280, "3": 7, "4": 99, "5": 0, "45": 12}},
      |  "16": {"Channels": {"0": 9800,  "2": 255, "3": 6, "4": 80, "5": 0, "45": 8}}}},
      |{"Utc": "2025-05-17T14:00:01.340Z", "Cars": {
      |  "1":  {"Channels": {"0": 10700, "2": 288, "3": 7, "4": 100, "5": 0, "45": 12}},
      |  "16": {"Channels": {"0": 4200,  "2": 120, "3": 3, "4": 0, "5": 100, "45": 8}},
      |  "55": {"Channels": {"0": 7000,  "2": 190, "3": 5, "4": 50, "5": 0, "45": 8}}}}
      |]}""".stripMargin

  val positionZJson: String =
    """{"Position": [
      |{"Timestamp": "2025-05-17T14:00:02.050Z", "Entries": {
      |  "1":  {"Status": "OnTrack", "X": -5533, "Y": -1218, "Z": 61},
      |  "16": {"Status": "OnTrack", "X": -4432, "Y": -1417, "Z": 59}}},
      |{"Timestamp": "2025-05-17T14:00:02.250Z", "Entries": {
      |  "1":  {"Status": "OnTrack", "X": -5600, "Y": -1230, "Z": 61},
      |  "16": {"Status": "InPit",   "X": 0,     "Y": 0,     "Z": 0},
      |  "55": {"Status": "OnTrack", "X": 1200,  "Y": 880,   "Z": 63}}}
      |]}""".stripMargin

  /** Canonical wire format: Python-list literal lines (format 1). */
  val pyLines: Seq[String] = Seq(
    // DriverList — includes a duplicate driver 1 (first-wins dedup A1) and
    // a rich entry vs a sparse delta entry.
    s"['DriverList', {'1': {'RacingNumber': '1', 'Tla': 'AAA', 'Name': 'A DRIVERONE', " +
      s"'FirstName': 'Alpha', 'LastName': 'Driverone', 'TeamName': 'Team Red', " +
      s"'TeamColour': '3671C6', 'Line': 1}, " +
      s"'16': {'RacingNumber': '16', 'Tla': 'BBB', 'Name': 'B DRIVERTWO', " +
      s"'FirstName': 'Beta', 'LastName': 'Drivertwo', 'TeamName': 'Team Green', " +
      s"'TeamColour': 'F91536', 'Line': 2}}, '${ts(0)}']",
    s"['DriverList', {'1': {'Name': 'A RENAMED'}, '55': {'RacingNumber': '55', " +
      s"'Tla': 'CCC', 'Name': 'C DRIVERTHREE', 'TeamName': 'Team Blue', 'Line': 3}}, '${ts(1)}']",
    // SessionInfo — nested Meeting/Circuit/Country shape.
    s"['SessionInfo', {'Meeting': {'Key': 1261, 'Name': 'Test Grand Prix', " +
      s"'OfficialName': 'FORMULA 1 TEST GRAND PRIX 2025', 'Location': 'Testville', " +
      s"'Country': {'Key': 114, 'Code': 'TST', 'Name': 'Testland'}, " +
      s"'Circuit': {'Key': 22, 'ShortName': 'Test Ring'}}, 'Key': 9001, " +
      s"'Type': 'Qualifying', 'Name': 'Qualifying', 'StartDate': '2025-05-17T14:00:00', " +
      s"'EndDate': '2025-05-17T15:00:00', 'GmtOffset': '02:00:00', " +
      s"'Path': '2025/test_gp/quali/', '_kf': True}, '${ts(2)}']",
    // TimingData deltas — driver 1 completes lap 1 (time arrives split
    // across two events: sectors first, then LastLapTime), driver 16 lap 1.
    s"['TimingData', {'Lines': {'1': {'Position': '1', 'NumberOfLaps': 1, 'InPit': False, " +
      s"'Sector1Time': {'Value': '28.111'}, 'Sector2Time': {'Value': '31.222'}}}}, '${ts(65)}']",
    s"['TimingData', {'Lines': {'1': {'NumberOfLaps': 1, " +
      s"'Sector3Time': {'Value': '33.300'}, 'LastLapTime': {'Value': '1:32.633', " +
      s"'PersonalFastest': True}, 'BestSpeed': {'Value': '312'}}}}, '${ts(66)}']",
    s"['TimingData', {'Lines': {'16': {'Position': '2', 'NumberOfLaps': 1, " +
      s"'LastLapTime': {'Value': '93.500'}}, '1': {'Position': '1'}}}, '${ts(70)}']",
    // TimingAppData — fills speed trap for (1, lap 1) and sectors for (16, lap 1).
    s"['TimingAppData', {'Lines': {'1': {'NumberOfLaps': 1, 'SpeedTrap': {'Value': '315'}}, " +
      s"'16': {'NumberOfLaps': 1, 'Sector1': {'Value': '29.000'}, " +
      s"'Sector2': {'Value': '31.500'}, 'Sector3': {'Value': '33.000'}}}}, '${ts(71)}']",
    // Weather — numeric strings, rainfall both '0' and 'true' (R1).
    s"['WeatherData', {'AirTemp': '22.2', 'Humidity': '31.0', 'Pressure': '1008.6', " +
      s"'Rainfall': '0', 'TrackTemp': '39.4', 'WindDirection': '301', " +
      s"'WindSpeed': '1.2', '_kf': True}, '${ts(4, "128")}']",
    s"['WeatherData', {'AirTemp': '21.8', 'Humidity': '35.5', 'Pressure': '1008.4', " +
      s"'Rainfall': 'true', 'TrackTemp': '38.1', 'WindDirection': '295', " +
      s"'WindSpeed': '2.0'}, '${ts(64, "128")}']",
    // Bad coercions exercised: empty + junk values (P7/P8 null paths).
    s"['WeatherData', {'AirTemp': '', 'Humidity': 'n/a', 'Pressure': '1008.0', " +
      s"'Rainfall': '0', 'TrackTemp': '37.9', 'WindDirection': '', 'WindSpeed': '0.4'}, '${ts(124, "128")}']",
    // RaceControl — list shape.
    s"['RaceControlMessages', {'Messages': [{'Utc': '2025-05-17T14:00:00', " +
      s"'Category': 'Flag', 'Flag': 'GREEN', 'Scope': 'Track', " +
      s"'Message': 'GREEN LIGHT - PIT EXIT OPEN'}], '_kf': True}, '${ts(0, "175")}']",
    // RaceControl — dict shape keyed by msg id, includes a duplicate id (A2).
    s"['RaceControlMessages', {'Messages': {'5': {'Utc': '2025-05-17T14:01:10', " +
      s"'Category': 'Other', 'Scope': 'Sector', 'Sector': 7, " +
      s"'Message': 'TRACK LIMITS AT TURN 4', 'RacingNumber': '16', 'Lap': 1}}}, '${ts(72)}']",
    s"['RaceControlMessages', {'Messages': {'5': {'Utc': '2025-05-17T14:01:10', " +
      s"'Category': 'Other', 'Scope': 'Sector', 'Sector': 7, " +
      s"'Message': 'TRACK LIMITS AT TURN 4', 'RacingNumber': '16', 'Lap': 1}}}, '${ts(73)}']",
    // Compressed topics.
    s"['CarData.z', '${deflateB64(carDataJson)}', '${ts(1, "6797217")}']",
    s"['Position.z', '${deflateB64(positionZJson)}', '${ts(2, "789584")}']",
    // Malformed lines (T13): truncated literal + non-list garbage.
    "['WeatherData', {'AirTemp': '22.",
    "this is not an event line")

  /** The same events in the transformer's JSON wire format (format 2):
    * `{"topic":…, "data":…, "timestamp":…}` with simplified payloads —
    * TimingData drivers at top level, Position.z as driver→[x,y,z]
    * (/root/reference/transformer.py:41-46,162,284-287).
    */
  val jsonLines: Seq[String] = Seq(
    s"""{"topic": "DriverList", "data": {"1": {"RacingNumber": "1", "Tla": "AAA", "Name": "A DRIVERONE", "TeamName": "Team Red"}}, "timestamp": "${ts(0)}"}""",
    s"""{"topic": "TimingData", "data": {"1": {"Position": "1", "NumberOfLaps": 1, "LastLapTime": {"Value": "1:32.633"}}}, "timestamp": "${ts(66)}"}""",
    s"""{"topic": "Position.z", "data": {"1": [-5533.0, -1218.0, 61.0], "16": [-4432.0, -1417.0, 59.0]}, "timestamp": "${ts(2)}"}""",
    s"""{"topic": "WeatherData", "data": {"AirTemp": "22.2", "Humidity": "31.0", "Pressure": "1008.6", "Rainfall": "0", "TrackTemp": "39.4", "WindDirection": "301", "WindSpeed": "1.2"}, "timestamp": "${ts(4, "128")}"}""",
    """not json at all""")

  /** A larger deterministic capture for bench/streaming tests: `n` weather +
    * telemetry + timing lines with evolving values (pure function of `i`).
    */
  def syntheticCapture(n: Int): Seq[String] = {
    (0 until n).flatMap { i =>
      val t = ts(i % 3600, f"${i % 1000}%03d")
      val base = Seq(
        s"['WeatherData', {'AirTemp': '${20 + (i % 80) / 10.0}', 'Humidity': '${30 + i % 40}', " +
          s"'Pressure': '${1005 + i % 9}.${i % 10}', 'Rainfall': '${i % 7 == 0}', " +
          s"'TrackTemp': '${35 + (i % 100) / 10.0}', 'WindDirection': '${i % 360}', " +
          s"'WindSpeed': '${(i % 50) / 10.0}'}, '$t']",
        s"['TimingData', {'Lines': {'${1 + i % 20}': {'Position': '${1 + i % 20}', " +
          s"'NumberOfLaps': ${1 + i / 40}, 'LastLapTime': {'Value': '1:${30 + i % 25}.${100 + i % 900}'}}}}, '$t']")
      if (i % 4 == 0) {
        val cars = (1 to 3).map { d =>
          s""""${d + (i % 5) * 3}": {"Channels": {"0": ${8000 + i % 4000}, "2": ${100 + i % 220}, "3": ${1 + i % 8}, "4": ${i % 101}, "5": ${(i % 2) * 100}, "45": ${8 + (i % 2) * 4}}}"""
        }.mkString(",")
        base :+ s"['CarData.z', '${deflateB64(s"""{"Entries": [{"Utc": "$t", "Cars": {$cars}}]}""")}', '$t']"
      } else base
    }
  }
}
