package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Coercions.toNtz

/** The reference's DIVERGENT Supabase deployment shapes (SURVEY §1.4):
  * the hosted schema was designed before the pipeline and the loader
  * adapts to it rather than fixing it, so the Supabase tables differ from
  * the canonical ones in systematic ways this mapping reproduces:
  *
  *  - `driver_number` is `character varying`, not integer — the loader
  *    casts with `str(...)` (/root/reference/supabase_loader.py:239,263,288,355;
  *    /root/reference/verify_tables.py:325,381);
  *  - timestamps are `timestamp without time zone` — the loader strips
  *    tzinfo (/root/reference/supabase_loader.py:262,285-286,380);
  *  - columns are renamed (name→full_name, short_name→tla, team→team_name,
  *    x→x_coord …) and tables renamed (drivers→session_drivers,
  *    positions→driver_positions, telemetry→car_telemetry,
  *    race_control→race_control_messages, weather→weather_data);
  *  - a `session_id` FK placeholder rides along (the reference hardcodes 1:
  *    supabase_loader.py:237,291,321; weather gets NULL: :379);
  *  - telemetry throttle/brake are loaded as floats
  *    (supabase_loader.py:293-294);
  *  - `lap_data` has NO Supabase table — the loader drops it
  *    (supabase_loader.py:150-152).
  *
  * Each function maps a canonical derived frame
  * ([[graft.operators.F1Transforms]]) to its Supabase shape; compose with
  * any [[TableSink]]/[[JdbcSink]] write. `created_at`/`updated_at`
  * bookkeeping columns are intentionally omitted — the reference fills
  * them with `datetime.now()`, which is nondeterministic load-time state,
  * not data (a real deployment gets them from column DEFAULTs).
  */
object SupabaseShapes {

  private val sessionIdPlaceholder = lit(1)

  /** sessions → public.sessions (supabase_loader.py:181-204). */
  def sessions(df: DataFrame): DataFrame =
    df.select(
      col("session_key").as("key"),
      col("type"),
      col("name"),
      toNtz(col("date")).as("start_date"),
      lit(1).as("race_id"),
      lit(null).cast("timestamp_ntz").as("end_date"),
      lit(null).cast("string").as("gmt_offset"),
      lit(null).cast("string").as("path"))

  /** drivers → public.session_drivers (supabase_loader.py:207-249). */
  def sessionDrivers(df: DataFrame): DataFrame =
    df.select(
      sessionIdPlaceholder.as("session_id"),
      col("driver_number").cast("string").as("driver_number"),
      col("name").as("full_name"),
      col("broadcast_name"),
      col("short_name").as("tla"),
      col("team").as("team_name"),
      col("team_color"),
      col("first_name"),
      col("last_name"),
      col("headshot_url"))

  /** positions → public.driver_positions (supabase_loader.py:253-277). */
  def driverPositions(df: DataFrame): DataFrame =
    df.select(
      sessionIdPlaceholder.as("session_id"),
      toNtz(col("timestamp")).as("timestamp"),
      col("driver_number").cast("string").as("driver_number"),
      col("position"))

  /** telemetry → public.car_telemetry (supabase_loader.py:279-313). */
  def carTelemetry(df: DataFrame): DataFrame =
    df.select(
      toNtz(col("timestamp")).as("timestamp"),
      toNtz(col("timestamp")).as("utc_timestamp"),
      sessionIdPlaceholder.as("session_id"),
      col("driver_number").cast("string").as("driver_number"),
      col("rpm"),
      col("speed"),
      col("gear"),
      col("throttle").cast("double").as("throttle"),
      col("brake").cast("double").as("brake"),
      col("drs"))

  /** race_control → public.race_control_messages (supabase_loader.py:315-341).
    * Timestamp stays zone-aware — the reference passes it through with the
    * comment "timestamp with time zone OK".
    */
  def raceControlMessages(df: DataFrame): DataFrame =
    df.select(
      sessionIdPlaceholder.as("session_id"),
      col("timestamp"),
      lit(null).cast("timestamp_ntz").as("utc_time"),
      col("category"),
      col("message"),
      col("flag"),
      col("scope"),
      col("sector"))

  /** car_positions → public.car_positions (supabase_loader.py:343-370). */
  def carPositions(df: DataFrame): DataFrame =
    df.select(
      sessionIdPlaceholder.as("session_id"),
      col("timestamp"),
      lit(null).cast("timestamp_ntz").as("utc_time"),
      col("driver_number").cast("string").as("driver_number"),
      col("x").as("x_coord"),
      col("y").as("y_coord"),
      col("z").as("z_coord"))

  /** weather → public.weather_data (supabase_loader.py:372-396): NULL
    * session_id, NTZ timestamp, the NUMERIC rainfall flavor (P9's
    * monitor_weather.py path, not the boolean one).
    */
  def weatherData(df: DataFrame): DataFrame =
    df.select(
      lit(null).cast("int").as("session_id"),
      toNtz(col("timestamp")).as("timestamp"),
      col("air_temp"),
      col("track_temp"),
      col("humidity"),
      col("pressure"),
      col("wind_speed"),
      col("wind_direction"),
      col("rainfall_num").as("rainfall"))

  /** (supabase table name, canonical source table, mapping) — lap_data is
    * deliberately absent (supabase_loader.py:150-152 drops it).
    */
  val mappings: Seq[(String, String, DataFrame => DataFrame)] = Seq(
    ("sessions", "sessions", sessions _),
    ("session_drivers", "drivers", sessionDrivers _),
    ("driver_positions", "positions", driverPositions _),
    ("car_telemetry", "telemetry", carTelemetry _),
    ("race_control_messages", "race_control", raceControlMessages _),
    ("car_positions", "car_positions", carPositions _),
    ("weather_data", "weather", weatherData _))
}
