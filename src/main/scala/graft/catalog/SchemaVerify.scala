package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Catalog / metadata operators (SURVEY §2.7): the Spark re-expression of
  * the reference's schema-verification harness
  * (/root/reference/verify_tables.py:51-473, supabase_loader.py:46-132):
  * list tables (C1), list columns+types (C2), assert expected schemas with
  * type-compatibility classes (C3), and referential checks as anti-join
  * counts (C4 — Spark has no FKs).
  */
object SchemaVerify {

  /** C3 type-compatibility classes (verify_tables.py:119-127 normalizes
    * Postgres type aliases the same way). Zone-aware and NTZ timestamps
    * are DISTINCT classes — the §1.4 Supabase divergence is precisely
    * "timestamp without time zone", so collapsing them would make the
    * Supabase-shape verification vacuous for its defining property.
    */
  private def typeClass(dt: DataType): String = dt match {
    case _: IntegerType | _: LongType | _: ShortType | _: ByteType => "integer"
    case _: DoubleType | _: FloatType | _: DecimalType             => "numeric"
    case _: StringType                                             => "text"
    case _: BooleanType                                            => "boolean"
    case _: TimestampType                                          => "timestamp"
    case _: TimestampNTZType                                       => "timestamp_ntz"
    case _: BinaryType                                             => "binary"
    case other                                                     => other.typeName
  }

  /** C1 — table inventory of a catalog namespace. */
  def listTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** C2 — column inventory (name, type, nullable) of a registered table,
    * ordered by ordinal position like the reference's
    * `ORDER BY ordinal_position` (supabase_loader.py:85-91).
    */
  def listColumns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    spark.table(table).schema.fields.zipWithIndex.map { case (f, i) =>
      (table, i, f.name, f.dataType.simpleString, typeClass(f.dataType), f.nullable)
    }.toSeq.toDF("table_name", "ordinal", "column_name", "data_type", "type_class", "nullable")
  }

  /** C3 — verify a DataFrame against expected (column → type-class) pairs:
    * one row per expected column with found/compatible flags, plus rows for
    * missing columns. Mirrors verify_tables' essential-fields check.
    */
  def verifySchema(df: DataFrame, table: String,
      expected: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val actual = df.schema.fields.map(f => f.name -> typeClass(f.dataType)).toMap
    expected.map { case (colName, expectedClass) =>
      val found = actual.contains(colName)
      val actualClass = actual.get(colName).orNull
      (table, colName, expectedClass, actualClass, found,
        found && actualClass == expectedClass)
    }.toDF("table_name", "column_name", "expected_class", "actual_class",
      "exists", "compatible")
  }

  /** C4 — referential integrity as an anti-join count: rows of `child`
    * whose key has no match in `parent` (FK-violation probe,
    * verify_tables.py:263-277 re-expressed).
    */
  def orphanCount(child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))

  /** The expected shapes of the engine's derived tables
    * (FIXTURES.md §A.7 / reference DDL loader.py:46-155).
    */
  val expectedTables: Map[String, Seq[(String, String)]] = Map(
    "sessions" -> Seq("session_key" -> "integer", "meeting_key" -> "integer",
      "name" -> "text", "type" -> "text", "date" -> "timestamp",
      "circuit" -> "text", "location" -> "text", "country_name" -> "text"),
    "drivers" -> Seq("driver_number" -> "integer", "name" -> "text",
      "team" -> "text", "team_color" -> "text", "first_name" -> "text",
      "last_name" -> "text", "short_name" -> "text", "broadcast_name" -> "text"),
    "lap_data" -> Seq("driver_number" -> "integer", "lap_number" -> "integer",
      "lap_time" -> "numeric", "sector_1_time" -> "numeric",
      "sector_2_time" -> "numeric", "sector_3_time" -> "numeric",
      "speed_trap" -> "integer", "timestamp" -> "timestamp"),
    "positions" -> Seq("driver_number" -> "integer", "position" -> "integer",
      "timestamp" -> "timestamp"),
    "telemetry" -> Seq("driver_number" -> "integer", "timestamp" -> "timestamp",
      "speed" -> "integer", "rpm" -> "integer", "gear" -> "integer",
      "throttle" -> "integer", "brake" -> "integer", "drs" -> "integer"),
    "race_control" -> Seq("timestamp" -> "timestamp", "message" -> "text",
      "category" -> "text", "flag" -> "text", "driver_number" -> "integer",
      "scope" -> "text", "sector" -> "integer", "lap_number" -> "integer"),
    "weather" -> Seq("timestamp" -> "timestamp", "air_temp" -> "numeric",
      "track_temp" -> "numeric", "humidity" -> "numeric",
      "pressure" -> "numeric", "wind_speed" -> "numeric",
      "wind_direction" -> "integer", "rainfall_bool" -> "boolean",
      "rainfall_num" -> "numeric"))

  /** The reference's divergent Supabase deployment shapes (§1.4): what
    * verify_tables.py:310-473 asserts against the hosted schema —
    * `driver_number` as text, NTZ timestamps, renamed columns/tables.
    * [[graft.sinks.SupabaseShapes]] emits these shapes.
    */
  val expectedSupabaseTables: Map[String, Seq[(String, String)]] = Map(
    "sessions" -> Seq("key" -> "integer", "type" -> "text", "name" -> "text",
      "start_date" -> "timestamp_ntz", "race_id" -> "integer",
      "end_date" -> "timestamp_ntz", "gmt_offset" -> "text", "path" -> "text"),
    "session_drivers" -> Seq("session_id" -> "integer",
      "driver_number" -> "text", "full_name" -> "text",
      "broadcast_name" -> "text", "tla" -> "text", "team_name" -> "text",
      "team_color" -> "text", "first_name" -> "text", "last_name" -> "text",
      "headshot_url" -> "text"),
    "driver_positions" -> Seq("session_id" -> "integer",
      "timestamp" -> "timestamp_ntz", "driver_number" -> "text",
      "position" -> "integer"),
    "car_telemetry" -> Seq("timestamp" -> "timestamp_ntz",
      "utc_timestamp" -> "timestamp_ntz", "session_id" -> "integer",
      "driver_number" -> "text", "rpm" -> "integer", "speed" -> "integer",
      "gear" -> "integer", "throttle" -> "numeric", "brake" -> "numeric",
      "drs" -> "integer"),
    // race_control / car_positions timestamps stay zone-aware — the
    // loader passes them through ("timestamp with time zone OK").
    "race_control_messages" -> Seq("session_id" -> "integer",
      "timestamp" -> "timestamp", "utc_time" -> "timestamp_ntz",
      "category" -> "text", "message" -> "text", "flag" -> "text",
      "scope" -> "text", "sector" -> "integer"),
    "car_positions" -> Seq("session_id" -> "integer",
      "timestamp" -> "timestamp", "utc_time" -> "timestamp_ntz",
      "driver_number" -> "text", "x_coord" -> "integer",
      "y_coord" -> "integer", "z_coord" -> "integer"),
    "weather_data" -> Seq("session_id" -> "integer",
      "timestamp" -> "timestamp_ntz", "air_temp" -> "numeric",
      "track_temp" -> "numeric", "humidity" -> "numeric",
      "pressure" -> "numeric", "wind_speed" -> "numeric",
      "wind_direction" -> "integer", "rainfall" -> "numeric"))
}
