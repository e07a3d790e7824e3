package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, unix_micros}
import org.apache.spark.sql.types.TimestampType

/** Loaders for the driver-generated star-schema testdata
  * (see TESTDATA.md / FIXTURES.md §B).
  *
  * Scale posture: every loader is a plain parquet scan — Catalyst pushes
  * filters/projections down to the scan, so callers should NOT cache or
  * materialize here. At 100 TB these tables would be directory-partitioned
  * (e.g. orders by o_orderdate month); the loaders take a directory so the
  * same code works against a partitioned layout.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark can
      // only read as raw nanos-since-epoch LongType via the legacy flag)
      // and as TIMESTAMP(MICROS) (which it reads natively as TIMESTAMP_NTZ,
      // where the flag is a no-op). Normalize BOTH shapes to the engine's
      // events contract — `ts` = epoch-nanos LongType — so every operator
      // and oracle conversion (`ts div 1000000` → epoch millis, matching
      // DuckDB's `epoch_ns(ts)//1000000`) is physical-type-independent.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      return raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => raw
        case _ =>
          // TIMESTAMP_NTZ (or TZ): session tz is pinned UTC at every entry
          // point, so the cast reads the naive value as the UTC instant —
          // the same convention DuckDB's epoch_ns applies to a naive ts
          raw.withColumn("ts",
            unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      }
    }
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `ts` column is LongType epoch-nanos (see note in [[load]]). */
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
