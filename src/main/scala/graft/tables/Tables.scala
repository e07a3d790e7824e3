package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot represent
      // natively ([PARQUET_TYPE_ILLEGAL]); read it as raw nanos-since-epoch
      // LongType instead. All query outputs convert with `ts div 1000000`
      // (epoch millis) to stay comparable with the DuckDB oracle.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
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
