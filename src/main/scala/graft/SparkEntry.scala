package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.{CoreQueries, ExtensionQueries, F1Queries, Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY §2.10 core queries plus
  * F1-pipeline and training-data extension operators as they land); every
  * SQL-expressible entry has a matching DuckDB oracle in `oracleSql` with
  * column names aligned on both sides.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    CoreQueries.all ++ F1Queries.all ++ ExtensionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue per nation: broadcast dims, one shuffle (groupBy n_name) —
    * the canonical scan→join→agg shape the engine is built around.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val li = graft.tables.Tables.lineitem(spark, d)
    val o = graft.tables.Tables.orders(spark, d)
    val c = graft.tables.Tables.customer(spark, d)
    val n = graft.tables.Tables.nation(spark, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (those
    * get the driver's weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
