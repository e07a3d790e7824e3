package graft.catalog

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the ANALYZE-style data-quality pass that complements
  * [[SchemaVerify]] (schema says what SHOULD be there; the profile says
  * what IS): per column, null count, distinct count, and min/max rendered
  * as strings so every column type shares one output schema.
  *
  * Shape: ONE aggregation pass computes all four statistics for every
  * column (partial-aggregated map-side), then a driver-free unpivot
  * (explode over an array of structs) emits one row per column. Exact
  * `countDistinct` over multiple columns expands the input (one copy per
  * distinct aggregate) — fine at profile-sized tables and what the oracle
  * can reproduce; at 100 TB swap in `approx_count_distinct` (or the x32
  * HLL sketches) and the pass stays single-scan with no expand. Min/max
  * string rendering uses Spark's binary string ordering, which matches
  * the oracle engine's default collation.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"__${c}_nulls"),
        countDistinct(col(c)).as(s"__${c}_distinct"),
        min(col(c)).cast("string").as(s"__${c}_min"),
        max(col(c)).cast("string").as(s"__${c}_max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val perCol = cols.map { c =>
      struct(lit(c).as("column"),
        col(s"__${c}_nulls").as("n_nulls"),
        col(s"__${c}_distinct").as("n_distinct"),
        col(s"__${c}_min").as("min_value"),
        col(s"__${c}_max").as("max_value"))
    }
    one.select(explode(array(perCol: _*)).as("p")).select("p.*")
  }
}
