package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single most recent right row with
  * `right.ts <= left.ts` (inclusive) within the same key group — the
  * timeseries-alignment operator (sensor↔condition alignment, event
  * attribution, point-in-time feature lookup) that Spark has no built-in
  * for.
  *
  * Formulation: tag both sides, UNION, and carry each right column forward
  * with `last(_, ignoreNulls)` over a per-key (ts, side) window — no join
  * node at all. One shuffle on the keys, one sort inside each partition,
  * and every window column shares the same WindowSpec so Spark evaluates
  * them in a single Window operator. This is the shape that scales: a
  * per-row range join would rescan the right side per left row, and
  * Spark's own range-join fallback is a broadcast-nested-loop. AQE splits
  * skewed key groups; a key whose timeline is too hot for one partition
  * salts the same way any window does (SkewSpec's recipe).
  *
  * Ties: a right row at exactly left.ts matches (side orders right before
  * left). Right rows that share (key, ts) are resolved by `rightTieBreak`
  * (required for a deterministic result — pass the right side's unique
  * id).
  *
  * `tolerance`: with Some(t), matches older than `t` ts-units are nulled
  * (the "stale sensor reading" guard). Units are whatever the ts columns
  * hold — the engine's events tables carry epoch-nanos longs.
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Map[String, String],
      rightTieBreak: String, tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column " +
      "(a keyless global as-of puts the whole timeline in one partition; " +
      "add a coarse time-bucket key if the data is genuinely unkeyed)")
    require(rightCols.nonEmpty, "rightCols maps right column -> output name")
    val leftCols = left.columns.toSeq
    val outNames = rightCols.toSeq // (rightCol, outName) in stable order

    // aligned union schema: left's columns + _ats/_side/_tie + one _r_* slot
    // per carried right column
    val l2 = left.select(
      leftCols.map(col) ++
        Seq(col(leftTs).as("_ats"), lit(1).as("_side"),
          lit(null).cast(right.schema(rightTieBreak).dataType).as("_tie")) ++
        outNames.map { case (rc, out) =>
          lit(null).cast(right.schema(rc).dataType).as(s"_r_$out")
        }: _*)
    val r2 = right.select(
      leftCols.map(c =>
        if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("_ats"), lit(0).as("_side"),
          col(rightTieBreak).as("_tie")) ++
        outNames.map { case (rc, out) => col(rc).as(s"_r_$out") }: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ats"), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = outNames.foldLeft(
      l2.unionByName(r2)
        .withColumn("_asof_ts",
          last(when(col("_side") === 0, col("_ats")), ignoreNulls = true).over(w))) {
      case (df, (_, out)) =>
        df.withColumn(out, last(col(s"_r_$out"), ignoreNulls = true).over(w))
    }

    val matched = carried.filter(col("_side") === 1)
    val bounded = tolerance match {
      case Some(t) =>
        val stale = col("_asof_ts").isNull || (col("_ats") - col("_asof_ts")) > t
        outNames.foldLeft(
          matched.withColumn("_asof_ts",
            when(stale, lit(null)).otherwise(col("_asof_ts")))) {
          case (df, (rc, out)) =>
            df.withColumn(out, when(stale,
              lit(null).cast(right.schema(rc).dataType)).otherwise(col(out)))
        }
      case None => matched
    }
    bounded.select(
      leftCols.map(col) ++ Seq(col("_asof_ts").as("asof_ts")) ++
        outNames.map { case (_, out) => col(out) }: _*)
  }
}
