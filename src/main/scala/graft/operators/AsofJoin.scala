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
  * Formulation: tag both sides, UNION, and carry the matched right row —
  * as ONE struct, so all carried columns come from the SAME right row
  * even when it holds nulls — with `last(_, ignoreNulls)` over a per-key
  * (ts, side) window. No join node at all: one shuffle on the keys, one
  * sort inside each partition, a single Window operator. This is the shape that scales: a
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
    val clash = outNames.map(_._2).toSet.intersect(leftCols.toSet + "asof_ts")
    require(clash.isEmpty,
      s"rightCols output names collide with left/output columns: $clash")

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
    // carry the matched right row as ONE struct: per-column
    // last(ignoreNulls) carries would mix columns from DIFFERENT right
    // rows whenever the most recent row holds a null (a chimera row with a
    // fresh asof_ts but a stale value, invisible to the tolerance guard)
    val rightRow = when(col("_side") === 0,
      struct(col("_ats").as("_rts") +:
        outNames.map { case (_, out) => col(s"_r_$out").as(out) }: _*))
    val carried = l2.unionByName(r2)
      .withColumn("_carry", last(rightRow, ignoreNulls = true).over(w))

    val matched = carried.filter(col("_side") === 1)
    val fresh = tolerance match {
      case Some(t) =>
        when(col("_carry").isNotNull &&
          (col("_ats") - col("_carry._rts")) <= t, col("_carry"))
      case None => col("_carry")
    }
    matched.withColumn("_carry", fresh).select(
      leftCols.map(col) ++ Seq(col("_carry._rts").as("asof_ts")) ++
        outNames.map { case (_, out) => col(s"_carry.$out").as(out) }: _*)
  }
}
