package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive events of the same key belong to
  * one session while the gap between neighbors is ≤ `maxGap`; a larger gap
  * starts the next session. The standard clickstream/telemetry windowing
  * op (the reference's dashboards count "recent activity" windows; this is
  * the general form).
  *
  * Shape: one shuffle on the keys, one sort, two window passes over the
  * SAME window spec (lag → boundary flag, cumulative sum → session index),
  * which Spark folds into a single Window operator. Session ids are
  * per-key ordinals (1-based, in time order) — deterministic given a
  * `tieBreak` column for equal timestamps, and reproducible in any engine
  * (the oracle recomputes lag+sum verbatim in SQL).
  *
  * At 100 TB this is the scalable formulation: no self-join, no
  * state-store; a key's whole timeline sorts within its partition (AQE
  * splits skew; a genuinely monstrous key salts by coarse time bucket
  * first, accepting split sessions at salt boundaries). The
  * streaming-native equivalent is `session_window` aggregation — batch
  * backfill and streaming then share semantics.
  */
object Sessionize {

  def sessionize(events: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: String, maxGap: Long): DataFrame = {
    require(keys.nonEmpty, "sessionize needs at least one key column")
    val order = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(tieBreak))
    val newSession = when(
      lag(col(tsCol), 1).over(order).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(order) > maxGap, 1).otherwise(0)
    events.withColumn("session_seq",
      sum(newSession).over(order.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
  }

  /** Per-session rollup: bounds, event count, value sum — the session
    * table a dashboard reads. One extra shuffle on (keys, session_seq)
    * with partial aggregation.
    */
  def sessionStats(events: DataFrame, keys: Seq[String], tsCol: String,
      tieBreak: String, maxGap: Long, valueCol: Option[String] = None): DataFrame = {
    val base = sessionize(events, keys, tsCol, tieBreak, maxGap)
      .groupBy((keys :+ "session_seq").map(col): _*)
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end")) ++
      valueCol.map(v => sum(col(v)).as("sum_value"))
    base.agg(aggs.head, aggs.tail: _*)
  }
}
