package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-grid resample with last-observation-carried-forward (LOCF) —
  * the timeseries gap-fill/downsample operator (align irregular sensor
  * events onto a regular grid for feature windows or charting).
  *
  * Per key: a grid from `floor(min(ts) / step) * step` to `max(ts)` at
  * `step` spacing, each grid point carrying the value of the most recent
  * event at `ts <= grid_ts` (ties on ts resolved by `tieBreak`, the
  * event's unique id). Grid points before the first event stay null.
  *
  * Formulation: one aggregation pass builds the per-key grid (bounds
  * only — the grid rows themselves explode from a `sequence()`, never a
  * driver loop), then the grid joins the events through
  * [[AsofJoin.asofJoin]] — union + per-key window, no join node, one
  * shuffle on the key. Grid size is data-bounded (span/step per key) and
  * never materialized on the driver. `ts` units are whatever the column
  * holds; the engine's events tables carry epoch-nanos longs.
  *
  * No reference analogue (its dashboards re-aggregate raw rows per
  * refresh — `/root/reference/dashboard.py`); SURVEY §2.11 timeseries
  * family.
  */
object Resample {

  /** Output: key, `grid_ts`, `asof_ts` (ts of the carried event, null at
    * leading gap), carried `valueCol`, and `src_<tieBreak>` (id of the
    * carried event — the provenance column that makes the result
    * deterministic and auditable).
    */
  def resampleLocf(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, step: Long, tieBreak: String): DataFrame = {
    require(step > 0, "grid step must be positive")
    val grid = events.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("__min_ts"), max(col(tsCol)).as("__max_ts"))
      .select(col(keyCol), explode(sequence(
        expr(s"__min_ts div $step * $step"),
        col("__max_ts"), lit(step))).as("grid_ts"))
    AsofJoin.asofJoin(grid,
      events.select(col(keyCol), col(tsCol), col(valueCol), col(tieBreak)),
      Seq(keyCol), "grid_ts", tsCol,
      Map(valueCol -> valueCol, tieBreak -> s"src_$tieBreak"),
      rightTieBreak = tieBreak)
  }
}
