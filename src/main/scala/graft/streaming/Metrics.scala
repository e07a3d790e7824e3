package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming observability (SURVEY §2.8 ST5 + A4): the reference's running
  * counters / per-batch timing / heartbeat reports
  * (/root/reference/main_supabase.py:17-56,157-185, main.py:305-316)
  * re-expressed as `df.observe` metrics + a `StreamingQueryListener`.
  *
  * The reference warns when a batch exceeds 5× the target interval
  * (main_supabase.py:184-185) — `lagWarnings` reproduces that from
  * `QueryProgressEvent` timing instead of wall-clock bookkeeping.
  */
class Metrics(batchIntervalMs: Long = 100) extends StreamingQueryListener {
  import Metrics.BatchReport

  private val reports = new ConcurrentLinkedQueue[BatchReport]()

  override def onQueryStarted(event: QueryStartedEvent): Unit = ()

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val processMs = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue()).getOrElse(0L)
    reports.add(BatchReport(
      Option(p.name).getOrElse(p.id.toString), p.batchId,
      p.numInputRows, processMs, processMs > 5 * batchIntervalMs))
  }

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def batchReports: Seq[BatchReport] = reports.asScala.toSeq

  /** A4 running totals: batches, rows, avg/max batch ms, lag count. */
  def summary: (Long, Long, Double, Long, Long) = {
    val rs = batchReports
    val n = rs.size.toLong
    val rows = rs.map(_.numInputRows).sum
    val avg = if (n == 0) 0.0 else rs.map(_.processMs).sum.toDouble / n
    val maxMs = if (n == 0) 0L else rs.map(_.processMs).max
    (n, rows, avg, maxMs, rs.count(_.lagged).toLong)
  }
}

object Metrics {

  final case class BatchReport(queryName: String, batchId: Long,
      numInputRows: Long, processMs: Long, lagged: Boolean)
  /** Attach observed per-batch metrics to an event frame (`df.observe`):
    * row count + corrupt-line count, readable from QueryProgress without a
    * second pass (the reference's "found vs inserted" counters, T13).
    */
  def observed(events: DataFrame): DataFrame =
    events.observe("f1_metrics",
      count(lit(1)).as("n_lines"),
      count(when(col("topic").isNull, 1)).as("n_corrupt"))
}
