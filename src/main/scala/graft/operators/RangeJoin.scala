package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: left point rows matched to right interval rows
  * with `start <= pt <= end` within the same key group — the
  * point-in-interval join (event-in-window attribution, IP-in-range
  * lookup, time-validity joins).
  *
  * Spark plans a raw inequality join as broadcast-nested-loop (or a full
  * cartesian per key) — O(left × right) comparisons. The bucketed
  * formulation makes it an EQUI-join: each interval explodes into the
  * coarse buckets it covers, each point computes its single bucket, the
  * join key becomes (keys…, bucket), and the exact BETWEEN predicate
  * filters the bucket-collisions. Each (point, interval) pair meets
  * exactly once — an interval covers a point's bucket at most once — so
  * no post-join dedup is needed and multiset semantics match the naive
  * join.
  *
  * Cost model: intervals replicate into (length / bucketWidth + 1) rows.
  * Pick `bucketWidth` near the typical interval length: ~2× replication,
  * and each bucket's candidate set is local. Degenerate widths degrade
  * gracefully (too wide → more false candidates filtered by the BETWEEN;
  * too narrow → more interval replicas), never to a cross product. The
  * shuffle is a standard hash exchange on (keys, bucket), so AQE handles
  * skewed buckets.
  */
object RangeJoin {

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p2 = points.withColumn("_bucket", expr(s"$ptCol div $bucketWidth"))
    val i2 = intervals.withColumn("_bucket",
      explode(sequence(expr(s"$startCol div $bucketWidth"),
        expr(s"$endCol div $bucketWidth"))))
    p2.join(i2, keys :+ "_bucket")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bucket")
  }

  /** Interval×interval overlap join: left [lStart, lEnd] × right
    * [rStart, rEnd] pairs (inclusive bounds) that overlap —
    * `lStart <= rEnd AND rStart <= lEnd` — within the same key group
    * (time-validity joins, slowly-changing-dimension alignment, shift ×
    * incident overlap).
    *
    * Same bucket trick as [[pointInInterval]], exploding BOTH sides into
    * their covered buckets. An overlapping pair now meets in every bucket
    * both intervals cover, so exactly-once emission needs a dedup rule
    * that is a pure function of the pair: keep the meet only in the
    * bucket of the OVERLAP START, `max(lStart, rStart) div bucketWidth`.
    * That bucket is covered by both sides by construction (the overlap
    * start lies inside both intervals), so each overlapping pair is
    * emitted exactly once with no post-join dropDuplicates — multiset
    * parity with the naive inequality join, pinned against the DuckDB
    * BETWEEN oracle (x35) and TimeseriesOpsSpec.
    *
    * Cost model matches [[pointInInterval]] with both sides replicated
    * ×(length/bucketWidth + 1); pick `bucketWidth` near the typical
    * interval length. The join stays a hash equi-join on (keys…, bucket)
    * — never broadcast-nested-loop — and AQE splits hot buckets.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l2 = left.withColumn("_bucket",
      explode(sequence(expr(s"$lStart div $bucketWidth"),
        expr(s"$lEnd div $bucketWidth"))))
    val r2 = right.withColumn("_bucket",
      explode(sequence(expr(s"$rStart div $bucketWidth"),
        expr(s"$rEnd div $bucketWidth"))))
    l2.join(r2, keys :+ "_bucket")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bucket") ===
        expr(s"greatest($lStart, $rStart) div $bucketWidth"))
      .drop("_bucket")
  }
}
