package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.tables.Tables

/** One named query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver hash-compares against.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  // Some(null) is representable and has shipped (an object-init-order bug
  // captured a not-yet-initialized val and emptied a whole round's
  // correctness artifact) — fail at construction, not in the verifier.
  require(oracle.forall(s => s != null && s.nonEmpty),
    s"query $name declares a null/empty oracle — declare the SQL before " +
      "`val all`, or make it lazy")
}

/** SURVEY.md §2.10 declared query inventory (Q1–Q18) — the t2 correctness
  * contract. Each query exercises one reference operator family (citations
  * inline); the Spark side and the DuckDB oracle are written to be
  * bit-deterministic against each other:
  *
  *  - timestamps are emitted as BIGINT epoch-millis (`ts div 1000000` on the
  *    nanos long / `epoch_ns(..)//1000000` or `epoch_ms(..)` in DuckDB) —
  *    never as raw timestamp values, whose physical precision differs
  *    between engines (ns vs µs);
  *  - double aggregations route through exact DECIMAL sums and convert to
  *    DOUBLE only at the end (IEEE ops on identical inputs are exactly
  *    rounded, hence engine-independent; FP *accumulation order* is not);
  *  - every ordered output has a unique-key tiebreaker so row order is
  *    total.
  *
  * Scale posture (local[32] today, 1000 executors tomorrow): queries are
  * single-pass scans with at most one shuffle (the groupBy/window key) and
  * broadcast dimension joins — except q19, which joins fact to fact and
  * deliberately takes the shuffle join + aggregation exchange (the correct
  * plan at scale). Filters/projections reach the parquet scan (verified via
  * explain in QueriesPlanSpec).
  */
object CoreQueries {

  private val NanosPerMin = 60L * 1000L * 1000L * 1000L

  /** Exact sum of a 2-decimal double column, returned as DOUBLE.
    * Summing via DECIMAL is associative (engine/partitioning independent),
    * unlike naive double summation.
    */
  private def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  val all: Seq[Q] = Seq(

    // Q1 — topic filter + count (T1/A5; dashboard.py:59-62 semantics).
    Q("q01_filter_count",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type") === "click")
        .agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM events WHERE event_type = 'click'")),

    // Q2 — projection + numeric cast (T12/P7; transformer.py:384-420).
    // Rounds through DECIMAL(10,2) for the exact 2-decimal semantics, but
    // emits DOUBLE per the repo determinism rule above: raw DECIMAL output
    // canonicalizes differently across engines (the round-1 driver hashed
    // it unequal even though DuckDB-reads-both-sides agreed).
    Q("q02_project_cast",
      (s, d) => Tables.events(s, d)
        .filter(col("value").isNotNull)
        .select(col("event_id"),
          col("value").cast(DecimalType(10, 2)).cast("double").as("v"))
        .orderBy("event_id")
        .limit(100),
      Some("SELECT event_id, CAST(CAST(value AS DECIMAL(10,2)) AS DOUBLE) AS v FROM events " +
        "WHERE value IS NOT NULL ORDER BY event_id LIMIT 100")),

    // Q3 — time-window filter, last 5 minutes relative to max(ts)
    // (A6; dashboard.py:65-68). The scalar max is a broadcast cross join —
    // no driver-side collect, stays a two-stage distributed plan.
    Q("q03_time_window_count",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.crossJoin(broadcast(ev.agg(max(col("ts")).as("max_ts"))))
          .filter(col("ts") > col("max_ts") - lit(5L * NanosPerMin))
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT count(*) AS n FROM events " +
        "WHERE ts > (SELECT max(ts) FROM events) - INTERVAL 5 MINUTE")),

    // Q4 — max/min timestamp probe (A7; dashboard.py:71-74).
    Q("q04_minmax_ts",
      (s, d) => Tables.events(s, d).agg(
        expr("max(ts) div 1000000").as("max_ts_ms"),
        expr("min(ts) div 1000000").as("min_ts_ms"),
        count(lit(1)).as("n")),
      Some("SELECT epoch_ns(max(ts))//1000000 AS max_ts_ms, " +
        "epoch_ns(min(ts))//1000000 AS min_ts_ms, count(*) AS n FROM events")),

    // Q5 — LEFT OUTER equi-join, small dim broadcast (J1; dashboard.py:103-108).
    Q("q05_left_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
          .select(col("c_custkey"), col("n_name"))
          .orderBy("c_custkey")
          .limit(100)
      },
      Some("SELECT c_custkey, n_name FROM customer c " +
        "LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "ORDER BY c_custkey LIMIT 100")),

    // Q6 — point lookup by key (J2; main.py:106-112). Predicate pushes to
    // the parquet scan (row-group skip via min/max stats at scale).
    Q("q06_point_lookup",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderkey") === 42L)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"),
          // o_orderdate is TIMESTAMP_NTZ; session tz is pinned UTC, so the
          // LTZ cast is the identity mapping DuckDB's epoch_ms applies.
          unix_millis(col("o_orderdate").cast("timestamp")).as("o_orderdate_ms"),
          col("o_orderpriority")),
      Some("SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
        "epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority " +
        "FROM orders WHERE o_orderkey = 42")),

    // Q7 — membership semi-join / isin (J3; supabase_loader.py:56-62).
    Q("q07_semi_membership",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .agg(count(lit(1)).as("n")),
      Some("SELECT count(*) AS n FROM customer " +
        "WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE')")),

    // Q8 — set difference (J4; supabase_loader.py:68).
    Q("q08_set_difference",
      (s, d) => Tables.nation(s, d).select(col("n_nationkey"))
        .except(Tables.customer(s, d).select(col("c_nationkey").as("n_nationkey")))
        .orderBy("n_nationkey"),
      Some("SELECT n_nationkey FROM nation " +
        "EXCEPT SELECT c_nationkey FROM customer ORDER BY 1")),

    // Q9 — first-wins dedup with deterministic arrival order
    // (A1; transformer.py:79-90 — the reference's seen-set semantics).
    Q("q09_dedup_first_wins",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"))
          .orderBy("user_id")
      },
      Some("SELECT user_id, event_type FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
        "FROM events) t WHERE rn = 1 ORDER BY user_id")),

    // Q10 — last-non-null consolidation per key (A3/U3; loader.py:267-273
    // COALESCE-merge semantics, the reference's lap upsert).
    Q("q10_last_non_null",
      (s, d) => {
        val frame = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val latest = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("last_value", last(col("value"), ignoreNulls = true).over(frame))
          .withColumn("rn", row_number().over(latest))
          .filter(col("rn") === 1)
          .select(col("user_id"), expr("ts div 1000000").as("last_ts_ms"), col("last_value"))
          .orderBy("user_id")
      },
      Some("SELECT user_id, epoch_ns(ts)//1000000 AS last_ts_ms, lv AS last_value FROM (" +
        "SELECT user_id, ts, " +
        "LAST_VALUE(value IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
        "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv, " +
        "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events) t WHERE rn = 1 ORDER BY user_id")),

    // Q11 — dedup-by-id count (A2; monitor_race_control.py:124-149).
    Q("q11_count_distinct_ids",
      (s, d) => Tables.events(s, d)
        .agg(countDistinct(col("event_id")).as("n")),
      Some("SELECT count(DISTINCT event_id) AS n FROM events")),

    // Q12 — distinct-driver style grouped distinct count (A8;
    // monitor_car_telemetry.py:163-170).
    Q("q12_distinct_by_type",
      (s, d) => Tables.events(s, d)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n"))
        .orderBy("event_type"),
      Some("SELECT event_type, count(DISTINCT user_id) AS n FROM events " +
        "GROUP BY event_type ORDER BY event_type")),

    // Q13 — group aggregation, the lap-consolidation shape (T4/T6).
    Q("q13_group_agg",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(exactSum(col("l_quantity")).as("sum_qty"),
          max(col("l_extendedprice")).as("max_price"))
        .orderBy("l_orderkey")
        .limit(100),
      Some("SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "max(l_extendedprice) AS max_price FROM lineitem " +
        "GROUP BY l_orderkey ORDER BY l_orderkey LIMIT 100")),

    // Q14 — multi-agg running stats (A4; main_supabase.py:17-56). avg is
    // derived as exact-sum / count so both engines divide identical doubles.
    Q("q14_multi_agg_stats",
      (s, d) => Tables.orders(s, d)
        .agg(count(lit(1)).as("n"),
          exactSum(col("o_totalprice")).as("sum_price"),
          max(col("o_totalprice")).as("max_price"))
        .withColumn("avg_price", col("sum_price") / col("n"))
        .select("n", "sum_price", "avg_price", "max_price"),
      Some("SELECT n, sum_price, sum_price / n AS avg_price, max_price FROM (" +
        "SELECT count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price, " +
        "max(o_totalprice) AS max_price FROM orders) t")),

    // Q15 — global top-k (J5 sort; TakeOrderedAndProject physically — no
    // full sort shuffle at scale, each partition keeps k then the driver
    // merges).
    Q("q15_topk",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"))
        .limit(20),
      Some("SELECT o_orderkey FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20")),

    // Q16 — regex field extraction + safe numeric coercion (P6/P7 shape;
    // transformer.py:434-456, :458-466).
    Q("q16_regex_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          expr("try_cast(regexp_extract(props, '\"k\":\\\\s*(\\\\d+)', 1) AS BIGINT)").as("k"))
        .orderBy("event_id")
        .limit(100),
      Some("SELECT event_id, TRY_CAST(regexp_extract(props, '\"k\":\\s*(\\d+)', 1) AS BIGINT) AS k " +
        "FROM events ORDER BY event_id LIMIT 100")),

    // Q17 — last-wins upsert compaction per key (U1; supabase_loader.py:182-204).
    Q("q17_upsert_last_wins",
      (s, d) => {
        val latest = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(latest))
          .filter(col("rn") === 1)
          .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
            expr("ts div 1000000").as("ts_ms"))
          .orderBy("user_id")
      },
      Some("SELECT user_id, event_id, event_type, value, epoch_ns(ts)//1000000 AS ts_ms FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events) t WHERE rn = 1 ORDER BY user_id")),

    // Q19 — fact×fact join + grouped exact-decimal revenue (the flagship
    // entry() shape, oracle-checked; per-row double product is IEEE-exact
    // identical on both engines, the 4-decimal cast pins it, the decimal
    // sum is order-independent). At scale: shuffle join on the fact key —
    // the correct plan; AQE handles skew.
    Q("q19_join_agg_revenue",
      (s, d) => {
        val o = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        o.join(li, o("o_orderkey") === li("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4))).cast("double").as("revenue"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("SELECT o_orderpriority, " +
        "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue, " +
        "count(*) AS n FROM orders JOIN lineitem ON o_orderkey = l_orderkey " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")),

    // Q20 — EXISTS correlated-subquery semantics as a left-semi join
    // (J3's heavier sibling; the reference's per-key existence probes J2
    // batched into one set-membership pass).
    Q("q20_exists_semi",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n"))
      },
      Some("SELECT count(*) AS n FROM customer c WHERE EXISTS (" +
        "SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey " +
        "AND o.o_totalprice > 400000)"))
  )
}
