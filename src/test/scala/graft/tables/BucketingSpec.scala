package graft.tables

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located join layout: bucketed fact tables join WITHOUT an Exchange
  * on either side — the plan shape that makes q19's fact⋈fact affordable
  * when repeated at 100 TB.
  */
class BucketingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed fact-fact join: no shuffle Exchange on either side") {
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity"),
      "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
      "ord_bucketed", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Bucketing.read(spark, "li_bucketed")
      val ord = Bucketing.read(spark, "ord_bucketed")
      val joined = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      // the join itself must be exchange-free: buckets are co-located.
      // (the groupBy above the join still exchanges — that's its shuffle,
      // so count Exchanges: exactly one, and it must sit ABOVE the join)
      val exchanges = "Exchange".r.findAllMatchIn(plan).size
      assert(exchanges == 1, s"expected only the aggregation exchange:\n$plan")
      assert(plan.indexOf("Exchange") < plan.indexOf("SortMergeJoin"),
        s"the single Exchange must be the aggregation's, above the join:\n$plan")

      // and the result is right (same join computed unbucketed)
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
