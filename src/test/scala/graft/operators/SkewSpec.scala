package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted-join semantics: result parity with the unsalted join, and the
  * hot key actually spreads over the salt space.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 90% on one hot key — the shape that serializes a shuffle
  private lazy val big = spark.range(10000)
    .select((when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))).as("k"),
      col("id").as("payload"))
  private lazy val small = Seq((1L, "hot"), (10L, "a"), (20L, "b"), (30L, "c"))
    .toDF("k", "v")

  test("salted join equals the plain join (inner and left)") {
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(small, Seq("k"), jt)
        .select("k", "payload", "v").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val salted = Skew.saltedJoin(big, small, "k", salts = 8, joinType = jt)
        .select("k", "payload", "v").collect()
        .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      assert(salted == plain, s"$jt join multiset mismatch")
    }
  }

  test("hot key spreads across the salt space (content-hash salt)") {
    val saltsUsed = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(8L)))
      .filter(col("k") === 1L)
      .select(countDistinct(col("_salt"))).collect().head.getLong(0)
    assert(saltsUsed == 8L, s"hot key only used $saltsUsed of 8 salts")
  }
}
