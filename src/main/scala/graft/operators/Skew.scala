package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hot-key skew mitigation for shuffled equi-joins.
  *
  * AQE's skew-join split handles most skew at runtime by splitting
  * oversized partitions — but it only helps when the skewed side's
  * partitions are splittable (sort-merge join, no bucketed requirement)
  * and the other side can be replicated per split. For the remaining
  * cases — or engines/configs without AQE — salting is the classic
  * manual fix: spread each hot key of the big side over `salts`
  * sub-keys, replicate the small side once per salt, join on
  * (key, salt). The shuffle then distributes a hot key across `salts`
  * reducers instead of one.
  *
  * Cost model: small side grows ×`salts` (it must still be
  * shuffle-affordable after replication); big side is untouched. Use
  * when the small side is too big to broadcast but far smaller than the
  * skewed fact.
  */
object Skew {

  /** Salted inner/left equi-join of `big` ⋈ `small` on `key`.
    *
    * Salt assignment on the big side is deterministic per row content
    * position (xxhash64 of a per-row id), so replays produce identical
    * partitioning. Every big row joins exactly the small-side replicas
    * carrying its own salt, so the result multiset equals the unsalted
    * join (asserted in SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts ($salts) must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"salting preserves multiplicity only for inner/left joins, got $joinType")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
