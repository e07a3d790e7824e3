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
    * The salt is a hash of the big row's CONTENT, not of a positional id
    * like `monotonically_increasing_id`: positional salts change when a
    * stage retry recomputes a partition in a different order, and a salt
    * that changes under recomputation is a join key that changes under
    * recomputation — the SPARK-23207 class of silent row loss or
    * duplication. Content-hashing is retry-stable; its one tradeoff is
    * that byte-identical duplicate rows of a hot key share a salt, which
    * only matters for degenerate all-duplicate corpora.
    *
    * Every big row joins exactly the small-side replicas carrying its own
    * salt, so the result multiset equals the unsalted join (asserted in
    * SkewSpec).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts ($salts) must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"salting preserves multiplicity only for inner/left joins, got $joinType")
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** [[saltedJoin]] with the salt count chosen from PERSISTED table stats
    * ([[graft.catalog.Profile.saveStats]] with `key` in its freqCols) —
    * the cost-based hook: salts = ceil(hottest key's row count /
    * `targetRowsPerSalt`), clamped to [1, `maxSalts`]. A table whose
    * hottest key already fits one reducer's budget joins UNSALTED
    * (salts = 1 — zero replication cost); missing stats (or stats
    * without `top_freq` for the key) also fall back to unsalted, the
    * honest default when nothing is known.
    */
  def saltedJoinAuto(big: DataFrame, small: DataFrame, key: String,
      statsPath: String, targetRowsPerSalt: Long = 1000000L,
      maxSalts: Int = 64, joinType: String = "inner"): DataFrame = {
    require(targetRowsPerSalt >= 1, "targetRowsPerSalt must be >= 1")
    val salts = saltsFromStats(big.sparkSession, statsPath, key,
      targetRowsPerSalt, maxSalts)
    saltedJoin(big, small, key, salts, joinType)
  }

  /** The salt-count decision alone (driver-side, reads only the tiny
    * stats table): exposed so plans can log/assert what the stats imply.
    */
  def saltsFromStats(spark: org.apache.spark.sql.SparkSession,
      statsPath: String, key: String, targetRowsPerSalt: Long,
      maxSalts: Int): Int =
    graft.catalog.Profile.loadStats(spark, statsPath)
      .flatMap { st =>
        st.filter(col("column") === key).collect().headOption
          .flatMap(r => Option(r.getAs[java.lang.Long]("top_freq")))
      }
      .map(f => math.min(maxSalts.toLong,
        math.max(1L, (f + targetRowsPerSalt - 1) / targetRowsPerSalt)).toInt)
      .getOrElse(1)

  /** Stats-driven broadcast-or-shuffle equi-join — the other cost-based
    * decision persisted stats unlock: when `small`'s stored `n_rows` is
    * under `broadcastRows`, hint `broadcast(small)` (no shuffle of the
    * big side at all); otherwise fall through to [[saltedJoinAuto]]'s
    * salt decision for the shuffled join. Missing stats choose the
    * shuffled path unsalted — the safe default (a wrong broadcast OOMs
    * executors; a wrong shuffle is merely slower).
    */
  def statsJoin(big: DataFrame, small: DataFrame, key: String,
      smallStatsPath: String, bigStatsPath: String,
      broadcastRows: Long = 10000000L, targetRowsPerSalt: Long = 1000000L,
      maxSalts: Int = 64, joinType: String = "inner"): DataFrame = {
    val spark = big.sparkSession
    val smallRows = graft.catalog.Profile.loadStats(spark, smallStatsPath)
      .flatMap(_.select("n_rows").collect().headOption
        .flatMap(r => Option(r.getAs[java.lang.Long]("n_rows"))))
    if (smallRows.exists(_ <= broadcastRows))
      big.join(broadcast(small), Seq(key), joinType)
    else saltedJoinAuto(big, small, key, bigStatsPath,
      targetRowsPerSalt, maxSalts, joinType)
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) of an item column,
    * built as ONE partial-aggregated exchange: each item explodes into
    * `depth` (row, col) cells — col = xxhash64(item, row) mod `width`,
    * the row index doubling as the per-row hash seed — and the groupBy
    * map-side-combines, so the exchange carries at most depth×width
    * rows PER PARTITION regardless of corpus size. The sketch IS the
    * (r, c, n) cell table (≤ depth×width rows, model-sized,
    * broadcastable), and cell-wise addition of two sketches is the
    * paper's merge — which is exactly what the partial aggregation
    * already does across partitions, so the sketch is
    * executor-count-invariant by construction (integer adds commute;
    * spec-pinned under repartition).
    *
    * Where HLL (x32) answers "how many DISTINCT" and approx_percentile
    * (x33) answers "what quantile", count-min answers "how often is
    * ITEM x" in bounded memory with a one-sided guarantee:
    * est ≥ true always, est ≤ true + εN with ε = e/width at the
    * standard depth ≈ ln(1/δ). The monitoring fit is token/key
    * frequency over streams where the exact vocabulary-sized groupBy
    * is the thing you cannot afford.
    */
  /** A built count-min sketch: the cell table PLUS the (depth, width)
    * it was hashed with. The params ride the model so an estimate can
    * never probe with a different modulus than the build — a silent
    * mismatch would produce UNDER-estimates from the operator whose
    * headline contract is est ≥ true.
    */
  final case class CmSketch(cells: DataFrame, depth: Int, width: Int)

  // sketch-internal names are _cm_-prefixed (round-11 advisor): an
  // itemCol named plain "r"/"c"/"n"/"cell" used to hit ambiguous-
  // reference analysis errors (or silent mis-resolution) in the probe
  // join/groupBy below
  private def cmCells(itemCol: String, depth: Int, width: Int) =
    explode(array((0 until depth).map(r =>
      struct(lit(r).as("_cm_r"),
        pmod(xxhash64(col(itemCol), lit(r)), lit(width.toLong))
          .cast("int").as("_cm_c"))): _*)).as("_cm_cell")

  def countMin(df: DataFrame, itemCol: String, depth: Int = 4,
      width: Int = 1024): CmSketch = {
    require(depth >= 1 && depth <= 16, s"depth ($depth) must be in [1, 16]")
    require(width >= 2, s"width ($width) must be >= 2")
    CmSketch(df.select(cmCells(itemCol, depth, width))
      .groupBy(col("_cm_cell._cm_r").as("r"), col("_cm_cell._cm_c").as("c"))
      .agg(count(lit(1)).as("n")), depth, width)
  }

  /** Point-frequency estimates for `items` under a built sketch:
    * min over the item's `depth` cells (absent cell = 0 — the item was
    * never seen on that row). The sketch broadcasts (≤ depth×width
    * rows); the probe is one broadcast join + one bounded groupBy, so
    * estimating any batch of items never touches the original corpus.
    * Hash params come from the sketch itself — mismatch impossible.
    * Output: (itemCol, est_n).
    */
  def countMinEstimate(sketch: CmSketch, items: DataFrame,
      itemCol: String): DataFrame = {
    // the cells side renames onto the same _cm_ prefix before the join,
    // so an itemCol named "r"/"c"/"n" can never collide with the
    // sketch's public (r, c, n) schema
    require(!itemCol.startsWith("_cm_"),
      s"itemCol ($itemCol) collides with the sketch-internal _cm_ prefix")
    val cells = sketch.cells.select(col("r").as("_cm_sr"),
      col("c").as("_cm_sc"), col("n").as("_cm_sn"))
    items.select(col(itemCol), cmCells(itemCol, sketch.depth, sketch.width))
      .join(broadcast(cells),
        col("_cm_cell._cm_r") === col("_cm_sr") &&
          col("_cm_cell._cm_c") === col("_cm_sc"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("_cm_sn"), lit(0L))).as("est_n"))
  }
}
