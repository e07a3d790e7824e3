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

  /** Bloom-filter membership sketch (Bloom 1970) in relational form: the
    * filter IS the distinct set of set-bit positions — each key lights
    * `k` positions, position_i = xxhash64(key, i) mod `mBits` — built as
    * one explode + partial-aggregated distinct, so the exchange carries
    * at most min(k·n, mBits) position rows total regardless of corpus
    * size, and the sketch persists/reuses as a plain table (THE point vs
    * re-shuffling the seen corpus's keys on every increment). Guarantee:
    * a key whose k positions are all set is MAYBE present (false
    * positives at rate ≈ (1 − e^(−k·n/m))^k); any missing position means
    * DEFINITELY absent — zero false negatives, which is what lets a
    * prefilter preserve exact semantics ([[bloomNewIds]]).
    *
    * Representation note: one row per set bit costs ~8 bytes where a
    * packed bitmap costs 1 bit, but it stays declarative (distinct is
    * map-side-combined, AQE-splittable, mergeable by union+distinct) and
    * at the design point — mBits sized for single-digit-% FP — the
    * sketch is orders of magnitude under the key set it summarizes.
    * Completes the sketch family: HLL = how many distinct (x32),
    * quantile sketch = what value at rank (x33), count-min = how often
    * (x66), Bloom = have I seen THIS (x74).
    */
  final case class BloomSketch(bits: DataFrame, mBits: Long, k: Int)

  // _bf_-prefixed internals for the same reason as _cm_ above
  private def bfPositions(keyCol: String, mBits: Long, k: Int) =
    explode(array((0 until k).map(i =>
      pmod(xxhash64(col(keyCol), lit(i)), lit(mBits))): _*)).as("_bf_pos")

  def bloomBuild(df: DataFrame, keyCol: String, mBits: Long = 1L << 22,
      k: Int = 5): BloomSketch = {
    require(mBits >= 64, s"mBits ($mBits) must be >= 64")
    require(k >= 1 && k <= 16, s"k ($k) must be in [1, 16]")
    require(!keyCol.startsWith("_bf_"),
      s"keyCol ($keyCol) collides with the sketch-internal _bf_ prefix")
    BloomSketch(df.select(bfPositions(keyCol, mBits, k))
      .distinct().toDF("pos"), mBits, k)
  }

  /** Membership verdicts for `items` under a built sketch:
    * `bloom_maybe` = ALL of the row's probed positions are set (absent
    * position row = bit unset). Output: one row per DISTINCT
    * (idCol, keyCol) probe — the verdict depends only on the key, so
    * duplicate input rows collapse rather than each carrying a copy.
    * The probe frame is deduplicated before the hit count precisely so
    * duplicates (and the rare within-key position collision, where two
    * of the k hashes land on the same bit) can never inflate the
    * denominator into a false NEGATIVE: the test is "every distinct
    * probed position hit", not "hit count == k".
    * Hash params come from the sketch itself — probing with a different
    * modulus than the build would forfeit the no-false-negative
    * contract, so the mismatch is made impossible. The bits side
    * broadcasts when it fits (AQE's call); the probe never touches the
    * corpus the sketch was built from.
    */
  def bloomMaybe(sketch: BloomSketch, items: DataFrame, idCol: String,
      keyCol: String): DataFrame = {
    require(!idCol.startsWith("_bf_") && !keyCol.startsWith("_bf_"),
      s"column ($idCol, $keyCol) collides with the sketch-internal _bf_ prefix")
    val bits = sketch.bits.select(col("pos").as("_bf_setpos"),
      lit(true).as("_bf_hit"))
    items.select(col(idCol), col(keyCol),
        bfPositions(keyCol, sketch.mBits, sketch.k))
      .dropDuplicates(idCol, keyCol, "_bf_pos")
      .join(bits, col("_bf_pos") === col("_bf_setpos"), "left")
      .groupBy(col(idCol), col(keyCol))
      .agg((count(col("_bf_hit")) === count(lit(1))).as("bloom_maybe"))
  }

  /** Bloom-prefiltered incremental new-key detection with EXACT
    * semantics — the 100 TB ingest-dedup shape: is each increment row's
    * key already in the seen corpus?
    *
    * The naive exact form anti-joins the increment against ALL seen
    * keys — a full-corpus shuffle per increment. Here the corpus is
    * summarized ONCE into a [[BloomSketch]] (reusable across
    * increments); rows the sketch rules out are new with NO exact check
    * (no false negatives), and only the `bloom_maybe` candidates — true
    * duplicates plus the FP-rate sliver, tiny when increments are mostly
    * novel — reach the exact confirmation. That confirmation runs in the
    * scan-stays-put direction (the round-12 ingest-anti-join finding):
    * the seen corpus is SEMI-JOINED against the broadcast candidate-key
    * set — one map-side-filtered scan emitting at most |candidates|
    * keys — and the surviving keys broadcast back onto the verdicts. No
    * step shuffles the corpus; both broadcasts are candidate-bounded.
    *
    * Output: (idCol, keyCol, bloom_maybe, is_new), one row per DISTINCT
    * (id, key) in the increment ([[bloomMaybe]]'s collapse) — `is_new`
    * exact by construction (spec-pinned against the plain anti-join,
    * including under a deliberately undersized, FP-dense sketch).
    */
  def bloomNewIds(seen: DataFrame, increment: DataFrame, idCol: String,
      keyCol: String, mBits: Long = 1L << 22, k: Int = 5): DataFrame =
    bloomNewIdsWith(bloomBuild(seen.select(col(keyCol)), keyCol, mBits, k),
      seen, increment, idCol, keyCol)

  /** [[bloomNewIds]] against a PREBUILT (typically persisted — see
    * [[bloomLoad]]) sketch: the deployment shape where the corpus
    * summary is paid once and every increment pays only probe+confirm.
    * `seen` still backs the exact confirmation of `bloom_maybe`
    * candidates; the sketch only prunes.
    */
  def bloomNewIdsWith(sketch: BloomSketch, seen: DataFrame,
      increment: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val probed = bloomMaybe(sketch, increment, idCol, keyCol)
    val candidates = probed.filter(col("bloom_maybe"))
      .select(col(keyCol)).distinct()
    val confirmed = seen.select(col(keyCol))
      .join(broadcast(candidates), Seq(keyCol), "left_semi")
      .distinct().withColumn("_bf_dup", lit(true))
    probed.join(broadcast(confirmed), Seq(keyCol), "left")
      .select(col(idCol), col(keyCol), col("bloom_maybe"),
        not(coalesce(col("_bf_dup"), lit(false))).as("is_new"))
  }

  /** Misra–Gries heavy-hitter candidates over an item column: ONE
    * bounded-state aggregation ([[graft.functions.MisraGriesAgg]] — the
    * exchange carries one ≤`k`-entry summary per partition, a few KB,
    * never the vocabulary) exploded back to rows. Answers the frequency
    * question count-min (x66) cannot: count-min estimates items you
    * already hold; this SURFACES the heavy items. Guarantee: every item
    * with true count > n/(k+1) appears; estimates are one-sided
    * (est ≤ true ≤ est + n/(k+1)). Summary membership below the
    * threshold — and the estimates themselves — are partition-order-
    * dependent (inherent to MG), so gate-stable pipelines go through
    * [[heavyHittersExact]]. Output: (item, est), est desc.
    */
  def heavyHitters(df: DataFrame, itemCol: String, k: Int): DataFrame =
    df.agg(graft.functions.MisraGries.mg_topk(col(itemCol), k).as("_mg"))
      .select(explode(col("_mg")).as("_e"))
      .select(col("_e.item").as("item"), col("_e.est").as("est"))

  /** EXACT heavy hitters through the MG prefilter — the 100 TB "what
    * are my frequent items" shape with deterministic output (the
    * [[bloomNewIds]] posture: the sketch changes the plan, never the
    * answer). Items with frequency > `phi`·n are found by (1) one
    * bounded-state MG pass with capacity k = ceil(1/phi) — whose
    * containment guarantee (> n/(k+1) ⇒ present, and n/(k+1) ≤ phi·n)
    * makes the ≤k candidates a SUPERSET of every true heavy hitter
    * regardless of partitioning — then (2) one exact count of the
    * candidate-filtered stream: a map-side `isin` filter against the
    * ≤k-item broadcast list, so the confirming groupBy aggregates a
    * k-item-vocabulary stream, never the full one. No step shuffles
    * more than k·partitions rows. Output: (item, n, frac) for items
    * with n > phi·total, frac rounded to 6 — deterministic, LIVE-
    * oracle-checkable against the plain GROUP BY/HAVING it replaces.
    */
  def heavyHittersExact(df: DataFrame, itemCol: String,
      phi: Double): DataFrame = {
    require(phi > 0 && phi < 1, s"phi ($phi) must be in (0, 1)")
    val k = math.ceil(1.0 / phi).toInt
    // phi as an exact rational (shortest-decimal of the double, reduced)
    // so the threshold test is pure integer arithmetic: `n > phi·total`
    // with a double product is the same boundary seam avgRound4 closed —
    // an item landing EXACTLY at phi·total must be excluded by BOTH
    // engines, and a double `phi * total` at that boundary can round
    // either way. DECIMAL(38,0) products cannot overflow.
    val phiBd = BigDecimal(phi.toString).underlying.stripTrailingZeros
    // 10^scale must stay an exact long (math.pow saturates past 2^63 and
    // would silently corrupt the rational); a phi needing > 18 decimals
    // is below any meaningful heavy-hitter threshold anyway
    require(phiBd.scale <= 18,
      s"phi ($phi) needs ${phiBd.scale} decimals — thresholds below 1e-18 " +
        "are not supported (and MG capacity ceil(1/phi) would not fit memory)")
    val (rawNum, rawDen) =
      if (phiBd.scale <= 0)
        (phiBd.unscaledValue.longValueExact *
          math.pow(10, -phiBd.scale).toLong, 1L)
      else (phiBd.unscaledValue.longValueExact,
        math.pow(10, phiBd.scale).toLong)
    val g = java.math.BigInteger.valueOf(rawNum)
      .gcd(java.math.BigInteger.valueOf(rawDen)).longValueExact
    val (phiNum, phiDen) = (rawNum / g, rawDen / g)
    // ONE pass produces BOTH the MG candidate summary and the stream
    // total (they'd otherwise be two full scans of the same stream);
    // the 1-row result is pinned LAZILY so (a) its two consumers below
    // share one scan at execution and (b) building this frame runs ZERO
    // jobs — candidates stay a (broadcast) plan input, no driver
    // collect, so SQL surfaces composing it (heavy_hitters TVF) stay
    // job-free at analysis time.
    val summary = df.agg(
        graft.functions.MisraGries.mg_topk(col(itemCol), k).as("_mg"),
        count(col(itemCol)).as("_n"))
      .localCheckpoint(false)
    val cand = summary.select(explode(col("_mg")).as("_e"))
      .select(col("_e.item").as(itemCol))
    // frac via exact integer HALF_UP at 6 decimals — round(n/total, 6)
    // is the cross-engine midpoint seam Terms.avgRound4 documents (an
    // exact 6-decimal midpoint has no double, and the engines round it
    // opposite ways). True integer division (IntegralDivide) — exact
    // for all long operands, so valid while the NUMERATOR n·2e6 + total
    // fits a long: totals < 2^63/2e6 ≈ 4.6e12 rows; beyond that,
    // compute frac downstream in decimal.
    val fracNum = col("n") * lit(2000000L) + col("_n")
    val fracDen = lit(2L) * col("_n")
    df.join(broadcast(cand), Seq(itemCol), "left_semi")
      .groupBy(col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(summary.select(col("_n"))))
      .filter(col("n").cast("decimal(38,0)") * lit(phiDen) >
        lit(phiNum) * col("_n").cast("decimal(38,0)"))
      .select(col("item"), col("n"),
        (call_function("div", fracNum, fracDen)
          .cast("double") / 1000000.0).as("frac"))
  }

  /** Persist a sketch: bits as parquet plus a meta table carrying
    * (mBits, k) — params ride the store so a probe can never hash with
    * a different modulus than the build (the [[CmSketch]] discipline,
    * storage flavor). The store invariant is DISTINCT position rows —
    * not for correctness ([[bloomMaybe]]'s every-position-hit test is
    * join-multiplicity-proof) but for size: the sketch's whole value is
    * staying orders of magnitude under the key set, and a
    * blind-appending store would grow with ingest volume instead of
    * set bits — which is why [[bloomAppend]] anti-joins before
    * appending instead of deduping at read.
    */
  def bloomSave(sketch: BloomSketch, dir: String): Unit = {
    val spark = sketch.bits.sparkSession
    sketch.bits.write.mode("overwrite").parquet(s"$dir/bits")
    import spark.implicits._
    Seq((sketch.mBits, sketch.k)).toDF("m_bits", "k")
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def bloomLoad(spark: org.apache.spark.sql.SparkSession,
      dir: String): BloomSketch = {
    val m = spark.read.parquet(s"$dir/meta").head()
    BloomSketch(spark.read.parquet(s"$dir/bits"), m.getLong(0), m.getInt(1))
  }

  /** Grow a persisted sketch by an increment's keys — the summary-reuse
    * half of the ingest contract: work is increment-sized hashing plus
    * one summary×summary anti-join (never corpus-shaped), and only
    * genuinely-new positions land, preserving the distinct-store
    * invariant. The append materializes before writing (the stored
    * bits are both the anti-join's build side and the write target —
    * the read-under-overwrite hazard every store in this repo guards).
    * Returns the reloaded sketch.
    */
  def bloomAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
      increment: DataFrame, keyCol: String): BloomSketch = {
    val stored = bloomLoad(spark, dir)
    val fresh = bloomBuild(increment.select(col(keyCol)), keyCol,
      stored.mBits, stored.k)
    val newBits = fresh.bits.join(stored.bits, Seq("pos"), "left_anti")
      .localCheckpoint(true)
    newBits.write.mode("append").parquet(s"$dir/bits")
    graft.operators.Dedup.releaseLocalCheckpoint(newBits)
    bloomLoad(spark, dir)
  }
}
