package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design: nothing here is O(n²). Candidate generation is always
  * bucket-local — LSH band buckets (MinHash), hamming-band buckets
  * (SimHash), or hyperplane-sign buckets (embeddings) — so the only
  * shuffles are groupBy/join on bucket keys, and pair verification runs
  * only within buckets. At 100 TB the bucket join is a standard shuffled
  * equi-join AQE can skew-split; per-doc signature computation is a
  * map-only pass.
  */
object Dedup {

  /** Exact dedup by content: first (min id) per distinct key wins; emits
    * keeper id + duplicate count per group.
    */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_dupes"))
      .select(col("keep_id"), col("n_dupes"))

  /** Base shingle-set hashes: each distinct word-n-gram hashed ONCE, as a
    * native kernel ([[graft.functions.ShingleHashes]]) — the declarative
    * HOF formulation (transform+xxhash64 over [[TextOps.shingles]])
    * re-evaluates the token split per array element in interpreted mode,
    * ~100× slower at sf0.1.
    */
  def shingleHashes(text: Column, shingleN: Int): Column =
    graft.functions.TextVectorExpressions.shingle_hashes(text, shingleN)

  /** MinHash signature from precomputed base hashes: k permutations derived
    * by fixed-width mixing of the 64-bit base hash in one codegen'd pass.
    */
  def minhashSignatureFromHashes(baseHashes: Column, numHashes: Int): Column =
    graft.functions.TextVectorExpressions.minhash_signature(baseHashes, numHashes)

  /** MinHash signature of the document's word-`n`-gram shingle set. */
  def minhashSignature(text: Column, shingleN: Int, numHashes: Int): Column =
    minhashSignatureFromHashes(shingleHashes(text, shingleN), numHashes)

  /** MinHash + LSH banding candidate pairs with estimated Jaccard.
    *
    * signature → `bands` bands of `numHashes/bands` rows; docs sharing any
    * band hash become candidates (one self-equi-join on the band bucket);
    * candidate pairs are then scored by signature agreement (the unbiased
    * Jaccard estimate) and filtered at `minJaccard`.
    *
    * Output: (a_id, b_id, est_jaccard), a_id < b_id.
    */
  /** (id, sig) MinHash signatures of `docs` — the single definition both
    * the batch and incremental LSH variants compute from, so their
    * candidate spaces can never drift apart.
    */
  private[operators] def minhashSigs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame =
    docs
      .select(col(idCol).as("id"), shingleHashes(col(textCol), shingleN).as("bh"))
      .select(col("id"), minhashSignatureFromHashes(col("bh"), numHashes).as("sig"))

  /** (id, band, band_hash) LSH band buckets of a signature frame (band
    * hash = salted xxhash64 of the band's signature slice).
    */
  private[operators] def bandBuckets(sigs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val rows = numHashes / bands
    sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          slice(col("sig"), b * rows + 1, lit(rows))), b))).as(Seq("band", "band_hash")))
  }

  private def requireBands(numHashes: Int, bands: Int): Unit =
    require(bands >= 1 && numHashes % bands == 0,
      s"bands ($bands) must divide numHashes ($numHashes) — otherwise part " +
        "of the signature is silently ignored, or (bands > numHashes) every " +
        "doc shares every band hash and the candidate join degenerates to all pairs")

  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5): DataFrame = {
    requireBands(numHashes, bands)
    // signatures computed once and persisted: the band join reads this
    // frame twice and the scoring joins read it twice more. Lifecycle note:
    // cached blocks live until the session cache is cleared — batch drivers
    // (Verify/Bench) call spark.catalog.clearCache() between queries; a
    // long-lived service should own persistence itself (at cluster scale:
    // write signatures to a staging table instead).
    val sigs = minhashSigs(docs, idCol, textCol, shingleN, numHashes).persist()
    val banded = bandBuckets(sigs, numHashes, bands)
    // candidate generation ships ONLY id pairs — carrying the signature
    // arrays through the bucket join explodes memory when buckets are hot
    // (duplicate-heavy corpora put every copy of a doc in the same bucket:
    // at 50k docs with 10× replication the array-laden join OOMed a 1 GB
    // heap; id-pairs-then-attach runs in a fraction of it)
    val a = banded.select(col("band"), col("band_hash"), col("id").as("a_id"))
    val b = banded.select(col("band"), col("band_hash"), col("id").as("b_id"))
    val candidates = a.join(b, Seq("band", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    // signature agreement via the native SigAgreement kernel — the
    // aggregate(zip_with(...)) HOF formulation is CodegenFallback and
    // re-evaluates per element; this runs once per candidate pair, which
    // on a dup-heavy 100 TB corpus is billions of evaluations
    candidates
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("est_jaccard",
        graft.functions.TextVectorExpressions.sig_agreement(col("a_sig"), col("b_sig"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens: per bit, majority vote of token
    * hashes ([[graft.functions.SimHash64]] native kernel).
    */
  def simhash(text: Column): Column =
    graft.functions.TextVectorExpressions.simhash64(text)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by 16-bit bands (a doc pair within
    * hamming distance ≤3 shares at least one of 4 bands — pigeonhole), then
    * verify exact hamming within buckets.
    *
    * `maxBucket` caps band-bucket size: template-heavy corpora put
    * thousands of near-identical docs into one 16-bit band value, turning
    * the bucket join quadratic (measured: 41 s at 50k docs with 10×
    * replication, 11 s with the cap + id-pair join). Oversized buckets are
    * skipped — a
    * documented recall tradeoff; those documents still pair through their
    * other three bands when genuinely close.
    */
  def simhashDups(docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
      .persist()
    val banded = sigs.select(col("id"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("band", "band_bits")))
    val bucketSizes = banded.groupBy("band", "band_bits")
      .agg(count(lit(1)).as("_bucket_n"))
    val pruned = banded.join(bucketSizes, Seq("band", "band_bits"))
      .filter(col("_bucket_n") <= maxBucket)
    val a = pruned.select(col("band"), col("band_bits"), col("id").as("a_id"))
    val b = pruned.select(col("band"), col("band_bits"), col("id").as("b_id"))
    val candidates = a.join(b, Seq("band", "band_bits"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("hamming", hamming(col("a_sig"), col("b_sig")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Exact word-n-gram Jaccard for candidate pairs: candidates from MinHash
    * LSH (cheap), verification on true shingle sets (array_intersect /
    * array_union) — the two-phase shape that scales.
    */
  def ngramJaccardDups(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.6): DataFrame = {
    val candidates = minhashLsh(docs, idCol, textCol, shingleN,
      numHashes = 32, bands = 16, minJaccard = math.max(0.1, minJaccard - 0.25))
    // exact verification on the shingle-hash sets (64-bit hash identity —
    // collision probability negligible vs string sets, far cheaper to ship)
    val sets = docs.select(col(idCol).as("id"),
      shingleHashes(col(textCol), shingleN).as("set"))
    candidates
      .join(sets.withColumnRenamed("id", "a_id").withColumnRenamed("set", "a_set"), "a_id")
      .join(sets.withColumnRenamed("id", "b_id").withColumnRenamed("set", "b_set"), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("a_set"), col("b_set"))).cast("double") /
          size(array_union(col("a_set"), col("b_set"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Embedding near-dup pairs by cosine ≥ `minCos`: random-hyperplane LSH
    * buckets (sign bits of `planes` fixed deterministic hyperplanes),
    * verify exact cosine within buckets. Near-identical vectors agree on
    * all sign bits with high probability; multiprobe (flipping one bit)
    * covers boundary cases.
    *
    * `maxBucket` caps bucket size like [[simhashDups]] — oversized buckets
    * are skipped (documented recall tradeoff for pairs whose ONLY shared
    * bucket is hot; pairs also reachable via the partner's probe still
    * surface thanks to post-join orientation normalization). Default 16
    * planes: 256 buckets (8 planes) is below realistic direction-diversity,
    * making every bucket hot regardless of caps.
    */
  def embeddingDups(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double = 0.99, planes: Int = 16, maxBucket: Int = 1000): DataFrame = {
    // 16 planes → 65k buckets: at 8 the bucket count (256) is far below
    // realistic corpus direction-diversity, so every bucket is hot and the
    // candidate set quadratic regardless of caps. For cos ≥ 0.99 pairs the
    // per-plane agreement is ~0.986; all-16-agree ≈ 0.79 and the single-bit
    // multiprobe lifts recall to ~0.98.
    val withSig = emb.select(col(idCol).as("id"), col(vecCol).as("v"),
      Similarity.hyperplaneBucket(col(vecCol), planes).as("bucket"),
      Similarity.norm(col(vecCol)).as("n"))
      .persist()
    // multiprobe: original bucket + each single-bit flip — id+probe only;
    // vectors attach after pair dedup (same hot-bucket memory hazard as
    // minhashLsh: 20k replicated vectors ran 107 s / multi-GB shipping
    // vectors through the probe join, ~seconds with id pairs + caps)
    val probed = withSig.select(col("id"),
      explode(concat(array(col("bucket")),
        transform(sequence(lit(0), lit(planes - 1)),
          i => col("bucket").bitwiseXOR(call_function("shiftleft", lit(1L), i))))).as("probe"))
    val bucketSizes = withSig.groupBy(col("bucket").as("probe"))
      .agg(count(lit(1)).as("_bucket_n"))
    val a = probed.join(bucketSizes, Seq("probe"))
      .filter(col("_bucket_n") <= maxBucket)
      .select(col("probe"), col("id").as("p_id"))
    val b = withSig.select(col("bucket").as("probe"), col("id").as("r_id"))
    // normalize orientation AFTER the join, not via a p_id < r_id
    // pre-filter: with the bucket cap, a pair may only survive in the
    // reverse direction (low-id vector's probe dropped because the high-id
    // vector's bucket is hot) — least/greatest keeps that candidate
    val candidates = a.join(b, Seq("probe"))
      .filter(col("p_id") =!= col("r_id"))
      .select(least(col("p_id"), col("r_id")).as("a_id"),
        greatest(col("p_id"), col("r_id")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(withSig.select(col("id").as("a_id"), col("v").as("a_v"), col("n").as("a_n")), "a_id")
      .join(withSig.select(col("id").as("b_id"), col("v").as("b_v"), col("n").as("b_n")), "b_id")
      .withColumn("cos", Similarity.cosineWithNorms(col("a_v"), col("b_v"), col("a_n"), col("b_n")))
      .filter(col("cos") >= minCos)
      .select(col("a_id"), col("b_id"), round(col("cos"), 4).as("cos"))
  }

  /** Release the storage blocks of a `localCheckpoint`'d Dataset.
    * `Dataset.unpersist` only clears CacheManager entries — a local
    * checkpoint's blocks belong to the underlying RDD (held by the plan's
    * `LogicalRDD` leaf) and stay resident until the ContextCleaner GCs
    * them; iterative algorithms that supersede a checkpoint per round must
    * unpersist that RDD directly or pin O(iterations) executor storage.
    */
  private[graft] def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Which of `increment`'s ids are already present in `corpus` — the
    * incremental-ingest identity probe, shaped for a SMALL increment
    * against a HUGE corpus. The naive
    * `increment.join(corpusIds, "left_anti")` cannot broadcast (only an
    * anti-join's RIGHT side broadcasts, and that side is the corpus), so
    * Spark shuffles the entire corpus id column on every ingest batch —
    * the round-12 datadom2 probe measured the lexical add path growing
    * super-linearly in the increment from exactly this (7.3 → 20.4 s
    * when the CORPUS doubled under a doubled increment). Flipped, the
    * corpus side is one map-only scan under a broadcast left-semi (the
    * increment's distinct ids are batch-sized by contract), and the
    * result — ids that need dropping — is at most increment-sized, so
    * the caller's final anti-join broadcasts too. Zero corpus shuffle.
    */
  private[graft] def presentIds(corpus: DataFrame, increment: DataFrame,
      idCol: String): DataFrame =
    corpus.select(col(idCol)).join(
      broadcast(increment.select(col(idCol)).distinct()),
      Seq(idCol), "left_semi")

  /** Incremental LSH dedup as a running Structured Streaming query: each
    * arriving micro-batch of (idCol, textCol) documents is shingled and
    * signed ONCE, scored against the accumulated signature state plus
    * itself ([[incrementalFromBuckets]]), the surviving pairs append to
    * `pairsDir`, and the batch's signatures AND band buckets append to the
    * state.
    *
    * State layout under `stateDir`: `sigs/ sb=<N>/` = (id, sig) one row
    * per doc PARTITIONED by `sb = pmod(xxhash64(id), nStateBuckets)`, and
    * `buckets/ bb=<N>/` = (id, band, band_hash) `bands` rows per doc
    * PARTITIONED by `bb = pmod(band_hash, nStateBuckets)` — the persisted
    * band-bucket INDEX, laid out the way [[LexIndexStore]] buckets its
    * postings. Per-batch work is O(increment + touched buckets), never
    * O(store): the increment is shingled/signed/bucketed once, its
    * `bb`/`sb` value sets (bounded by `nStateBuckets`, driver-safe)
    * become literal partition filters, and the probe reads ONLY the
    * stored partitions that could hold a matching `(band, band_hash)` —
    * a row matching an incoming band hash has that hash's `bb` by
    * construction, so the pruning is exact, not approximate
    * (plan-guarded in ExtensionOpsSpec). The one remaining store-wide
    * read is the signature attach for candidate scoring — a 2-column
    * columnar scan feeding a plain id equi-join (AQE-splittable), with
    * no shingle/hash re-derivation.
    *
    * The union of emitted pairs over any arrival split equals the one-shot
    * batch run (the batch-parity property the spec pins). Duplicate ids
    * WITHIN one micro-batch keep one row (`dropDuplicates("id")`) — the
    * one-row-per-id state invariant starts inside the batch, not just at
    * the store anti-join.
    *
    * The batch's signature frame is persisted and unpersisted INSIDE the
    * batch — a long-running stream must not grow the session cache (the
    * batch drivers' clearCache() escape hatch never runs here). State
    * appends are materialized (`localCheckpoint`) BEFORE writing: the
    * new-row filter anti-joins against the directory the append then
    * writes to, and a lazy self-referential read-modify-append is only
    * safe under V1 listing timing by accident. Restarts are covered by the
    * streaming checkpoint: a replayed batch re-derives the same pairs
    * (dedup downstream by (a_id, b_id)), and each state table re-filters
    * the increment against its OWN contents, so a crash between the two
    * appends heals on replay with no duplicate state rows. `compactEvery`
    * > 0 compacts both state tables every that many batches
    * ([[graft.sinks.TableSink.compact]]) — append-per-batch tables
    * otherwise accrete one small file per trigger.
    */
  def streamingMinhashDedup(spark: org.apache.spark.sql.SparkSession,
      sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      stateDir: String, pairsDir: String, checkpointDir: String,
      idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5, compactEvery: Int = 0,
      nStateBuckets: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    requireBands(numHashes, bands)
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .queryName("graft_dedup")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val incSigs = minhashSigs(batch.select(col(idCol), col(textCol)),
          idCol, textCol, shingleN, numHashes)
          .dropDuplicates("id").persist()
        val incBuckets = bandBuckets(incSigs, numHashes, bands).persist()
        try {
          // ONE state read serves both the probe and the growth: the
          // state dirs cannot change between them inside a batch, and
          // each readState costs two driver collects over the increment
          // (round-16; previously paid twice per trigger)
          val st = readState(s, incSigs, incBuckets, stateDir, nStateBuckets)
          val pairs = statePairsPlan(incSigs, incBuckets, st,
            numHashes, minJaccard)
            .localCheckpoint(true) // materialize BEFORE the state grows
          try pairs.write.mode("append").parquet(pairsDir)
          finally releaseLocalCheckpoint(pairs)
          growState(s, incSigs, incBuckets, st, stateDir, nStateBuckets)
          if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
            compactState(s, stateDir)
        } finally { incSigs.unpersist(); incBuckets.unpersist() }
      }
      .start()
  }

  /** The per-batch probe of the persisted LSH state: near-dup pairs of
    * the increment against the stored corpus plus itself, with the
    * stored band index read through a LITERAL partition filter on the
    * increment's `bb` set (exact — a stored row matching an incoming
    * band hash shares its `bb` by construction). The signature attach
    * reads the sig store unpruned (candidate ids are distributed, not
    * driver-collectable) but that is a 2-column scan + id equi-join.
    * Callers checkpoint the result BEFORE [[growState]] — the plan reads
    * the directories the growth then appends to.
    */
  private[graft] def statePairsPlan(s: org.apache.spark.sql.SparkSession,
      incSigs: DataFrame, incBuckets: DataFrame, stateDir: String,
      numHashes: Int, minJaccard: Double, nStateBuckets: Int): DataFrame =
    statePairsPlan(incSigs, incBuckets,
      readState(s, incSigs, incBuckets, stateDir, nStateBuckets),
      numHashes, minJaccard)

  private[operators] def statePairsPlan(incSigs: DataFrame, incBuckets: DataFrame,
      st: LshState, numHashes: Int, minJaccard: Double): DataFrame = {
    // scoring uses the incoming signature for any re-arrived id —
    // its stored sig AND stored buckets drop out of the probe
    val seenSigs = st.sigs.drop("sb")
      .join(incSigs.select("id"), Seq("id"), "left_anti")
    val seenBuckets = st.prunedBuckets.drop("bb")
      .join(incSigs.select("id"), Seq("id"), "left_anti")
    incrementalFromBuckets(seenSigs, seenBuckets, incSigs, incBuckets,
      numHashes, minJaccard)
  }

  /** Append the increment to the state, replay-safe and pruned: every
    * dedup filter reads only the increment's own `sb`/`bb` partitions
    * (`sb` is a function of id and `bb` of band hash, so a stored row
    * for an incoming id/hash can live nowhere else). Buckets commit
    * FIRST, the sig registry second: a crash between them leaves the id
    * out of the registry, so the replay re-filters its bucket rows
    * against the pruned bucket store (same content ⇒ same partitions ⇒
    * found ⇒ skipped) and re-appends only the missing sig row — heals
    * with no duplicate state rows. A re-arrived id with DIFFERENT
    * content (not a replay) is stopped by the registry filter before it
    * could scatter a second version across other bucket partitions.
    */
  private[graft] def growState(s: org.apache.spark.sql.SparkSession,
      incSigs: DataFrame, incBuckets: DataFrame, stateDir: String,
      nStateBuckets: Int): Unit =
    growState(s, incSigs, incBuckets,
      readState(s, incSigs, incBuckets, stateDir, nStateBuckets),
      stateDir, nStateBuckets)

  private[operators] def growState(s: org.apache.spark.sql.SparkSession,
      incSigs: DataFrame, incBuckets: DataFrame, st: LshState,
      stateDir: String, nStateBuckets: Int): Unit = {
    val sigIds = st.prunedSigs.select("id")
    val stateIds = sigIds.union(st.prunedBuckets.select("id")).distinct()
    // cluster by the partition column BEFORE the partitioned write —
    // unclustered, every task sprays a file into every bb=/sb= directory
    // (tasks × buckets files per trigger; the LexIndexStore.appendCorpus
    // rationale). The two materializations are independent — overlap
    // them (guide §2.6); the WRITES below stay in contract order
    // (buckets first, sigs second).
    val newBucketsF = StagePool.submit(s)(incBuckets
      .withColumn("bb", stateBb(nStateBuckets))
      .join(stateIds, Seq("id"), "left_anti")
      .repartition(col("bb"))
      .localCheckpoint(true))
    val newSigsF = StagePool.submit(s)(incSigs
      .withColumn("sb", stateSb(nStateBuckets))
      .join(sigIds, Seq("id"), "left_anti")
      .repartition(col("sb"))
      .localCheckpoint(true))
    val newBuckets =
      try StagePool.get(newBucketsF)
      catch { case e: Throwable =>
        // the sibling may have checkpointed successfully — release its
        // blocks, don't just await (round-17 advice fix)
        StagePool.awaitValueQuietly(newSigsF).foreach(releaseLocalCheckpoint)
        throw e
      }
    val newSigs =
      try StagePool.get(newSigsF)
      catch { case e: Throwable =>
        releaseLocalCheckpoint(newBuckets); throw e
      }
    try {
      newBuckets.write.partitionBy("bb").mode("append")
        .parquet(s"$stateDir/buckets")
      newSigs.write.partitionBy("sb").mode("append")
        .parquet(s"$stateDir/sigs")
    } finally {
      releaseLocalCheckpoint(newSigs)
      releaseLocalCheckpoint(newBuckets)
    }
  }

  /** Compact both state tables, PRESERVING the partitioned layout (the
    * flat [[graft.sinks.TableSink.compact]] would fold `sb`/`bb` back
    * into data columns and the pruned probe loses its partition
    * filters). One file per touched partition per pass.
    */
  private[graft] def compactState(s: org.apache.spark.sql.SparkSession,
      stateDir: String): Unit =
    Seq(s"$stateDir/sigs" -> "sb", s"$stateDir/buckets" -> "bb")
      .foreach { case (dir, pc) =>
        graft.sinks.TableSink.compactPartitioned(s, dir, pc)
      }

  private def stateSb(n: Int): Column =
    pmod(xxhash64(col("id")), lit(n.toLong)).cast("int")
  private def stateBb(n: Int): Column =
    pmod(col("band_hash"), lit(n.toLong)).cast("int")

  private[operators] final case class LshState(sigs: DataFrame, prunedSigs: DataFrame,
      prunedBuckets: DataFrame)

  /** Read the two state tables with the increment's partition sets
    * pushed as literal filters. The `bb`/`sb` value sets are bounded by
    * `nStateBuckets` (driver-safe collects). Schema-on-read: an
    * existing-but-empty state dir (crash inside the first state write)
    * must read as an empty frame, not fail schema inference forever.
    */
  /** Refuse a pre-partitioning (flat) state dir instead of silently
    * reading it wrong: the store is read with a schema that includes the
    * partition column, so legacy flat rows come back with `sb`/`bb`
    * null, fail every isin partition filter, and the whole stored state
    * turns invisible — missed duplicate pairs and re-appended ids. A
    * loud one-time migration error beats silent corruption.
    */
  private def assertPartitionedStateLayout(
      fs: org.apache.hadoop.fs.FileSystem, dir: String,
      partCol: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (fs.exists(p)) {
      val entries = fs.listStatus(p)
      val hasPartDirs = entries.exists(e =>
        e.isDirectory && e.getPath.getName.startsWith(partCol + "="))
      val hasFlatData = entries.exists { e =>
        val n = e.getPath.getName
        e.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      if (hasFlatData && !hasPartDirs) throw new IllegalStateException(
        s"streaming-dedup state at $dir is in the legacy FLAT layout " +
          s"(data files but no $partCol= partition directories); " +
          "reading it against the partitioned schema would surface " +
          s"every stored row with null $partCol and the partition-" +
          "pruned probe would miss all of it. Migrate once — read the " +
          s"flat table, derive $partCol, rewrite with " +
          s"write.partitionBy(\"$partCol\") — or point the stream at a " +
          "fresh stateDir.")
    }
  }

  private[operators] def readState(s: org.apache.spark.sql.SparkSession,
      incSigs: DataFrame, incBuckets: DataFrame, stateDir: String,
      nStateBuckets: Int): LshState = {
    val sigsDir = s"$stateDir/sigs"
    val bucketsDir = s"$stateDir/buckets"
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    assertPartitionedStateLayout(fs, sigsDir, "sb")
    assertPartitionedStateLayout(fs, bucketsDir, "bb")
    def exists(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    val sigSchema = incSigs.withColumn("sb", stateSb(nStateBuckets)).schema
    val bucketSchema = incBuckets.withColumn("bb", stateBb(nStateBuckets)).schema
    val sigStore =
      if (exists(sigsDir)) s.read.schema(sigSchema).parquet(sigsDir)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        sigSchema)
    val bucketStore =
      if (exists(bucketsDir)) s.read.schema(bucketSchema).parquet(bucketsDir)
      else s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        bucketSchema)
    // ONE job yields both partition-filter sets (round-17; previously two
    // driver collects per readState): every id in incSigs appears in
    // incBuckets (bands >= 1 by requireBands), so the distinct sb set off
    // the bucket frame equals the one off the sig frame, and both
    // collect_sets are bounded by nStateBuckets.
    val sets = incBuckets
      .agg(collect_set(stateSb(nStateBuckets)).as("_sbs"),
        collect_set(stateBb(nStateBuckets)).as("_bbs")).head()
    val incSb = sets.getSeq[Int](0)
    val incBb = sets.getSeq[Int](1)
    LshState(
      sigs = sigStore,
      prunedSigs =
        if (incSb.isEmpty) sigStore.limit(0)
        else sigStore.filter(col("sb").isin(incSb: _*)),
      prunedBuckets =
        if (incBb.isEmpty) bucketStore.limit(0)
        else bucketStore.filter(col("bb").isin(incBb: _*)))
  }

  /** Duplicated-SPAN detection (substring-level dedup, the Lee et al.
    * 2022 "Deduplicating Training Data Makes Language Models Better"
    * operation): token spans of ≥ `n` words whose 64-bit rolling hashes
    * appear in at least `minDocs` distinct documents, reported per
    * document with the overlapping/adjacent hash windows merged into
    * maximal spans.
    *
    * By default duplicate means hash-identical: at ~10^11 distinct
    * n-grams a 64-bit space yields a statistically certain trickle of
    * colliding pairs, each a span that is not actually repeated text.
    * `verify = true` closes that: flagged windows are re-read
    * ([[verifySpanWindows]]) and a window survives only if its VERBATIM
    * n-gram appears in ≥ `minDocs` documents — the grouping key becomes
    * (hash, gram), so a collision's distinct grams split into groups
    * below the threshold and drop. The verify pass is O(flagged), not
    * O(corpus): only docs holding flagged windows ship their text (one
    * doc_id equi-join), and only flagged windows' n-gram text (n tokens
    * each, never the document) enters the regroup shuffle — the
    * ids-only discipline of the LSH operators, relaxed exactly where
    * deletion-from-training-data needs the verbatim guarantee.
    *
    * Plan shape, all declarative: positional rolling n-gram hashes
    * ([[graft.functions.ShingleHashSeq]] kernel, map-only) → one shuffle
    * on the hash for the cross-doc frequency filter → per-doc
    * gaps-and-islands interval merge (running-max window + island
    * cumsum — no per-row state, no UDF). A duplicated run of L ≥ n tokens
    * yields L−n+1 consecutive windows, which the merge collapses to one
    * (start, end) span. At 100 TB the hash-frequency join is a standard
    * AQE-splittable equi-join; the window partitions by doc, which is the
    * natural distribution of the input.
    *
    * Output: (doc_id, span_start, span_end, n_tokens), token positions
    * 0-based inclusive.
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2, verify: Boolean = false): DataFrame = {
    require(n >= 1 && minDocs >= 2,
      s"need n ≥ 1 and minDocs ≥ 2 (got n=$n, minDocs=$minDocs)")
    // read by BOTH the frequency aggregate and the position join, and
    // deliberately NOT persisted: the exploded frame is ~20 bytes/token
    // vs ~6 bytes/token of source text, so materializing it costs more
    // than running the cheap tokenize+hash map twice (measured at the
    // 50k-doc probe: 3.8 s recompute vs 4.9 s persisted). If the map
    // ever grows expensive relative to its output, the one-shuffle shape
    // is groupBy(h, doc).agg(collect_list(pos)) → window-count over h.
    val hashed = docs.select(col(idCol).as("doc_id"),
      posexplode(graft.functions.TextVectorExpressions.shingle_hash_seq(
        col(textCol), n)).as(Seq("pos", "h")))
    // cross-doc frequency: a hash kept only if seen in ≥ minDocs docs
    // (count distinct is exact; at extreme corpus sizes swap for a
    // two-level groupBy((h, doc)) → groupBy(h) count, same plan family)
    val dupHashes = hashed.groupBy("h")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val dupWin = hashed.join(dupHashes, "h")
    val okWin =
      if (verify)
        // the verify pass reads the flagged windows through THREE
        // consumers (the flagged-doc semi-join, the gram attach, and the
        // regroup's final join reads grams twice more) — unpinned, each
        // replays the corpus-wide positional-hash explode plus the
        // frequency join (round-17). O(flagged) rows, the exact frame
        // the verify contract already bounds; pin released with the
        // returned plan (the containmentDecontaminate precedent).
        verifySpanWindows(docs, idCol, textCol,
          dupWin.localCheckpoint(true), n, minDocs)
      else dupWin
    val dupPos = okWin
      .select(col("doc_id"), col("pos").as("start"),
        (col("pos") + lit(n - 1)).as("end"))
    mergeSpanWindows(dupPos, Seq("doc_id"))
  }

  /** Gaps-and-islands merge of overlapping/adjacent [start, end] windows
    * per `partitionCols` group: a window starts a new island iff it begins
    * past the running max end + 1 of everything before it. ONE definition
    * shared by [[duplicateSpans]] and [[decontaminate]] — the adjacency
    * rule drifting between the two operators would make "duplicated span"
    * and "contaminated span" mean different things.
    */
  private def mergeSpanWindows(windows: DataFrame,
      partitionCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy("start")
    windows
      .withColumn("prev_max_end",
        max(col("end")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_end").isNull ||
          col("start") > col("prev_max_end") + 1, 1).otherwise(0))
      .withColumn("island", sum("new_island").over(w))
      .groupBy((partitionCols :+ "island").map(col): _*)
      .agg(min("start").as("span_start"), max("end").as("span_end"))
      .select(partitionCols.map(col) ++ Seq(col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("n_tokens")): _*)
  }

  /** The hash-collision filter behind `duplicateSpans(verify = true)`:
    * given flagged windows (doc_id, pos, h), keep only windows whose
    * verbatim n-gram text (whitespace-normalized + lowercased, exactly
    * the [[graft.functions.TextVectorKernels.tokenGramAt]] counterpart
    * of the window's hash) appears in ≥ `minDocs` distinct documents.
    * Two non-identical grams that collide into one 64-bit hash regroup
    * under distinct (h, gram) keys, fall below the threshold, and drop.
    *
    * Cost shape: text ships once per FLAGGED doc (semi-join, then one
    * doc_id equi-join against the windows — broadcastable when the
    * flagged set is small), gram extraction is a codegen'd kernel in the
    * join's output projection, and the regroup shuffles n-token grams
    * for flagged windows only — O(flagged) end to end.
    *
    * Exposed at window granularity so a collision can be PLANTED in a
    * spec: feed windows where two docs share `h` at positions whose text
    * differs and assert the window is dropped — a real 64-bit collision
    * is not constructible on demand.
    */
  private[operators] def verifySpanWindows(docs: DataFrame, idCol: String,
      textCol: String, windows: DataFrame, n: Int, minDocs: Int): DataFrame = {
    val flaggedText = docs
      .select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .join(windows.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    // a planted/out-of-range window yields a null gram, which the inner
    // regroup join then drops — null can never be "verified verbatim".
    // Pinned: grams feeds BOTH the (h, gram) threshold count and the
    // final verify join — unpinned, the text-attach join and gram
    // kernel run twice (round-17); O(flagged windows) rows.
    val grams = windows.join(flaggedText, Seq("doc_id"))
      .select(col("doc_id"), col("pos"), col("h"),
        graft.functions.TextVectorExpressions
          .token_gram(col("_text"), n, col("pos")).as("_gram"))
      .localCheckpoint(true)
    val okKeys = grams.groupBy("h", "_gram")
      .agg(countDistinct("doc_id").as("_nd"))
      .filter(col("_nd") >= minDocs)
      .select("h", "_gram")
    grams.join(okKeys, Seq("h", "_gram")).select("doc_id", "pos", "h")
  }

  /** Benchmark decontamination (the Lee et al. 2022 use case
    * [[duplicateSpans]]' machinery exists for): report every ≥ `n`-token
    * run a training document shares with a held-out benchmark/eval
    * document, as (doc_id, benchmark_id, span_start, span_end, n_tokens)
    * with positions in the TRAINING doc — the rows a pipeline either
    * drops from the corpus or flags as contaminated-eval overlap.
    *
    * Plan shape for the real size asymmetry (100 TB corpus vs MB-scale
    * eval suites): the benchmark side is exploded to a distinct
    * (benchmark_id, hash) key set — positions within the benchmark don't
    * matter, so its windows dedup to at most |benchmark tokens| keys and
    * the join against the corpus windows is broadcastable; the corpus
    * side is one map-only positional-hash explode, no corpus-side
    * shuffle before the match. Matched windows then merge per
    * (doc_id, benchmark_id) with the same gaps-and-islands window as
    * [[duplicateSpans]], partitioned by doc — the input's natural
    * distribution.
    *
    * `verify = true` adds the hash-collision guarantee deletion needs:
    * each matched window's verbatim n-gram (via
    * [[graft.functions.TextVectorKernels.tokenGramAt]] on BOTH sides)
    * must be equal, not just hash-equal. Two-sided equality makes this a
    * plain post-join filter — O(matched windows), no regroup; only
    * matched docs ship their text.
    */
  def decontaminate(docs: DataFrame, docIdCol: String, docTextCol: String,
      bench: DataFrame, benchIdCol: String, benchTextCol: String,
      n: Int = 8, verify: Boolean = false): DataFrame = {
    require(n >= 1, s"need n ≥ 1 (got n=$n)")
    import graft.functions.TextVectorExpressions.{shingle_hash_seq, token_gram}
    val docWin = docs.select(col(docIdCol).as("doc_id"),
      posexplode(shingle_hash_seq(col(docTextCol), n)).as(Seq("pos", "h")))
    val benchWin = bench.select(col(benchIdCol).as("benchmark_id"),
      posexplode(shingle_hash_seq(col(benchTextCol), n)).as(Seq("b_pos", "h")),
      col(benchTextCol).as("_btext"))
    val benchKeys =
      (if (verify)
        benchWin.select(col("benchmark_id"), col("h"),
          token_gram(col("_btext"), n, col("b_pos")).as("_gram"))
      else benchWin.select(col("benchmark_id"), col("h"))).distinct()
    val hits0 = docWin.join(benchKeys, Seq("h"))
    val okHits =
      if (verify) {
        // two consumers below would each replay the corpus-sized window
        // explode — pin the O(matched) frame so the corpus scans once
        // (released by the ContextCleaner with the returned plan)
        val hits = hits0.localCheckpoint(true)
        val matchedText = docs
          .select(col(docIdCol).as("doc_id"), col(docTextCol).as("_text"))
          .join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
        hits.join(matchedText, Seq("doc_id"))
          .filter(token_gram(col("_text"), n, col("pos")) === col("_gram"))
      } else hits0
    val spans = okHits.select(col("doc_id"), col("benchmark_id"),
      col("pos").as("start"), (col("pos") + lit(n - 1)).as("end"))
    mergeSpanWindows(spans, Seq("doc_id", "benchmark_id"))
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): partition the embedding
    * space with the deterministic IVF k-means quantizer
    * ([[Similarity.buildIvf]]), compare pairs ONLY within a cluster,
    * connect cos ≥ `minCos` pairs into semantic-dup groups (transitive —
    * A~B~C is one group even without an A~C edge), and keep one
    * representative per group. Representative = the group's minimum id
    * (the [[keepDecisions]] convention — deterministic and
    * arrival-independent; the paper's lowest-centroid-similarity pick is
    * a one-line swap on the same machinery). Output: (idCol, cid,
    * cluster_size, dup_group, keep) — one row per input vector.
    *
    * Where x05 ([[embeddingDups]]) answers "which PAIRS are near-dups"
    * via sign-LSH buckets, this is the cluster-then-prune WHOLE-CORPUS
    * recipe: every vector gets a verdict, and the pair search is scoped
    * by the semantic clustering itself. Scale shape: the pair join is an
    * equi-join on the partition key (AQE-splittable); pairwise work is
    * Σ m_i² over partition sizes — the SemDeDup cost model, tuned by
    * `nClusters` (the paper runs 50k clusters over LAION so m_i stays
    * ~10⁴).
    *
    * OVERSIZE clusters (> `maxCluster` — the dominant semantic mass a
    * web corpus always has) are RECURSIVELY re-clustered with a finer
    * per-cluster quantizer (the paper's practice) until every partition
    * fits under the cap: each refinement level trains one deterministic
    * sub-quantizer per oversize partition on that partition's own rows
    * (driver loop bounded by the oversize count — the skew tail; every
    * collect stays model-sized) and lands ALL reassignments in a single
    * corpus-wide join. Pairing then runs inside the refined leaves, so
    * dups buried in a dominant cluster are caught instead of skipped.
    * The tradeoff is bounded recall loss at leaf BOUNDARIES: a dup pair
    * the sub-quantizer separates is missed (cos ≥ 0.99 pairs sit ~8°
    * apart and almost always share a nearest sub-centroid; IDENTICAL
    * vectors always do). Partitions still over the cap after
    * `refineDepth` levels — or that a sub-quantizer cannot split at all
    * (a > cap mass of identical points) — skip pairing as before, and
    * the skip is never silent: every row carries `paired` (false ⇒ its
    * partition was never pairwise-compared) alongside its TOP-LEVEL
    * `cid`/`cluster_size` provenance.
    */
  def semDeDup(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, minCos: Double = 0.99, iters: Int = 2,
      maxCluster: Long = 100000L, refineBranch: Int = 8,
      refineDepth: Int = 3): DataFrame = {
    require(nClusters >= 1, s"nClusters ($nClusters) must be >= 1")
    require(minCos >= -1.0 && minCos <= 1.0, s"minCos ($minCos) must be in [-1, 1]")
    require(maxCluster >= 2, s"maxCluster ($maxCluster) must be >= 2")
    require(refineBranch >= 2, s"refineBranch ($refineBranch) must be >= 2")
    require(refineDepth >= 0, s"refineDepth ($refineDepth) must be >= 0")
    val ivf = Similarity.buildIvf(emb.select(col(idCol), col(vecCol)),
      idCol, vecCol, nClusters, iters)
    var assigned = ivf.assigned
      .select(col(idCol).as("id"), col(vecCol).as("v"), col("cid"))
      .withColumn("n", Similarity.norm(col("v")))
      // the pairing partition key: starts as the top-level cluster,
      // grows a ".subcid" path segment per refinement level
      .withColumn("part", col("cid").cast("string"))
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("cluster_size"))
    // level-0 partitions ARE the clusters, so their sizes come free off
    // the (nClusters-row, broadcastable) sizes frame
    var frontier: Seq[(String, Long)] = sizes
      .filter(col("cluster_size") > maxCluster)
      .select(col("cid").cast("string"), col("cluster_size"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    var terminal = List.empty[String] // gave up: un-splittable under cap
    var depth = 0
    while (frontier.nonEmpty && depth < refineDepth) {
      // One sub-quantizer per oversize partition, trained on that
      // partition only. Branch is clamped to size/2 so the quantizer
      // never degenerates to one-point cells (k ≈ n would scatter dup
      // groups into singleton leaves and silently miss them); depth,
      // not branch, does the rest of the splitting.
      // Independent per-partition quantizer trainings overlap on the
      // scheduler (guide §2.6) instead of serializing their Lloyd jobs
      // on the driver — results are joined back in frontier order and
      // each training is deterministic, so the output is byte-identical
      // to the sequential form (partitions are disjoint; which _subcid a
      // given id gets depends only on its own partition's training).
      val subMaps = frontier.map { case (p, s) =>
        StagePool.submit(assigned.sparkSession) {
          val eff = math.min(refineBranch.toLong, math.max(2L, s / 2)).toInt
          Similarity.buildIvf(
            assigned.filter(col("part") === p).select(col("id"), col("v")),
            "id", "v", eff, iters)
            .assigned.select(col("id"), col("cid").as("_subcid"))
        }
      }
      // await-all abort discipline: a failed training must not leave the
      // sibling trainings running against frames the caller releases
      val subMapsDone = StagePool.getAll(subMaps)
      // disjoint partitions → one union, ONE corpus-wide reassignment
      // join per level; checkpoint cuts the per-level lineage the next
      // level's Lloyd passes would otherwise replay iters× over
      assigned = assigned
        .join(subMapsDone.reduce(_ union _), Seq("id"), "left")
        .withColumn("part", when(col("_subcid").isNotNull,
          concat(col("part"), lit("."), col("_subcid"))).otherwise(col("part")))
        .drop("_subcid")
        .localCheckpoint(true)
      val parentSize = frontier.toMap
      val stillOver = assigned.groupBy("part")
        .agg(count(lit(1)).as("psz"))
        .filter(col("psz") > maxCluster)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        // a partition already declared terminal must NOT re-enter the
        // frontier at deeper levels (its parent has left parentSize, so
        // the no-progress test below would misclassify it as splittable
        // and re-train the unsplittable mass every remaining level)
        .filterNot { case (p, _) => terminal.contains(p) }
      // no-progress guard: a child exactly as big as its trained parent
      // will never split (a > cap mass of identical vectors) — stop
      // burning Lloyd passes on it; it lands paired=false below
      val (stuck, splittable) = stillOver.partition { case (p, s) =>
        val dot = p.lastIndexOf('.')
        dot >= 0 && parentSize.get(p.substring(0, dot)).contains(s)
      }
      terminal ++= stuck.map(_._1)
      frontier = splittable
      depth += 1
    }
    // partitions still over cap after refinement skip pairing — missed
    // dups, never false merges — and are VISIBLE via paired=false
    val residual = frontier.map(_._1) ++ terminal
    val pairedCol = if (residual.isEmpty) lit(true)
      else !col("part").isin(residual: _*)
    val pairable = assigned.filter(pairedCol)
    val left = pairable.select(col("part"), col("id").as("a_id"),
      col("v").as("a_v"), col("n").as("a_n"))
    val right = pairable.select(col("part"), col("id").as("b_id"),
      col("v").as("b_v"), col("n").as("b_n"))
    val pairs = left.join(right, Seq("part"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", Similarity.cosineWithNorms(col("a_v"), col("b_v"),
        col("a_n"), col("b_n")))
      .filter(col("cos") >= minCos)
      .select("a_id", "b_id")
    keepDecisions(assigned.select(col("id").as(idCol)), idCol, pairs)
      .select(col("doc_id").as(idCol), col("cluster_id").as("dup_group"),
        col("keep"))
      .join(assigned.select(col("id").as(idCol), col("cid"), col("part")), idCol)
      .join(broadcast(sizes), "cid")
      .select(col(idCol), col("cid"), col("cluster_size"), col("dup_group"),
        col("keep"), pairedCol.as("paired"))
  }

  /** N-gram containment-ratio decontamination — the published recipe
    * (Brown et al. 2020 appendix C's 13-gram overlap; the containment
    * form most released-corpus reports use): for every (training doc,
    * benchmark doc) pair sharing at least one verbatim `n`-token gram,
    * report `containment` = |distinct benchmark n-grams appearing
    * verbatim in the doc| / |distinct benchmark n-grams|, and flag the
    * pair `contaminated` when the (rounded) ratio ≥ `minRatio`. The
    * span-level machinery ([[decontaminate]]) answers "WHERE does the
    * overlap sit" for surgical span removal; this answers "HOW MUCH of
    * the benchmark does the doc cover" — the whole-document drop/keep
    * decision. Benchmark docs with fewer than `n` tokens have no grams
    * and never pair.
    *
    * Plan shape for the 100 TB-corpus / MB-benchmark asymmetry: the
    * benchmark side dedups to distinct (benchmark_id, hash, gram) keys —
    * bounded by benchmark token count, broadcastable; the corpus side is
    * one map-only positional-hash explode joined against it, so nothing
    * corpus-sized shuffles before the match. Matches are verified
    * VERBATIM (gram-string equality, not just hash equality — the
    * [[duplicateSpans]] verify discipline, always on here because a
    * containment ratio inflated by a hash collision flags the wrong
    * document), then distinct grams count per pair — the shuffle carries
    * matched windows only, O(matched). Gram canonicalization is
    * [[graft.functions.TextVectorKernels.tokenGramAt]] (lowercased,
    * whitespace-normalized), reproducible in portable SQL — the x58
    * oracle recomputes the whole operator live in DuckDB.
    *
    * Output: (doc_id, benchmark_id, n_matched, n_bench_grams,
    * containment, contaminated).
    */
  def containmentDecontaminate(docs: DataFrame, docIdCol: String,
      docTextCol: String, bench: DataFrame, benchIdCol: String,
      benchTextCol: String, n: Int = 13, minRatio: Double = 0.8): DataFrame = {
    require(n >= 1, s"need n ≥ 1 (got n=$n)")
    require(minRatio >= 0.0 && minRatio <= 1.0,
      s"minRatio ($minRatio) must be in [0, 1]")
    import graft.functions.TextVectorExpressions.{shingle_hash_seq, token_gram}
    val benchKeys = bench.select(col(benchIdCol).as("benchmark_id"),
        posexplode(shingle_hash_seq(col(benchTextCol), n)).as(Seq("b_pos", "h")),
        col(benchTextCol).as("_btext"))
      .select(col("benchmark_id"), col("h"),
        token_gram(col("_btext"), n, col("b_pos")).as("_gram"))
      .distinct()
    val benchTotals = benchKeys.groupBy("benchmark_id")
      .agg(countDistinct("_gram").as("n_bench_grams"))
    val docWin = docs.select(col(docIdCol).as("doc_id"),
      posexplode(shingle_hash_seq(col(docTextCol), n)).as(Seq("pos", "h")))
    // hits has TWO consumers (the matched-doc semi-join and the verify
    // join); unpinned, EACH would replay the corpus-sized window explode
    // — two full corpus passes at 100 TB. Pin the matched-windows-sized
    // frame (O(matched), bench-bounded) so the corpus is scanned ONCE;
    // the ContextCleaner drops the pin when the returned plan is GC'd
    // (the connectedComponents per-round precedent).
    val hits = docWin.join(benchKeys, Seq("h")).localCheckpoint(true)
    // verbatim gate: only matched docs ship text (semi-join), and only
    // matched windows' grams enter the count
    val matchedText = docs
      .select(col(docIdCol).as("doc_id"), col(docTextCol).as("_text"))
      .join(hits.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
    val verified = hits.join(matchedText, Seq("doc_id"))
      .filter(token_gram(col("_text"), n, col("pos")) === col("_gram"))
    verified.groupBy("doc_id", "benchmark_id")
      .agg(countDistinct("_gram").as("n_matched"))
      .join(benchTotals, "benchmark_id")
      // exact-rational rounding (Terms.ratioRound4): round(k/m, 4) on
      // the raw double could re-round a 4-decimal midpoint differently
      // in Spark and DuckDB — with the ratio column itself in the
      // output, any such pair would redden the live oracle, not just
      // flip the threshold verdict
      .withColumn("containment", graft.operators.Terms.ratioRound4(
        col("n_matched"), col("n_bench_grams")))
      .select(col("doc_id"), col("benchmark_id"), col("n_matched"),
        col("n_bench_grams"), col("containment"),
        (col("containment") >= minRatio).as("contaminated"))
  }

  /** Connected components over an undirected dup-pair edge list:
    * (id, cluster_id), cluster_id = the component's minimum id — the
    * missing step between pairwise near-dup output and an actual
    * keep/drop decision per document (transitive closure: A~B, B~C ⇒
    * {A,B,C} is one cluster even if A~C was never emitted).
    *
    * Algorithm: iterated min-label propagation with pointer halving —
    * each round every node adopts the minimum label in its closed
    * neighborhood (one equi-join + one groupBy) and then shortcuts to its
    * label's label (one self-join): since labels only decrease, the
    * halving step compresses label chains geometrically, giving O(log
    * diameter) rounds even on long-path graphs (the same effect the
    * large-star/small-star formulation of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", achieves) while clique-ish
    * near-dup graphs still converge in 2–3. Each round `localCheckpoint`s
    * the labels — without lineage truncation the plan doubles per
    * iteration and planning time dominates by round 10.
    */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 50): DataFrame = {
    // undirected edge list, materialized once — `pairs` is typically an
    // expensive LSH plan that must not re-execute per iteration
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint(true)
    // label init FUSED with the first propagation round (round-17): from
    // identity labels, round 1's closed-neighborhood minimum is exactly
    // least(id, min(neighbor)) — one aggregation over edges instead of a
    // distinct-init checkpoint plus a full join+groupBy+halving round.
    // The seeded labels still form a decreasing forest (every label is a
    // component member ≤ its node), labels only decrease from here, and
    // the loop still runs to its changed==0 fixpoint — so the fixpoint
    // (component minimum per node) is unchanged; the loop just starts one
    // round further along.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("_m"))
      .select(col("id"), least(col("id"), col("_m")).as("label"))
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val prev = labels
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), "dst")
        .groupBy(col("src").as("id")).agg(min("label").as("nbr_label"))
      // lazily persisted, NOT eagerly checkpointed: the halving self-join
      // reads this twice, and persist makes the single `next` checkpoint
      // job compute it once — an eager checkpoint here would cost a whole
      // extra action per round, and round count × action latency is what
      // the serial bench actually pays (lineage stays shallow either way:
      // prop bottoms out at the checkpointed labels/edges)
      val prop = labels.join(nbrMin, Seq("id"))
        .select(col("id"), col("label").as("_old"),
          least(col("label"), col("nbr_label")).as("label"))
        .persist()
      // pointer halving: adopt the label's own label (labels form a
      // decreasing forest, so this is always ≤ and compresses chains —
      // a label that is itself a root joins nothing and keeps its value)
      val labelOfLabel = prop.select(col("id").as("label"), col("label").as("_ll"))
      val next = prop
        .join(labelOfLabel, Seq("label"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("_ll"), col("label"))).as("label"),
          (least(col("label"), coalesce(col("_ll"), col("label"))) < col("_old"))
            .cast("long").as("_chg"))
        .localCheckpoint(true)
      // coalesce: sum over an empty frame is NULL (an empty pair list —
      // a clean corpus — must converge, not NPE)
      changed = next.agg(coalesce(sum("_chg"), lit(0L))).collect()(0).getLong(0)
      labels = next.drop("_chg")
      // superseded pins would otherwise stack up in executor storage once
      // per iteration; prop is a CacheManager persist (plain unpersist),
      // prev a checkpoint (Dataset.unpersist does NOT release those — it
      // only clears CacheManager entries — so drop the underlying RDD)
      prop.unpersist(blocking = false)
      if (prev ne labels) releaseLocalCheckpoint(prev)
      iter += 1
    }
    releaseLocalCheckpoint(edges)
    require(changed == 0,
      s"connectedComponents did not converge in $maxIters iterations — " +
        "component diameter exceeds the propagation budget; raise maxIters " +
        "or switch to the large-star/small-star formulation")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Full-corpus keep/drop decisions from near-dup pairs: every document
    * joined against its component (documents in no pair form singleton
    * clusters), `keep` = true exactly for each cluster's min-id
    * representative. This is the operator a training-data pipeline
    * actually runs — pairs are evidence, this is the verdict.
    */
  def keepDecisions(docs: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String = "a_id", bCol: String = "b_id"): DataFrame = {
    val clusters = connectedComponents(pairs, aCol, bCol)
    val labeled = docs.select(col(idCol).as("doc_id"))
      .join(clusters.select(col("id").as("doc_id"), col("cluster_id")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    // the keeper is the cluster's min id AMONG docs — when pairs came from
    // a superset of docs (pre-computed pair table, filtered corpus), the
    // component's global min may be absent and `doc_id === cluster_id`
    // would drop the entire cluster with zero keepers
    labeled.withColumn("keep", col("doc_id") ===
      min(col("doc_id")).over(Window.partitionBy(col("cluster_id"))))
  }

  /** Incremental MinHash+LSH: near-dup pairs of `incoming` docs against an
    * already-indexed `seen` corpus AND within `incoming` itself — the
    * cross-batch form of [[minhashLsh]] for an append-only ingest pipeline.
    * Seen-vs-seen pairs are NOT re-emitted: at 100 TB the indexed corpus
    * dwarfs every increment, and re-scoring it per batch is the difference
    * between O(batch) and O(corpus) per ingest step.
    *
    * `seen` would be a persisted signature/band table in production (the
    * signature computation here stands in for reading it); the band join
    * is the same AQE-splittable equi-join as the batch variant.
    *
    * Output: (a_id, b_id, est_jaccard), a_id < b_id, with incoming ids
    * participating in every pair.
    */
  def minhashLshIncremental(seen: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5): DataFrame = {
    requireBands(numHashes, bands)
    val incSigs = minhashSigs(incoming, idCol, textCol, shingleN, numHashes).persist()
    // an id present in BOTH frames (replayed/re-ingested doc) keeps only
    // its incoming signature — a plain union would attach two signatures
    // to that id and every one of its candidate pairs would emit twice
    val seenSigs = minhashSigs(seen, idCol, textCol, shingleN, numHashes)
      .join(incSigs.select("id"), Seq("id"), "left_anti").persist()
    incrementalFromSigs(seenSigs, incSigs, numHashes, bands, minJaccard)
  }

  /** The signature-level core of [[minhashLshIncremental]]: pairs of
    * `incSigs` against `seenSigs` ∪ `incSigs`, given (id, sig) frames.
    * This is the seam a production ingest loop calls with a PERSISTED
    * signature store (see [[streamingMinhashDedup]]) — each document's
    * text is shingled exactly once in its arrival batch, ever.
    * Assumes disjoint ids between the two frames (callers de-conflict).
    */
  private[operators] def incrementalFromSigs(seenSigs: DataFrame, incSigs: DataFrame,
      numHashes: Int, bands: Int, minJaccard: Double): DataFrame =
    incrementalFromBuckets(seenSigs, bandBuckets(seenSigs, numHashes, bands),
      incSigs, bandBuckets(incSigs, numHashes, bands), numHashes, minJaccard)

  /** The band-bucket-level core of the incremental variants: pairs of
    * `incSigs` against `seenSigs` ∪ `incSigs`, with the candidate join
    * running over ALREADY-MATERIALIZED bucket frames — the seam
    * [[streamingMinhashDedup]] feeds from its persisted (id, band,
    * band_hash) index so per-trigger work never re-derives buckets over
    * the accumulated corpus. Assumes disjoint ids between seen and inc
    * (callers de-conflict) and that `seenBuckets`/`incBuckets` are the
    * [[bandBuckets]] expansion of the matching signature frame.
    */
  private[operators] def incrementalFromBuckets(seenSigs: DataFrame, seenBuckets: DataFrame,
      incSigs: DataFrame, incBuckets: DataFrame,
      numHashes: Int, minJaccard: Double): DataFrame = {
    val allSigs = seenSigs.unionByName(incSigs)
    // probe side: ONLY the increment; build side: full corpus (seen +
    // incoming, so new-vs-new pairs surface too). Id pairs only, as ever.
    val probe = incBuckets
      .select(col("band"), col("band_hash"), col("id").as("a_id"))
    val build = seenBuckets.unionByName(incBuckets)
      .select(col("band"), col("band_hash"), col("id").as("b_id"))
    val candidates = probe.join(build, Seq("band", "band_hash"))
      .filter(col("a_id") =!= col("b_id"))
      // least/greatest then dedup: an incoming-incoming pair is found from
      // both sides, an incoming-seen pair only from the incoming side
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"))
      .dropDuplicates("a_id", "b_id")
    candidates
      .join(allSigs.select(col("id").as("a_id"), col("sig").as("a_sig")), "a_id")
      .join(allSigs.select(col("id").as("b_id"), col("sig").as("b_sig")), "b_id")
      .withColumn("est_jaccard",
        graft.functions.TextVectorExpressions.sig_agreement(col("a_sig"), col("b_sig"))
          .cast("double") / numHashes)
      .filter(col("est_jaccard") >= minJaccard)
      .select(col("a_id"), col("b_id"), round(col("est_jaccard"), 4).as("est_jaccard"))
  }
}
