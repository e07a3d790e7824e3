package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming training-export: the x43 release composition — near-dup
  * dedup → PII scrub → language/quality/repetition gates → deterministic
  * split → per-split sequence packing — over a DOCUMENT FILE STREAM,
  * exactly-once, converging to the one-shot batch export (parity-pinned
  * in TrainingExportSpec over ≥ 3 arrival batches).
  *
  * Per micro-batch:
  *  1. MinHash signatures of the arriving docs probe the persisted
  *     signature/band-bucket store ([[Dedup.streamingMinhashDedup]]'s
  *     `sb=`/`bb=`-partitioned state shape — O(batch + touched buckets)
  *     work, the store is never re-derived and the band scan is
  *     partition-pruned to the increment's bucket set); an
  *     arriving doc that pairs with ANY stored doc, or with a smaller id
  *     inside its own batch, is dropped. Under the id-ordered arrival
  *     contract this reproduces the batch run's min-id-keeps verdicts
  *     for pair- and chain-shaped clusters; the one irreducible
  *     divergence is a late BRIDGE doc joining two already-kept docs
  *     (batch CC would retro-drop one of them, but its sequences are
  *     already packed) — the standard prefix-greedy streaming-dedup
  *     semantics. ALL seen docs' signatures enter the store (kept and
  *     dropped), so chains spanning batches keep collapsing.
  *  2. The stateless gates run on the REDACTED text in x23's order:
  *     [[TextOps.piiScrub]], language-ID allowlist, quality floor,
  *     repetition gate, then [[TextOps.splitAssign]].
  *  3. Each split packs independently through
  *     [[Pack.packIncremental]]'s CAS-committed offset state, manifest
  *     spans landing at `outDir/split=<s>/batch=<id>` with overwrite —
  *     a replayed batch rewrites identical rows (dedup state appends
  *     heal by anti-join, the pack state recognizes the exact replay),
  *     so the pipeline is exactly-once end to end.
  *
  * Contracts inherited from the pieces: batches arrive in id order
  * (packIncremental refuses violations loudly) and one writer per
  * `stateDir` (enforced by the pack state's CAS; a second writer fails
  * with ConcurrentModificationException).
  */
object TrainingExport {

  def start(spark: org.apache.spark.sql.SparkSession,
      sourceDir: String, schema: org.apache.spark.sql.types.StructType,
      idCol: String, textCol: String, budget: Int,
      stateDir: String, outDir: String, checkpointDir: String,
      langs: Seq[String] = Seq("en", "es", "fr", "de"),
      minQuality: Double = 0.5,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      minJaccard: Double = 0.5, nStateBuckets: Int = 64,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.ProcessingTime("100 milliseconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val dedupStateDir = s"$stateDir/dedup"
    spark.readStream.schema(schema).parquet(sourceDir)
      .writeStream
      .queryName("graft_training_export")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val docs = batch.select(col(idCol), col(textCol)).dropDuplicates(idCol)
        if (!docs.isEmpty) {
          val incSigs = Dedup.minhashSigs(docs, idCol, textCol,
            shingleN, numHashes).dropDuplicates("id").persist()
          val incBuckets = Dedup.bandBuckets(incSigs, numHashes, bands)
            .persist()
          try {
            // partition-pruned probe of the shared sb=/bb= state layout
            // (Dedup.statePairsPlan scaladoc); materialized BEFORE the
            // state grows since the plan reads the state directories.
            // ONE state read serves probe AND growth (round-16 — the
            // streamingMinhashDedup rationale; each read is two driver
            // collects over the increment)
            val st = Dedup.readState(s, incSigs, incBuckets, dedupStateDir,
              nStateBuckets)
            val pairs = Dedup.statePairsPlan(incSigs, incBuckets, st,
              numHashes, minJaccard)
              .localCheckpoint(true)
            // pairs' blocks release in a finally scoped to its use: a
            // throw in the gates/clean checkpoint below used to skip the
            // release and pin the blocks for the life of the streaming
            // session, accumulating across failed batches
            val clean =
              try {
                // pairs are (a_id < b_id) with an incoming id in every
                // pair; id-ordered arrivals put every stored id below
                // every new id, so the b side is always the incoming doc
                // to drop — the min-id-keeps rule batch keepDecisions
                // applies
                val dropIds = pairs.select(col("b_id").as(idCol)).distinct()
                val kept = docs.join(dropIds, Seq(idCol), "left_anti")
                // state grows with kept AND dropped docs — chains must
                // keep collapsing across batches; replay healing and the
                // pruned self-filters are growState's contract
                Dedup.growState(s, incSigs, incBuckets, st, dedupStateDir,
                  nStateBuckets)
                // gates on the redacted text, x23's order, then the split
                // (pairs stays pinned until this materializes — kept
                // reads it through the dropIds anti-join)
                TextOps.piiScrub(kept, idCol, textCol)
                  .withColumn("lang_pred", TextOps.langId(col("redacted")))
                  .filter(col("lang_pred").isin(langs: _*))
                  .filter(TextOps.qualityScore(col("redacted")) >= minQuality)
                  .withColumn("_rep",
                    explode(array(TextOps.repetitionStats(col("redacted")))))
                  .filter(!TextOps.repetitive(col("_rep")))
                  .withColumn("split", TextOps.splitAssign(col(idCol)))
                  .select(col(idCol), col("redacted"), col("split"))
                  .localCheckpoint(true) // per-split packs share the gates
              } finally Dedup.releaseLocalCheckpoint(pairs)
            try {
              Seq("train", "val", "test").foreach { sp =>
                Pack.packIncremental(clean.filter(col("split") === sp),
                  idCol, "redacted", budget, s"$stateDir/pack/$sp")
                  .write.mode("overwrite")
                  .parquet(s"$outDir/split=$sp/batch=$batchId")
              }
            } finally Dedup.releaseLocalCheckpoint(clean)
          } finally { incSigs.unpersist(); incBuckets.unpersist() }
        }
      }
      .start()
  }
}
