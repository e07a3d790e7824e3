package graft.tools

import org.apache.spark.sql.functions._

/** Round-16 plan-evidence dumper (dev tooling): prints the
  * `.explain("formatted")` of the lex index build's internal doclens
  * roll-up under BOTH pre-shuffle keyings, so the claimed exchange
  * elimination ("repartition on (id, token) → dl0 re-shuffles by id" vs
  * "repartition on id → dl0 reuses the exchange") is auditable without
  * running Spark. The tf/dl0 column flow is exactly
  * [[graft.operators.LexIndexStore]] appendCorpus's.
  *
  * Usage: runMain graft.tools.PlanDump <outDir>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r16")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Harness.buildSession()
    val docs = graft.tables.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
    val nPart = spark.sessionState.conf.numShufflePartitions

    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name.txt"), s)
      val exchanges = s.linesIterator.count(_.contains("Exchange"))
      println(s"$name: $exchanges Exchange nodes")
    }

    // BEFORE (round ≤15): pre-shuffle on the exact grouping key — the
    // doclens roll-up's groupBy(id) needs a SECOND exchange
    val tfOld = graft.operators.Terms.tokens(docs, "doc_id", "text")
      .repartition(nPart, col("doc_id"), col("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    dump("lex_build_doclens_before",
      tfOld.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))

    // AFTER (round 16): pre-shuffle on the doc id alone — same per-task
    // agg-state bound, and the roll-up reuses the exchange
    val tfNew = graft.operators.Terms.tokens(docs, "doc_id", "text")
      .repartition(nPart, col("doc_id"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    dump("lex_build_doclens_after",
      tfNew.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl")))

    // Round-17 evidence: the tf pre-shuffle's PARTITION COUNT. The old
    // formula floored at spark.sql.shuffle.partitions (= cores on the
    // bench harness), so the exchange read `hashpartitioning(doc_id,
    // <cores>)` at any increment size; the new one derives the count
    // from the doc count (~2k docs/partition, cap 4096) — visible as the
    // literal partition count in the Exchange node.
    val nDocs = docs.count()
    val nOld = math.max(nPart, math.min(4096L, nDocs / 16384L).toInt)
    val nNew = math.max(1L, math.min(4096L, (nDocs + 2047L) / 2048L)).toInt
    dump("r17_lex_tf_partitions_before",
      graft.operators.Terms.tokens(docs, "doc_id", "text")
        .repartition(nOld, col("doc_id"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
    dump("r17_lex_tf_partitions_after",
      graft.operators.Terms.tokens(docs, "doc_id", "text")
        .repartition(nNew, col("doc_id"))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))

    spark.stop()
  }
}
