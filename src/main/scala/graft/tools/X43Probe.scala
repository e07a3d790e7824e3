package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Pack, TextOps}
import graft.queries.ExtensionQueries
import graft.tables.Tables

/** Variance probe for x43 (the LSH → CC → gates → pack composition whose
  * round-8 bench wall time swung 3.6–21.4 s run to run). Runs the full
  * registry entry N times in one JVM (the bench's execution shape), then
  * one staged breakdown attributing wall time to signatures / candidate
  * pairs / connected components / gates / the three per-split packs.
  * Prints one JSON line; per-stage numbers land in BASELINE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.X43Probe [reps]
  */
object X43Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = if (args.nonEmpty) args(0).toInt else 6
    val spark = Harness.buildSession()

    def sec[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // full-entry repetitions, the bench's measurement (warm-up rep 0
    // excluded from the spread like Bench's warm-up pass)
    val fn = graft.SparkEntry.queries("x43_training_export")
    val runs = (0 to reps).map { _ =>
      val (t, _) = sec {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      Harness.releaseAllPinned(spark)
      t
    }.drop(1)

    // staged breakdown (one pass; stages share persisted inputs the way
    // the real plan does, so times attribute marginal cost per stage)
    val corpus = ExtensionQueries.plantBoilerplate(
      ExtensionQueries.plantPii(ExtensionQueries.plantTextDups(
        Tables.documents(spark, sfDir)))).localCheckpoint(true)
    val (tSigs, sigs) = sec {
      val s = Dedup.minhashLsh(corpus, "doc_id", "text",
        shingleN = 3, numHashes = 32, bands = 8, minJaccard = 0.5)
      s.persist().count()
      s
    }
    val pairs = sigs // minhashLsh output (pairs) persisted above
    val (tCc, verdicts) = sec {
      val v = Dedup.keepDecisions(corpus, "doc_id", pairs).persist()
      v.count()
      v
    }
    val (tGates, clean) = sec {
      val kept = corpus.join(
        verdicts.filter(!col("keep")).select("doc_id"), Seq("doc_id"), "left_anti")
      val c = TextOps.piiScrub(kept, "doc_id", "text")
        .withColumn("lang_pred", TextOps.langId(col("redacted")))
        .filter(col("lang_pred").isin("en", "es", "fr", "de"))
        .filter(TextOps.qualityScore(col("redacted")) >= 0.5)
        .withColumn("_rep", explode(array(TextOps.repetitionStats(col("redacted")))))
        .filter(!TextOps.repetitive(col("_rep")))
        .withColumn("split", TextOps.splitAssign(col("doc_id")))
        .select(col("doc_id"), col("redacted"), col("split"))
        .localCheckpoint(true)
      c
    }
    val (tPacks, _) = sec {
      Seq("train", "val", "test").foreach { sp =>
        Pack.packSequences(clean.filter(col("split") === sp),
          "doc_id", "redacted", budget = 256)
          .agg(count(lit(1))).collect()
      }
    }
    Harness.releaseAllPinned(spark)

    val rs = runs.map(t => f"$t%.3f").mkString("[", ",", "]")
    println(f"""{"probe":"x43","runs":$rs,"min":${runs.min}%.3f,""" +
      f""""max":${runs.max}%.3f,"spread":${runs.max / runs.min}%.2f,""" +
      f""""stages":{"lsh":$tSigs%.3f,"cc":$tCc%.3f,"gates":$tGates%.3f,""" +
      f""""packs":$tPacks%.3f},"sf":"$sfDir"}""")
    spark.stop()
  }
}
