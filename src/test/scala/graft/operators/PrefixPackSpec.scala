package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed prefix sum + sequence packing + LOCF resample. */
class PrefixPackSpec extends SparkSpec {

  import spark.implicits._

  test("cumsumLongByKey matches the per-key window under a dominant key") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 90% of rows in one key — the skew a window PARTITION BY would put
    // on a single task; the range-partitioned scan must not care
    val df = (1 to 900).map(i => ("big", i.toLong, (i % 13).toLong)) ++
      (1 to 60).map(i => ("s" + (i % 3), 1000L + i, (i % 7).toLong))
    val d = df.toDF("k", "id", "v").repartition(11)
    val got = Prefix.cumsumLongByKey(d, "k", Seq(col("id")), "v", "cum",
        numPartitions = 7)
      .select("k", "id", "cum").as[(String, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    val w = Window.partitionBy("k").orderBy("id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = d.withColumn("cum", sum(col("v")).over(w))
      .select("k", "id", "cum").as[(String, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    assert(got.toSeq == want.toSeq)
    // descending order expressions work too (the budget-select shape)
    val gotDesc = Prefix.cumsumLongByKey(d, "k", Seq(col("id").desc), "v",
        "cum", numPartitions = 5)
      .select("k", "id", "cum").as[(String, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    val wDesc = Window.partitionBy("k").orderBy(col("id").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wantDesc = d.withColumn("cum", sum(col("v")).over(wDesc))
      .select("k", "id", "cum").as[(String, Long, Long)].collect()
      .sortBy(t => (t._1, t._2))
    assert(gotDesc.toSeq == wantDesc.toSeq)
  }

  test("cumsumLongByKey: null key and the literal string \"null\" stay " +
    "separate groups") {
    // String.valueOf-based keying collapsed these into one group with
    // shared running offsets (ADVICE r9); encodeKey must keep them apart
    val d = Seq(
      (Option.empty[String], 1L, 10L), (Option.empty[String], 2L, 10L),
      (Some("null"), 3L, 5L), (Some("null"), 4L, 5L)
    ).toDF("k", "id", "v")
    val got = Prefix.cumsumLongByKey(d, "k", Seq(col("id")), "v", "cum",
        numPartitions = 3)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 10L, 2L -> 20L, 3L -> 5L, 4L -> 10L),
      s"null-key group leaked into the 'null'-string group: $got")
  }

  test("cumsumLongByKey: high-cardinality key fails fast naming the " +
    "bounded-key contract") {
    // doc-level ids violate the driver-bounded totals contract; the cap
    // must raise a diagnostic instead of silently growing driver state
    val d = spark.range(Prefix.MaxKeyedTotals + 10L)
      .select(col("id").cast("string").as("k"), col("id"),
        lit(1L).as("v"))
    val e = intercept[IllegalArgumentException] {
      Prefix.cumsumLongByKey(d, "k", Seq(col("id")), "v", "cum",
        numPartitions = 4)
    }
    assert(e.getMessage.contains("bounded-key contract"), e.getMessage)
  }

  test("budgetSelect: best-first fill, exact budget edge, allowlist drop") {
    import org.apache.spark.sql.functions._
    // quality = n_chars proxy column; src a: budget fits exactly the two
    // best docs; src b: budget 0 keeps nothing; src c unlisted drops
    val docs = Seq(
      (1L, "a", "w x y z", 40L),   // 4 tokens, quality 40
      (2L, "a", "w x y", 30L),     // 3 tokens, quality 30
      (3L, "a", "w x", 20L),       // 2 tokens — would overflow budget 7
      (4L, "b", "w", 10L),
      (5L, "c", "w w", 99L)
    ).toDF("doc_id", "source", "text", "q")
    val kept = TextOps.budgetSelect(docs, "doc_id", "source", "text",
        Map("a" -> 7L, "b" -> 0L), quality = col("q"))
      .select("doc_id", "cum_tokens").as[(Long, Long)].collect().toMap
    assert(kept == Map(1L -> 4L, 2L -> 7L),
      s"expected best-first exact fill, got $kept")
  }

  test("cumsumLong matches the single-partition window formulation") {
    val df = (1 to 997).map(i => (i.toLong, ((i * 7919) % 23).toLong))
      .toDF("id", "v")
    val got = Prefix.cumsumLong(df, Seq("id"), "v", "cum", numPartitions = 7)
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val want = df
      .withColumn("cum", sum("v").over(
        Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("cumsumLong keeps the data distributed (no single-partition collapse)") {
    val df = (1 to 500).map(i => (i.toLong, 1L)).toDF("id", "v")
    val out = Prefix.cumsumLong(df, Seq("id"), "v", "cum", numPartitions = 6)
    assert(out.rdd.getNumPartitions > 1)
    // nulls count as 0
    val withNull = Seq((1L, Some(5L)), (2L, None), (3L, Some(2L)))
      .toDF("id", "v")
    val cums = Prefix.cumsumLong(withNull, Seq("id"), "v", "cum")
      .orderBy("id").select("cum").as[Long].collect().toSeq
    assert(cums == Seq(5L, 5L, 7L))
  }

  test("packSequences: spans tile the token stream exactly, docs straddle budgets") {
    // 3 docs of 5, 7, 4 tokens; budget 6 → stream of 16 tokens, seqs 0..2
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "f g h i j k l"),
      (3L, "m n o p"),
      (4L, "   ")). // zero tokens — dropped
      toDF("doc_id", "text")
    val out = Pack.packSequences(docs, "doc_id", "text", budget = 6)
      .orderBy("doc_id", "seq_id")
      .select("doc_id", "seq_id", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 5L),            // doc1 tokens 0-4 → seq0
      (2L, 0L, 0L, 1L),            // doc2 token 0 completes seq0
      (2L, 1L, 1L, 7L),            // doc2 tokens 1-6 fill seq1
      (3L, 2L, 0L, 4L)))           // doc3 entirely in seq2
    // spans tile: per-seq token mass is exactly budget (except the last)
    val perSeq = out.groupBy(_._2).view.mapValues(_.map(s => s._4 - s._3).sum).toMap
    assert(perSeq == Map(0L -> 6L, 1L -> 6L, 2L -> 4L))
  }

  test("renderSequences: manifest reconstructs the exact token stream") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "f g h i j k l"),
      (3L, "m n o p")).toDF("doc_id", "text")
    val got = Pack.renderSequences(
      Pack.packSequences(docs, "doc_id", "text", budget = 6),
      docs, "doc_id", "text")
      .orderBy("seq_id")
      .select("seq_id", "n_toks", "seq_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 6L, "a b c d e f"),     // doc1 whole + doc2's first token
      (1L, 6L, "g h i j k l"),     // doc2's tail fills seq1 exactly
      (2L, 4L, "m n o p")))        // trailing partial sequence
  }

  test("packIncremental: increments reproduce the full pack; out-of-order rejected") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "f g h i j k l"),
      (3L, "m n o p"),
      (4L, "q r s")).toDF("doc_id", "text")
    val full = Pack.packSequences(docs, "doc_id", "text", budget = 6)
      .orderBy("doc_id", "seq_id").collect().toSeq
    val state = java.nio.file.Files.createTempDirectory("packstate").toString
    val inc1 = Pack.packIncremental(docs.filter($"doc_id" <= 2),
      "doc_id", "text", budget = 6, state)
    val inc2 = Pack.packIncremental(docs.filter($"doc_id" > 2),
      "doc_id", "text", budget = 6, state)
    val got = inc1.unionByName(inc2).orderBy("doc_id", "seq_id").collect().toSeq
    assert(got == full)
    // a lower id than the stored maximum must be refused, not mispacked
    val ex = intercept[IllegalArgumentException] {
      Pack.packIncremental(docs.filter($"doc_id" === 1L),
        "doc_id", "text", budget = 6, state)
    }
    assert(ex.getMessage.contains("out of order"))
    // empty increment: no spans, state untouched (next real increment fine)
    assert(Pack.packIncremental(docs.filter($"doc_id" > 99),
      "doc_id", "text", budget = 6, state).isEmpty)
  }

  test("packIncremental: exact replay re-derives identical spans without advancing") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h i j k l"),
      (3L, "m n o p"), (4L, "q r s")).toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("packstate").toString
    val inc1 = Pack.packIncremental(docs.filter($"doc_id" <= 2),
      "doc_id", "text", budget = 6, state).collect().toSeq
    // crash-retry: the SAME increment replays before anything newer lands
    val replay = Pack.packIncremental(docs.filter($"doc_id" <= 2),
      "doc_id", "text", budget = 6, state).collect().toSeq
    assert(replay == inc1)
    // and the state did not advance: the next real increment still
    // continues from the first increment's high-water
    val inc2 = Pack.packIncremental(docs.filter($"doc_id" > 2),
      "doc_id", "text", budget = 6, state).collect().toSeq
    val full = Pack.packSequences(docs, "doc_id", "text", budget = 6)
      .collect().toSeq
    def tup(rs: Seq[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted
    assert(tup(inc1 ++ inc2) == tup(full))
    // a PARTIAL overlap is neither fresh nor a replay — refused
    val ex = intercept[IllegalArgumentException] {
      Pack.packIncremental(docs.filter($"doc_id" >= 2),
        "doc_id", "text", budget = 6, state)
    }
    assert(ex.getMessage.contains("out of order"))
  }

  test("packIncremental: same id range with different content is NOT a replay — refused") {
    val docs = Seq((1L, "a b c d e"), (2L, "f g h i j k l"))
      .toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("packstate").toString
    Pack.packIncremental(docs, "doc_id", "text", budget = 6, state)
    // a batch that happens to share the last increment's [min,max] id
    // range but carries different text: accepting it as an "exact
    // replay" would pack different token counts against the previous
    // base and silently mis-offset every later span
    val poisoned = Seq((1L, "a b"), (2L, "c d e"))
      .toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Pack.packIncremental(poisoned, "doc_id", "text", budget = 6, state)
    }
    assert(ex.getMessage.contains("not a replay"), ex.getMessage)
    // and the true replay still passes after the refused attempt
    val replay = Pack.packIncremental(docs, "doc_id", "text", budget = 6, state)
    assert(replay.count() > 0)
  }

  test("packIncremental: non-integral id column refused with a clear message") {
    val docs = Seq(("d1", "a b c")).toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("packstate").toString
    val ex = intercept[IllegalArgumentException] {
      Pack.packIncremental(docs, "doc_id", "text", budget = 6, state)
    }
    assert(ex.getMessage.contains("integral id"), ex.getMessage)
  }

  test("packIncremental: legacy raw state file honored once, upgraded to the manifest log") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "f g h i j k l"),
      (3L, "m n o p"), (4L, "q r s")).toDF("doc_id", "text")
    val state = java.nio.file.Files.createTempDirectory("packstate").toString
    // seed the modern state with increment 1, then rewrite it as the
    // PRE-MANIFEST raw file (prevBase=0 highWater=12 maxId=2 lastMinId=1)
    val inc1 = Pack.packIncremental(docs.filter($"doc_id" <= 2),
      "doc_id", "text", budget = 6, state).collect().toSeq
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$state/_pack_state_log"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$state/_pack_state"),
      "0 12 2 1".getBytes("UTF-8"))
    // the next increment continues from the legacy high-water…
    val inc2 = Pack.packIncremental(docs.filter($"doc_id" > 2),
      "doc_id", "text", budget = 6, state).collect().toSeq
    def tup(rs: Seq[org.apache.spark.sql.Row]) = rs.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sorted
    val full = Pack.packSequences(docs, "doc_id", "text", budget = 6)
      .collect().toSeq
    assert(tup(inc1 ++ inc2) == tup(full))
    // …and the write retired the raw file in favor of the manifest log
    assert(!new java.io.File(s"$state/_pack_state").exists(),
      "legacy raw state file not retired after the manifest-log write")
    assert(new java.io.File(s"$state/_pack_state_log/_manifests").isDirectory,
      "manifest state log not created")
  }

  test("streamingPack: micro-batch arrivals equal the one-shot pack") {
    val docs = (1 to 200).map(i =>
      (i.toLong, Seq.fill(1 + i % 9)("w" + i).mkString(" ")))
      .toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("packstream").toString
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("packarr").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(s"$src/$name"))
    }
    land(docs.filter($"doc_id" <= 80), "a1.parquet")
    val q = Pack.streamingPack(spark, src, docs.schema, "doc_id", "text",
      budget = 32, s"$base/state", s"$base/out", s"$base/ckpt")
    try {
      q.processAllAvailable()
      land(docs.filter($"doc_id" > 80 && $"doc_id" <= 150), "a2.parquet")
      q.processAllAvailable()
      land(docs.filter($"doc_id" > 150), "a3.parquet")
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("doc_id", "seq_id", "tok_start", "tok_end", "n_toks")
      .orderBy("doc_id", "seq_id").collect().toSeq
    val want = Pack.packSequences(docs, "doc_id", "text", budget = 32)
      .orderBy("doc_id", "seq_id").collect().toSeq
    assert(got == want)
  }

  test("vocabTopK + tfidfTopTerms: counts, tie-breaks, smoothed idf") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple cherry cherry date")).toDF("doc_id", "text")
    val vocab = Terms.vocabTopK(docs, "doc_id", "text", k = 3)
      .as[(String, Long)].collect().toSeq
    // apple 3, cherry 3 (tie → alphabetical), banana 2
    assert(vocab == Seq(("apple", 3L), ("cherry", 3L), ("banana", 2L)))
    val tfidf = Terms.tfidfTopTerms(docs, "doc_id", "text", k = 1)
      .orderBy("doc_id")
      .select("doc_id", "term", "tf", "df", "rank")
      .as[(Long, String, Long, Long, Long)].collect().toSeq
    // doc1: apple tf=2·ln(4/3) beats banana; doc2: tf=1 df=2 twice →
    // tie → banana (alphabetical); doc3: date 1·ln(2)=0.693 beats
    // cherry 2·ln(4/3)=0.575 — rarity outweighs the extra occurrence
    assert(tfidf == Seq((1L, "apple", 2L, 2L, 1L),
      (2L, "banana", 1L, 2L, 1L), (3L, "date", 1L, 1L, 1L)))
  }

  test("unigramLogprob: corpus-model -ln p averaged per doc, rare tokens score high") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val got = Terms.unigramLogprob(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double)].collect().toSeq
    // total=5; p(a)=p(b)=2/5 → -ln=0.916291; p(c)=1/5 → 1.609438
    // doc1 = avg(.916291, .916291, .916291) = 0.9163
    // doc2 = avg(.916291, 1.609438) = 1.262865 → 1.2629
    assert(got == Seq((1L, 3L, 0.9163), (2L, 2L, 1.2629)))
  }

  test("resampleLocf: carries latest value, max-id tie-break, leading null") {
    val ev = Seq(
      (1L, 100L, 10L, 1.0),   // user 10
      (2L, 250L, 10L, 2.0),
      (3L, 250L, 10L, 3.0),   // same ts as id 2 — tie-break picks id 3
      (5L, 310L, 10L, 5.0),   // extends the grid through 300
      (4L, 90L, 20L, 9.0))    // user 20, single event after its grid floor
      .toDF("event_id", "ts", "user_id", "value")
    val out = Resample.resampleLocf(ev, "user_id", "ts", "value",
      step = 100L, tieBreak = "event_id")
      .select("user_id", "grid_ts", "value", "src_event_id")
      .as[(Long, Long, Option[Double], Option[Long])].collect().toSeq.sorted
    assert(out == Seq(
      (10L, 100L, Some(1.0), Some(1L)),
      (10L, 200L, Some(1.0), Some(1L)),   // LOCF across the gap
      (10L, 300L, Some(3.0), Some(3L)),   // tie resolved to max event_id
      (20L, 0L, None, None)).sorted)      // grid floor precedes first event
  }
}
