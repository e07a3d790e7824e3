package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** WordPiece training (likelihood-scored merges) + MaxMatch encoding:
  * hand-computed merge order on a fixture where likelihood and raw
  * frequency DISAGREE, the BERT [UNK]/longest-match contracts, exact
  * round-trips, bit-determinism, and the map-only encode plan.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  test("merge order follows likelihood score, not raw pair frequency") {
    // (x,##y) occurs 10x but over common symbols: score 10/(10*10)=0.1;
    // (q,##z) occurs 4x over rare symbols: score 4/(4*4)=0.25 — WordPiece
    // must pick qz FIRST where frequency-ranked BPE would pick xy
    val docs = Seq(((("xy " * 10) + ("qz " * 4)).trim)).toDF("text")
    val m = WordPiece.train(docs, "text", numMerges = 2, mergesPerRound = 1)
    val merges = m.merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(merges.toSeq == Seq(("q", "##z", "qz", 4L), ("x", "##y", "xy", 10L)),
      merges.toSeq.toString)
    // BPE on the same corpus picks by frequency — the families really
    // differ on this fixture
    val bpe = Bpe.train(docs, "text", numMerges = 1, mergesPerRound = 1)
    assert(bpe.merges.orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq == Seq(("x", "y")))
  }

  test("MaxMatch encoding: longest match, continuation semantics, [UNK] contract") {
    val docs = Seq(((("xy " * 10) + ("qz " * 4) + ("xyy " * 2)).trim)).toDF("text")
    // numMerges=2 learns {qz, xy} but NOT the (xy,##y) fusion — so "xyy"
    // is absent from the vocab and must segment by longest-match
    val model = WordPiece.train(docs, "text", numMerges = 2, mergesPerRound = 1)
    def enc(word: String): Seq[String] = {
      val out = WordPiece.encode(Seq((1L, word)).toDF("id", "t"), "id", "t", model)
        .select("pieces").head().getSeq[String](0)
      out
    }
    assert(enc("xy") == Seq("xy"))
    assert(enc("xyy") == Seq("xy", "##y")) // longest-match-first: xy before x
    // q was only ever word-INITIAL: "##q"/"##qz" are not vocab pieces, so
    // qz mid-word CANNOT match — the whole token degrades to [UNK], the
    // BERT behavior (never a silently wrong segmentation)
    assert(enc("xyqz") == Seq("[UNK]"))
    // a character never seen at all → [UNK]
    assert(enc("xw") == Seq("[UNK]"))
    // every TRAINED word encodes UNK-free and round-trips exactly
    val rt = WordPiece.encode(docs.select(lit(1L).as("id"), col("text").as("t")),
      "id", "t", model)
      .withColumn("glued", array_join(transform(col("pieces"),
        p => regexp_replace(p, "^##", "")), ""))
    assert(rt.filter(col("unk")).isEmpty)
    assert(rt.filter(col("glued") =!= col("word")).isEmpty)
  }

  test("real-corpus round-trip + bit-determinism at different parallelism") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 200).select("doc_id", "text")
    val m1 = WordPiece.train(docs, "text", numMerges = 24, mergesPerRound = 8)
    val m2 = WordPiece.train(docs.repartition(7), "text",
      numMerges = 24, mergesPerRound = 8)
    val s1 = m1.merges.orderBy("rank").collect().map(_.toString).toSeq
    val s2 = m2.merges.orderBy("rank").collect().map(_.toString).toSeq
    assert(s1 == s2, "merge sequence drifted with parallelism")
    // full-corpus encode round-trips on every non-UNK token; trained
    // words never go UNK (chars all in vocab by construction)
    val enc = WordPiece.encode(docs, "doc_id", "text", m1)
      .withColumn("glued", array_join(transform(col("pieces"),
        p => regexp_replace(p, "^##", "")), ""))
    assert(enc.filter(col("unk")).isEmpty)
    assert(enc.filter(col("glued") =!= col("word")).isEmpty)
    // merged pieces actually used: at least one multi-char segmentation
    assert(enc.filter(size(col("pieces")) < length(col("word")) &&
      size(col("pieces")) > 1).count() > 0)
  }

  test("encode is map-only: vocab rides the kernel, no exchange, no join") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 100).select("doc_id", "text")
    val model = WordPiece.train(docs, "text", numMerges = 8, mergesPerRound = 8)
    val plan = WordPiece.encode(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("wordpiece_encode"), plan)
  }
}
