package graft

import org.apache.spark.sql.SparkSession

/** The cluster-wide installation contract: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` must expose EVERY
  * custom kernel through plain `spark.sql` — no Column-wrapper call to
  * trigger the lazy registration. This drives each injected function
  * end to end in an extension-built session (same SparkContext, fresh
  * SparkSession), pinning both that the installer stays in lockstep
  * with the lazily-registered set and that each builder wires its
  * argument positions correctly (a swapped litInt/expr slot parses fine
  * and fails only at execution).
  */
class GraftExtensionsSpec extends SparkSpec {

  private def withExtSession[T](f: SparkSession => T): T = {
    // force the suite session FIRST: reading it after the clears would
    // re-register it as default and getOrCreate would return it
    val master = spark.sparkContext.master
    val prev = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // reuses the suite's SparkContext; extensions apply to the NEW
    // session only. `spark.sql.extensions` is a STATIC conf read from
    // the SparkContext at session build — unreachable when reusing the
    // suite's context — so the builder's withExtensions hook (the same
    // injection path the static conf routes through) is what a
    // same-JVM test can exercise.
    val ext = SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    assert(ext ne spark, "builder returned the suite session — extensions untested")
    try f(ext)
    finally {
      prev.foreach(SparkSession.setDefaultSession)
      prev.foreach(SparkSession.setActiveSession)
    }
  }

  test("every injected function is callable from plain spark.sql with correctly wired args") {
    withExtSession { s =>
      def one(sql: String): Any = s.sql(s"SELECT $sql").head().get(0)
      // wire-format kernels (a real wire line; malformed parses to null)
      assert(one("parse_pyline(\"['CarData.z', 'eJxLSk3KBAAD3gGi', " +
        "'2025-05-17T13:59:20.6797217Z']\")") != null)
      assert(one("inflate_raw(CAST(NULL AS BINARY))") == null) // null-safe path
      // text/dedup kernels
      assert(one("size(shingle_hashes('a b c', 2))") == 2)
      assert(one("size(minhash_signature(shingle_hashes('a b c', 2), 8))") == 8)
      assert(one("simhash64('a b c')") != null)
      assert(one("sig_agreement(array(1L, 2L), array(1L, 3L))") != null)
      assert(one("size(shingle_hash_seq('a b c', 2))") == 2)
      assert(one("token_gram('alpha beta gamma', 2, 0)") == "alpha beta")
      val rep = one("repetition_stats('a a a a')")
      assert(rep != null)
      assert(one("pii_scan('reach me at a@b.com ok')") != null)
      assert(one("stopword_ratios('the cat and the hat')") != null)
      assert(one("lang_id('the quick brown fox jumps over the lazy dog')") != null)
      // vector kernels (array<float> inputs)
      val vf = "CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)"
      assert(one(s"vec_dot($vf, $vf)") != null)
      assert(one(s"hyperplane_bucket($vf, 4)") != null)
      val cents = "array(array(1.0D, 0.0D), array(0.0D, 1.0D))"
      assert(one(s"element_at(nearest_centroids($vf, $cents, 1), 1)") == 1) // 1-based list ids
      assert(one(s"size(adaptive_nearest_centroids($vf, $cents, 1, 2, 0.5D)) >= 1")
        == true)
      val cb = "array(array(0.0D, 0.0D), array(1.0D, 1.0D))"
      assert(one(s"size(pq_encode($vf, $cb, 1, 2)) = 1") == true)
      assert(one(s"size(pq_lut($vf, $cb, 1, 2)) = 2") == true)
      assert(one(s"pq_adc(pq_encode($vf, $cb, 1, 2), pq_lut($vf, $cb, 1, 2), 2)")
        != null)
      assert(one(s"size(sq8_encode($vf, array(0.0D, 0.0D), array(1.0D, 1.0D))) = 2")
        == true)
      val enc = s"sq8_encode($vf, array(0.0D, 0.0D), array(1.0D, 1.0D))"
      assert(one(s"sq8_dot($vf, $enc, array(0.0D, 0.0D), array(1.0D, 1.0D))")
        != null) // (query vec, codes) — not codes twice
      assert(one(s"sq8_norm($enc, array(0.0D, 0.0D), array(1.0D, 1.0D))") != null)
      // classifier / tokenizer kernels
      assert(one("size(hashed_bow_ids('a b', 16)) = 3") == true) // 2 uni + 1 bi
      assert(one("hashed_bow_margin('a b', array(0.5D, 0.5D))") == 0.5)
      assert(one("size(hashed_bow_margins('a b', array(0.5D, 0.5D, 1.5D, 1.5D), 2)) = 2")
        == true)
      assert(one("wordpiece_encode('ab', array('a', '##b'))")
        .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("a", "##b"))
      assert(one("unigram_viterbi('ab', array('a', 'b'), array(-1.0D, -1.0D), 1, -10.0D)")
        != null)
      assert(one("merge_fold(array('a', 'b', 'c'), array('a', 'b'), false)")
        .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("ab", "c"))
      assert(one("merge_fold(array('a', '##b'), array('a', '##b'), true)")
        .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("ab"))
      // binary-quantization kernels
      assert(one(s"size(sign_pack($vf)) = 1") == true)
      assert(one(s"hamming_dist(sign_pack($vf), sign_pack($vf))") == 0)
      assert(one(s"hamming_dist(sign_pack($vf), " +
        "sign_pack(CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)))") == 2)
      // the aggregate kernel (the repo's first injected AggregateFunction)
      assert(one("size(mg_topk('x', 4)) = 1") == true)
    }
  }

  test("table-valued functions are installed: wrong-arity call names the contract") {
    withExtSession { s =>
      // existence + arg validation without index setup: the builder must
      // be reached (an uninstalled TVF fails with unresolved-routine)
      val e = intercept[Exception](
        s.sql("SELECT * FROM ann_topk('nope')").collect())
      assert(e.getMessage.contains("7 or 8 arguments"))
      val e2 = intercept[Exception](
        s.sql("SELECT * FROM dedup_keep('nope')").collect())
      assert(e2.getMessage.contains("7 arguments"))
      // the round-15 cleaning family rides the extensions route too
      val e3 = intercept[Exception](
        s.sql("SELECT * FROM pii_scrub('nope')").collect())
      assert(e3.getMessage.contains("3 arguments"))
      val e4 = intercept[Exception](
        s.sql("SELECT * FROM containment_decontaminate('nope')").collect())
      assert(e4.getMessage.contains("8 arguments"))
      val e5 = intercept[Exception](
        s.sql("SELECT * FROM semdedup_keep('nope')").collect())
      assert(e5.getMessage.contains("6 arguments"))
      val e6 = intercept[Exception](
        s.sql("SELECT * FROM decontaminate('nope')").collect())
      assert(e6.getMessage.contains("7 or 8 arguments"))
      val e7 = intercept[Exception](
        s.sql("SELECT * FROM mix_sample('nope')").collect())
      assert(e7.getMessage.contains("4 arguments"))
      val e8 = intercept[Exception](
        s.sql("SELECT * FROM split_assign('nope')").collect())
      assert(e8.getMessage.contains("2 or 3 arguments"))
    }
  }
}
