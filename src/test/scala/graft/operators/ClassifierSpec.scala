package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hashed-bow logistic quality classifier: held-out separation,
  * bit-identical retrains, map-only scoring plan, degenerate inputs.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // deterministic synthetic corpus: clean docs are word-salad from a
  // "good" vocabulary, spam docs append the template junk a trained
  // quality gate exists to catch
  private val good = Vector("data", "table", "query", "join", "filter",
    "window", "batch", "stream", "column", "vector", "merge", "scan")
  private val spamTail = " click here buy now free offer limited prize " +
    "winner cheap deal subscribe click here buy now free offer"

  private def doc(i: Long): String =
    (0 until 40).map(j => good(((i * 7 + j * 13) % good.size).toInt)).mkString(" ")

  private def corpus(n: Int) = (0L until n.toLong).map { i =>
    val spam = i % 3 == 0
    (i, if (spam) doc(i) + spamTail else doc(i), if (spam) 0.0 else 1.0)
  }.toDF("doc_id", "text", "label")

  test("held-out separation: every clean doc outscores every spam doc") {
    val all = corpus(90)
    val train = all.filter(col("doc_id") % 2 === 0)
    val holdout = all.filter(col("doc_id") % 2 === 1)
    val model = Classifier.trainQualityLr(train, "doc_id", "text", "label",
      dim = 2048, iters = 20, lr = 400.0)
    val scored = Classifier.score(holdout, "doc_id", "text", model)
      .join(holdout.select(col("doc_id"), col("label")), "doc_id")
      .collect().map(r => (r.getDouble(1), r.getDouble(3)))
    val clean = scored.filter(_._2 == 1.0).map(_._1)
    val spam = scored.filter(_._2 == 0.0).map(_._1)
    assert(clean.nonEmpty && spam.nonEmpty)
    assert(clean.min > spam.max,
      s"no margin between classes: clean=[${clean.min}, ${clean.max}] spam=[${spam.min}, ${spam.max}]")
    // the 0.5 keep-threshold actually splits them (not just ordinal
    // separation at 0.5±epsilon)
    assert(clean.min >= 0.5 && spam.max < 0.5,
      s"threshold does not separate: clean.min=${clean.min} spam.max=${spam.max}")
  }

  test("training is bit-deterministic: two runs, identical weights and scores") {
    val train = corpus(60)
    val m1 = Classifier.trainQualityLr(train, "doc_id", "text", "label",
      dim = 512, iters = 10, lr = 400.0)
    val m2 = Classifier.trainQualityLr(train.repartition(7), "doc_id", "text",
      "label", dim = 512, iters = 10, lr = 400.0)
    assert(m1.bias == m2.bias)
    assert(m1.weights.toSeq == m2.weights.toSeq)
  }

  test("scoring is map-only: no exchange, no join, weights ride the kernel") {
    val model = Classifier.BowLrModel(Array.fill(256)(0.1), -0.2)
    // a file-backed frame: a local Seq constant-folds to LocalTableScan
    // and would vacuously pass the no-exchange assertions
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = Classifier.score(docs, "doc_id", "text", model)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("hashed_bow_margin"), plan)
  }

  test("model persistence: save/load round-trip bit-identical, re-save refused") {
    val train = corpus(60)
    val m1 = Classifier.trainQualityLr(train, "doc_id", "text", "label",
      dim = 512, iters = 5, lr = 400.0)
    val path = java.nio.file.Files.createTempDirectory("bowlr_spec").toString
    Classifier.saveModel(spark, path, m1)
    val m2 = Classifier.loadModel(spark, path)
    assert(m2.bias == m1.bias)
    assert(m2.weights.toSeq == m1.weights.toSeq)
    // scores from the reloaded model are identical
    val docs = corpus(20).select("doc_id", "text")
    val s1 = Classifier.score(docs, "doc_id", "text", m1).collect().map(_.toString).toSeq
    val s2 = Classifier.score(docs, "doc_id", "text", m2).collect().map(_.toString).toSeq
    assert(s1 == s2)
    // retrains go to a new path
    intercept[IllegalArgumentException] {
      Classifier.saveModel(spark, path, m1)
    }
  }

  // three-domain synthetic corpus: shared background word-salad plus a
  // per-domain marker vocabulary — the separable structure a linear
  // domain classifier exists to learn
  private val domainMarkers = Map(
    "code" -> " def class import return lambda compile module array",
    "news" -> " reported officials announced minister government yesterday",
    "wiki" -> " encyclopedia references category citation disambiguation")
  private def domainCorpus(n: Int) = (0L until n.toLong).map { i =>
    val dom = Seq("code", "news", "wiki")((i % 3).toInt)
    (i, doc(i) + domainMarkers(dom), dom)
  }.toDF("doc_id", "text", "domain")

  test("softmax domains: held-out accuracy 100%, confident, bit-deterministic") {
    val all = domainCorpus(90)
    val train = all.filter(col("doc_id") % 2 === 0)
    val holdout = all.filter(col("doc_id") % 2 === 1)
    val model = Classifier.trainDomainSoftmax(train, "doc_id", "text",
      "domain", dim = 2048, iters = 20, lr = 1600.0)
    assert(model.labels.toSeq == Seq("code", "news", "wiki")) // sorted
    val scored = Classifier.scoreDomains(holdout, "doc_id", "text", model)
      .join(holdout.select(col("doc_id"), col("domain").as("_want")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getString(3)))
    assert(scored.length == 45)
    val wrong = scored.filter(r => r._2 != r._4)
    assert(wrong.isEmpty, s"misclassified held-out docs: ${wrong.toSeq}")
    // confident, not coin-flip argmax: every doc's winning class carries
    // a clear majority of the softmax mass
    assert(scored.forall(_._3 > 0.5),
      s"low-confidence verdicts: ${scored.filter(_._3 <= 0.5).toSeq}")
    // bit-deterministic retrain at different parallelism
    val m2 = Classifier.trainDomainSoftmax(train.repartition(7), "doc_id",
      "text", "domain", dim = 2048, iters = 20, lr = 1600.0)
    assert(m2.bias.toSeq == model.bias.toSeq)
    assert(m2.weights.map(_.toSeq).toSeq == model.weights.map(_.toSeq).toSeq)
  }

  test("softmax model persistence: save/load round-trip bit-identical, re-save refused") {
    val train = domainCorpus(60)
    val m1 = Classifier.trainDomainSoftmax(train, "doc_id", "text", "domain",
      dim = 512, iters = 5, lr = 1600.0)
    val path = java.nio.file.Files.createTempDirectory("bowsm_spec").toString
    Classifier.saveSoftmaxModel(spark, path, m1)
    val m2 = Classifier.loadSoftmaxModel(spark, path)
    assert(m2.labels.toSeq == m1.labels.toSeq)
    assert(m2.bias.toSeq == m1.bias.toSeq)
    assert(m2.weights.map(_.toSeq).toSeq == m1.weights.map(_.toSeq).toSeq)
    val docs = domainCorpus(20).select("doc_id", "text")
    val s1 = Classifier.scoreDomains(docs, "doc_id", "text", m1)
      .collect().map(_.toString).sorted.toSeq
    val s2 = Classifier.scoreDomains(docs, "doc_id", "text", m2)
      .collect().map(_.toString).sorted.toSeq
    assert(s1 == s2)
    intercept[IllegalArgumentException] {
      Classifier.saveSoftmaxModel(spark, path, m1)
    }
  }

  test("softmax scoring is map-only; null text lands at the bias argmax") {
    val model = Classifier.BowSoftmaxModel(Array("a", "b", "c"),
      Array.fill(3)(Array.fill(256)(0.1)), Array(-0.2, 0.4, 0.1))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val scored = Classifier.scoreDomains(docs, "doc_id", "text", model)
    val plan = scored.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("hashed_bow_margins"), plan)
    // null text ⇒ all-zero margins ⇒ the bias decides: argmax b = class
    // "b", confidence = softmax(bias)("b"), never a null verdict
    val out = Classifier.scoreDomains(
      Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", model).orderBy("doc_id")
      .collect().map(r => (r.getString(1), r.getDouble(2)))
    val z = math.exp(-0.2 - 0.4) + 1.0 + math.exp(0.1 - 0.4)
    val want = math.rint(1.0 / z * 1e4) / 1e4
    assert(out.toSeq == Seq(("b", want), ("b", want)), out.toSeq.toString)
  }

  test("degenerate inputs: empty text scores sigmoid(bias); empty training fails fast") {
    val model = Classifier.BowLrModel(Array.fill(64)(5.0), 0.4)
    val out = Classifier.score(Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text", model).collect().map(_.getDouble(1))
    val expect = math.rint(1.0 / (1.0 + math.exp(-0.4)) * 1e4) / 1e4
    assert(out.toSeq == Seq(expect, expect), out.toSeq.toString)
    // NULL text behaves exactly like empty text — the documented
    // textless-doc contract (σ(bias)), never a null score + null keep
    // that a downstream keep-filter would drop in an undefined way
    val withNull = Classifier.score(
      Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", model).orderBy("doc_id")
      .collect().map(r => (r.getDouble(1), r.getBoolean(2)))
    assert(withNull.toSeq == Seq((expect, expect >= 0.5), (expect, expect >= 0.5)),
      withNull.toSeq.toString)
    intercept[IllegalArgumentException] {
      Classifier.trainQualityLr(Seq((1L, " ", 1.0)).toDF("doc_id", "text", "label"),
        "doc_id", "text", "label", dim = 64, iters = 1)
    }
  }
}
