package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics: vocabulary heavy-hitters and per-document
  * TF-IDF top terms — the relational formulations of the two passes a
  * tokenizer-training / relevance pipeline runs over a corpus.
  *
  * Scale posture: token explosion is per-row (`explode` after the scan,
  * no pre-shuffle fan-out); counts partial-aggregate map-side before
  * their one exchange; the top-k is `TakeOrderedAndProject` (per-
  * partition heaps, never a global sort). TF-IDF joins term→df through
  * the term-count table, which at 100 TB is Zipf-skewed — the join key
  * is the TERM, so AQE's skew split applies, and the per-doc rank window
  * shuffles on doc_id (uniform). The doc-count scalar rides a 1-row
  * broadcast, the same pattern as CoreQueries q03.
  *
  * No reference analogue (SURVEY §2.11 text-analysis family).
  */
object Terms {

  /** Exact 4-decimal HALF_UP average of a `DECIMAL(28,6)` sum over a
    * long count, computed in INTEGER space. `round(sum_double / n, 4)`
    * is a cross-engine seam: when the true rational sum/n is EXACTLY a
    * 4-decimal midpoint (found live at sf0.1: 238.878000/72 = 3.31775),
    * no double represents it — Spark's BigDecimal-of-the-double rounds
    * the below-midpoint double DOWN while DuckDB's scale-multiply
    * re-rounds onto the midpoint and goes UP. Integer space has no such
    * seam: with S the micro-unit sum (exact, the DECIMAL ×10⁶),
    * HALF_UP at 4 decimals = sign(S) · ((|S| + 50n) div (100n)), then
    * /10⁴ (one exact-input IEEE division, identical on both engines).
    * Sign-aware because HALF_UP rounds away from zero (DSIR scores go
    * negative); `+ 0.0` canonicalizes the negative zero sign(S)·0
    * would leave. The DuckDB oracle mirror is
    * `sign(S) * ((abs(S) + 50*n) // (100*n)) / 10000.0 + 0.0`.
    */
  private[graft] def avgRound4(s: Column, n: Column): Column = {
    val sMicro = (s * lit(1000000)).cast("long")
    val num = abs(sMicro) + lit(50L) * n
    val den = lit(100L) * n
    // true integer division (IntegralDivide) — exact for ALL long
    // operands. (A double-division floor would instead require the
    // OPERANDS, not the quotient, to fit in 2^53: |sMicro| + 50n
    // ≥ 2^53 would let the truncated quotient drift by 1.)
    val q = call_function("div", num, den)
    (signum(sMicro.cast("double")) * q.cast("double") / 10000.0) + lit(0.0)
  }

  /** Exact 4-decimal HALF_UP of a non-negative integer ratio `k / m` as
    * DOUBLE — `round(k/m, 4)` without the double-round midpoint seam:
    * a k/m whose double sits a hair off a 4-decimal midpoint re-rounds
    * differently under Spark's BigDecimal-of-the-double and DuckDB's
    * scale-multiply (the [[avgRound4]] hazard class, round 12). Here the
    * quotient q = (10⁴·k + m div 2) div m is computed in exact integer
    * arithmetic: for even m an exact midpoint lands on the +m/2 boundary
    * and rounds UP (HALF_UP), for odd m exact midpoints cannot exist —
    * no double ever carries a half-rounded value between the engines.
    * Oracle mirror: `CAST((10000*k + m//2)//m AS DOUBLE)/10000`.
    */
  private[graft] def ratioRound4(k: Column, m: Column): Column = {
    val q = call_function("div",
      lit(10000L) * k.cast("long") + call_function("div", m.cast("long"), lit(2L)),
      m.cast("long"))
    q.cast("double") / 10000.0
  }

  /** Whitespace tokens per document: `(idCol, token)`, one row per
    * occurrence. Empty/whitespace-only documents contribute nothing.
    */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), explode(split(trim(col(textCol)), "\\s+")).as("token"))

  /** Top-`k` corpus vocabulary by occurrence count (ties broken by
    * token — deterministic). One partial-aggregated exchange + top-k.
    */
  def vocabTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    tokens(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(k)

  /** Per-document mean unigram negative log-probability under the
    * corpus's own unigram model — the perplexity-style quality signal
    * (CCNet/DSIR family): documents whose tokens are globally rare
    * score high, formulaic/boilerplate documents score low. Laplace
    * smoothing: `p(t) = (count(t)) / total`, score =
    * `avg(-ln p(token))` over the doc's token stream (each occurrence
    * counted), rounded to 4 decimals. Output: `(idCol, n_toks,
    * avg_neg_logprob)`.
    *
    * Scale posture: one explode scan; the unigram model (distinct-token
    * counts + the 1-row total) joins back by term — the Zipf-skewed
    * equi-join AQE splits — then a single per-doc aggregation. The
    * model table is vocabulary-sized, not corpus-sized.
    */
  def unigramLogprob(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // pinned — three consumers (model, total would be a second pass, and
    // the score join); the dsirScore precedent (round-17)
    val toks = tokens(docs, idCol, textCol).localCheckpoint(true)
    val model = toks.groupBy("token").agg(count(lit(1)).as("tok_n"))
    // occurrence total = the model's own mass, not a second corpus pass
    val total = model.agg(coalesce(sum(col("tok_n")), lit(0L)).as("total"))
    // determinism convention (CoreQueries scaladoc): each token's score
    // is a pure double function of (tok_n, total) — identical on both
    // engines — rounded to 6 decimals and summed EXACTLY as DECIMAL
    // (double accumulation order is partition-dependent); back to double
    // only for the final division
    toks.join(model, "token")
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_toks"),
        sum(round(-log(col("tok_n") / col("total")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("_s"))
      .select(col(idCol), col("n_toks"),
        avgRound4(col("_s"), col("n_toks")).as("avg_neg_logprob"))
  }

  /** Per-document mean bigram negative log-probability under an
    * interpolated bigram LM trained on the corpus itself — the n-gram
    * step past [[unigramLogprob]] toward the KenLM-style perplexity
    * filter CCNet runs (Wenzek et al. 2020): unigram scoring can't see
    * scrambled word order, a bigram model penalizes it.
    * `p(w2|w1) = λ·c(w1,w2)/c(w1·) + (1−λ)·c(w2)/total` (interpolated
    * with the unigram model, so unseen continuations never zero out),
    * score = `avg(-ln p)` over the doc's bigram occurrences. Documents
    * with fewer than two tokens have no bigrams and drop from the
    * output (score them with [[unigramLogprob]]). Determinism
    * convention throughout; `+ 0.0` canonicalizes the negative zero a
    * certain-bigram doc (`p = 1`) would produce.
    *
    * Scale posture: bigram extraction is MAP-ONLY (array transform +
    * explode — no self-join, no window); the three model tables
    * (bigram counts, prefix counts, unigram counts) are
    * vocabulary-sized partial-aggregated exchanges joined back on
    * Zipf-skewed term keys (AQE splits); the corpus total rides a
    * 1-row broadcast. Output: `(idCol, n_bigrams, avg_neg_logprob)`.
    */
  def bigramLogprob(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    require(lambda > 0 && lambda <= 1, s"lambda ($lambda) must be in (0, 1]")
    val toks = tokens(docs, idCol, textCol)
    val uni = toks.groupBy("token").agg(count(lit(1)).as("u_n"))
    // occurrence total = the unigram model's own mass — never a second
    // corpus tokenize pass (round-17)
    val total = uni.agg(coalesce(sum(col("u_n")), lit(0L)).as("total"))
    val arr = split(trim(col(textCol)), "\\s+")
    // PINNED: the bigram stream has three consumers (the bigram model,
    // the context model, and the score join) — unpinned, the corpus-wide
    // explode ran three times per call (round-17; the trainTrigramKn
    // pinning rationale — at 100 TB persist the stream to a table
    // instead of executor-local storage)
    val bg = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), arr.as("_arr"))
      .filter(size(col("_arr")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("_arr")) - 2),
        i => struct(element_at(col("_arr"), i + 1).as("w1"),
          element_at(col("_arr"), i + 2).as("w2")))).as("_bg"))
      .select(col(idCol), col("_bg.w1").as("w1"), col("_bg.w2").as("w2"))
      .localCheckpoint(true)
    val bModel = bg.groupBy("w1", "w2").agg(count(lit(1)).as("b_n"))
    val c1 = bg.groupBy("w1").agg(count(lit(1)).as("c1_n"))
    val p = lit(lambda) * col("b_n") / col("c1_n") +
      lit(1.0 - lambda) * col("u_n") / col("total")
    bg.join(bModel, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .join(uni, bg("w2") === uni("token"))
      .crossJoin(broadcast(total))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(round(-log(p), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("_s"))
      .select(col(idCol), col("n_bigrams"),
        avgRound4(col("_s"), col("n_bigrams")).as("avg_neg_logprob"))
  }

  /** Per-document mean trigram negative log-probability under an
    * interpolated Kneser–Ney trigram LM trained on the corpus itself —
    * the full CCNet-grade perplexity filter (Wenzek et al. 2020 run
    * KenLM's interpolated-KN model; x41/x52 are the unigram/bigram
    * rungs below this). KN's insight over plain interpolation: lower-
    * order models should measure how many CONTEXTS a word continues
    * (type counts), not how often it occurs — "Francisco" is frequent
    * but continues only "San", so its unigram backoff weight should be
    * tiny. Single fixed discount `d` (KenLM's one-discount mode):
    *
    *   p₃(w3|w1w2) = (c(w1w2w3)−d)⁺/c(w1w2·) + d·N(w1w2·)/c(w1w2·)·p₂
    *   p₂(w3|w2)   = (T(·w2w3)−d)⁺/T(·w2·)  + d·T(w2·)/T(·w2·)·p₁
    *   p₁(w3)      = (T(·w3)−d)⁺/T(··)      + d·U/T(··)·(1/V)
    *
    * where N(w1w2·) = distinct continuations of the bigram context,
    * T(·w2w3)/T(·w2·)/T(w2·) are TRIGRAM-type continuation counts
    * around w2, T(·w3)/T(··) are (w2,w3)-type counts (derived from the
    * trigram type table — the first bigram of each doc has no trigram
    * context and is scored by neither engine), U = distinct continued
    * words, V = corpus vocabulary (the uniform floor). Scored trigrams
    * are always seen (the model trains on the scored corpus), so every
    * probability is positive without further smoothing. Documents with
    * fewer than three tokens drop (score them with the lower rungs).
    * Determinism convention: per-trigram −ln p₃ is a pure double
    * function of nine exact counts, rounded to 6, DECIMAL-summed,
    * rounded to 4, negative zero canonicalized.
    *
    * Scale posture: trigram extraction is MAP-ONLY (array transform +
    * explode); all five model tables are n-gram-TYPE-bounded partial-
    * aggregated exchanges (≪ corpus; Zipf-skewed join keys — AQE
    * splits); scalars ride a 1-row broadcast. Score = five model joins
    * against the trigram stream + one per-doc aggregation — the same
    * shape as [[bigramLogprob]] with a deeper model. Output:
    * `(idCol, n_trigrams, avg_neg_logprob)`.
    */
  def trigramKnLogprob(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame =
    scoreTrigramKn(trainTrigramKn(docs, idCol, textCol, discount),
      docs, idCol, textCol)

  /** A trained KN trigram model: five n-gram-TYPE-bounded count tables
    * plus the 1-row scalar table (bigram-type total, continued-word
    * count, vocabulary) and the discount. Persistable
    * ([[saveTrigramKn]]/[[loadTrigramKn]]) — the train-once/score-many
    * production shape (KenLM models are artifacts, not per-query work),
    * same posture as the classifier and index stores.
    */
  final case class KnModel(t3: DataFrame, ctx: DataFrame, c23: DataFrame,
      mid: DataFrame, uni: DataFrame, scalars: DataFrame, discount: Double)

  /** The per-doc trigram stream `(idCol, w1, w2, w3)` — shared by
    * training and scoring so the two can never disagree on extraction.
    */
  private def trigrams(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val arr = split(trim(col(textCol)), "\\s+")
    docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol), arr.as("_arr"))
      .filter(size(col("_arr")) >= 3)
      .select(col(idCol), explode(transform(
        sequence(lit(0), size(col("_arr")) - 3),
        i => struct(element_at(col("_arr"), i + 1).as("w1"),
          element_at(col("_arr"), i + 2).as("w2"),
          element_at(col("_arr"), i + 3).as("w3")))).as("_t"))
      .select(col(idCol), col("_t.w1").as("w1"), col("_t.w2").as("w2"),
        col("_t.w3").as("w3"))
  }

  /** Train the interpolated-KN count tables on `docs`.
    *
    * The trigram stream and the t3 type table are PINNED (eager
    * localCheckpoint, the dsirScore pattern): the model's six tables
    * all root at the same extraction — t3/ctx read tri, c23/mid re-run
    * t3's groupBy, scalars re-tokenize — so an unpinned save (or the
    * self-scoring composition, which additionally joins all five
    * tables) would re-read and re-explode the corpus ~6×. At 100 TB a
    * pipeline persists the trigram stream to a table instead of the
    * executor-local checkpoint and derives the model from the stored
    * copy (the tfidfTopTerms note).
    */
  def trainTrigramKn(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): KnModel = {
    require(discount > 0 && discount < 1,
      s"discount ($discount) must be in (0, 1)")
    val tri = trigrams(docs, idCol, textCol).localCheckpoint(true)
    // token-occurrence model tables (top level)
    val t3 = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("t_n"))
      .localCheckpoint(true)
    val ctx = tri.groupBy("w1", "w2").agg(count(lit(1)).as("ctx_n"),
      countDistinct(col("w3")).as("ctx_types"))
    // type-level tables (middle + bottom): derived from the DISTINCT
    // trigram table, so they are type counts by construction
    val c23 = t3.groupBy("w2", "w3").agg(count(lit(1)).as("c23_types"))
    val mid = t3.groupBy("w2").agg(count(lit(1)).as("mid_total"),
      countDistinct(col("w3")).as("mid_types"))
    val uni = c23.groupBy("w3").agg(count(lit(1)).as("uni_types"))
    val scalars = c23.agg(count(lit(1)).as("n_bity"))
      .crossJoin(uni.agg(count(lit(1)).as("n_uniw")))
      .crossJoin(tokens(docs, idCol, textCol)
        .agg(countDistinct(col("token")).as("v")))
    KnModel(t3, ctx, c23, mid, uni, scalars, discount)
  }

  /** Score `docs` under a (possibly reloaded) KN model. Self-scoring —
    * the model trained on the same corpus — reproduces
    * [[trigramKnLogprob]] bit for bit (spec-pinned). HELD-OUT docs back
    * off naturally: an unseen count coalesces to 0 (its discounted term
    * vanishes, the γ-weighted lower order carries the mass), and a
    * wholly unseen CONTEXT skips its level (c(w1w2·)=0 ⇒ p₃ := p₂,
    * T(·w2·)=0 ⇒ p₂ := p₁ — the standard KN backoff), so every score
    * stays finite and positive down to the uniform 1/V floor. V is the
    * TRAINING vocabulary (closed-vocab convention; an OOV w3 scores at
    * the floor).
    */
  def scoreTrigramKn(model: KnModel, docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val d = lit(model.discount)
    val tri = trigrams(docs, idCol, textCol)
    val p1 = greatest(coalesce(col("uni_types"), lit(0L)) - d, lit(0.0)) /
        col("n_bity") +
      d * col("n_uniw") / col("n_bity") * (lit(1.0) / col("v"))
    val p2 = when(col("mid_total").isNull, p1)
      .otherwise(
        greatest(coalesce(col("c23_types"), lit(0L)) - d, lit(0.0)) /
          col("mid_total") +
        d * col("mid_types") / col("mid_total") * p1)
    val p3 = when(col("ctx_n").isNull, p2)
      .otherwise(
        greatest(coalesce(col("t_n"), lit(0L)) - d, lit(0.0)) /
          col("ctx_n") +
        d * col("ctx_types") / col("ctx_n") * p2)
    val out = tri.join(model.t3, Seq("w1", "w2", "w3"), "left")
      .join(model.ctx, Seq("w1", "w2"), "left")
      .join(model.c23, Seq("w2", "w3"), "left")
      .join(model.mid, Seq("w2"), "left")
      .join(model.uni, Seq("w3"), "left")
      .crossJoin(broadcast(model.scalars))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_trigrams"),
        sum(round(-log(p3), 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("_s"))
    out.select(col(idCol), col("n_trigrams"),
      avgRound4(col("_s"), col("n_trigrams")).as("avg_neg_logprob"))
  }

  /** CCNet-style perplexity gating (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data"): rank documents by an LM score and bucket them into
    * `nBuckets` rank-terciles (head/middle/tail), keeping the first
    * `keepBuckets`. The canonical release-pipeline gate downstream of
    * [[scoreTrigramKn]].
    *
    * Scale + exactness posture: NO corpus-wide sort or single-partition
    * window. The score column is a 4-decimal average ([[avgRound4]]),
    * so its exact 1e-4-unit integer has bounded cardinality — the
    * bucket boundaries come from a rank prefix-sum over the
    * score-FREQUENCY frame (|distinct scores| rows, the only window),
    * broadcast back onto the corpus as a map-only join. Bucketing is
    * exact integer arithmetic — `bucket(s) = (nBuckets · c(s)) div n`
    * with c(s) = #docs scoring strictly below s — so score-ties share a
    * bucket (the CCNet by-value property: a threshold never splits
    * equal-quality docs) and any SQL engine reproduces it bit for bit
    * (no percentile/midpoint semantics anywhere; `div` is exact on
    * nonnegative longs).
    */
  def perplexityBuckets(scored: DataFrame, idCol: String, scoreCol: String,
      nBuckets: Int = 3, keepBuckets: Int = 2): DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    require(keepBuckets >= 1 && keepBuckets <= nBuckets,
      s"keepBuckets must be in [1, $nBuckets]")
    // the 4-decimal double is k/10000.0 for exact integer k; the
    // round-trip recovers k exactly (|k| far below the 2^52 guard).
    // PINNED: `scored` is typically an expensive scoring plan (the KN
    // composition joins five model tables) and this frame has THREE
    // consumers (freq, the n total under it, and the final bucket
    // attach) — unpinned, the whole upstream scoring subtree executes
    // three times over (round-17, seen in x97's plan: the 5-join KN
    // block appeared verbatim 3×). One row per doc — proxy-sized; the
    // ContextCleaner drops the pin with the returned plan.
    val s2 = scored.withColumn("_si",
      round(col(scoreCol) * 10000.0).cast("long"))
      .localCheckpoint(true)
    val freq = s2.groupBy(col("_si")).agg(count(lit(1)).as("_f"))
    val nDf = freq.agg(sum(col("_f")).as("_n"))
    // prefix-sum window over the score-frequency frame ONLY (bounded by
    // distinct-score cardinality, never the corpus)
    val w = Window.orderBy(col("_si"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = freq
      .withColumn("_c", coalesce(sum(col("_f")).over(w), lit(0L)))
      .crossJoin(broadcast(nDf))
      .withColumn("ppl_bucket",
        call_function("div", col("_c") * nBuckets.toLong, col("_n")))
      .select(col("_si"), col("ppl_bucket"))
    s2.join(broadcast(buckets), Seq("_si"))
      .withColumn("kept",
        when(col("ppl_bucket") < keepBuckets.toLong, 1).otherwise(0))
      .drop("_si")
  }

  /** Persist a trained KN model: the five count tables as parquet plus
    * a meta table carrying the scalars AND the discount — params ride
    * the store so scoring can never run with a different discount than
    * training (the CmSketch/BloomSketch discipline, LM flavor).
    */
  def saveTrigramKn(model: KnModel, dir: String): Unit = {
    model.t3.write.mode("overwrite").parquet(s"$dir/t3")
    model.ctx.write.mode("overwrite").parquet(s"$dir/ctx")
    model.c23.write.mode("overwrite").parquet(s"$dir/c23")
    model.mid.write.mode("overwrite").parquet(s"$dir/mid")
    model.uni.write.mode("overwrite").parquet(s"$dir/uni")
    model.scalars.withColumn("discount", lit(model.discount))
      .write.mode("overwrite").parquet(s"$dir/meta")
  }

  def loadTrigramKn(spark: org.apache.spark.sql.SparkSession,
      dir: String): KnModel = {
    val meta = spark.read.parquet(s"$dir/meta")
    KnModel(spark.read.parquet(s"$dir/t3"), spark.read.parquet(s"$dir/ctx"),
      spark.read.parquet(s"$dir/c23"), spark.read.parquet(s"$dir/mid"),
      spark.read.parquet(s"$dir/uni"),
      meta.drop("discount"),
      meta.select("discount").head().getDouble(0))
  }

  /** DSIR-style importance score (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document mean
    * log-likelihood ratio between a TARGET domain's unigram model and
    * the full corpus's — the operator that turns "I have 100 TB of raw
    * text and 1 GB that looks like my eval domain" into a ranked
    * selection. `targetFilter` marks the in-domain documents; both
    * models are add-α smoothed over the SHARED corpus vocabulary
    * (`p(w) = (c(w) + α) / (total + α·|V|)`), so out-of-target tokens
    * get mass and the ratio is always finite. Score =
    * `avg(ln(p_target(token) / p_corpus(token)))` over the doc's token
    * occurrences — positive ⇒ looks like the target domain. Per-token
    * contributions are pure double functions of exact counts, rounded
    * to 6 decimals and DECIMAL-summed (the determinism convention),
    * final average rounded to 4. Output: `(idCol, n_toks, dsir_score)`.
    *
    * Scale posture: ONE explode scan, pinned (three consumers: corpus
    * model, target model, score join — at 100 TB persist the token
    * table instead). Both models are vocabulary-sized; the score join
    * keys on the term (Zipf-skewed — AQE splits); corpus scalars ride a
    * 1-row broadcast. Downstream selection is `orderBy(score).limit(k)`
    * — TakeOrderedAndProject, never a global sort or rank window.
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      targetFilter: org.apache.spark.sql.Column,
      alpha: Double = 0.5): DataFrame = {
    val toks = tokens(docs, idCol, textCol).localCheckpoint(true)
    val gModel = toks.groupBy("token").agg(count(lit(1)).as("g_n"))
    val targetIds = docs.filter(targetFilter).select(col(idCol))
    val tModel = toks.join(targetIds, Seq(idCol), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("t_n"))
    val scalars = gModel
      .agg(sum(col("g_n")).as("g_total"), count(lit(1)).as("v"))
      .crossJoin(tModel.agg(
        coalesce(sum(col("t_n")), lit(0L)).as("t_total")))
    val model = gModel.join(tModel, Seq("token"), "left")
      .na.fill(0L, Seq("t_n"))
    val contrib = log(
      ((col("t_n") + alpha) / (col("t_total") + lit(alpha) * col("v"))) /
      ((col("g_n") + alpha) / (col("g_total") + lit(alpha) * col("v"))))
    toks.join(model, "token")
      .crossJoin(broadcast(scalars))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("long").as("n_toks"),
        sum(round(contrib, 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("_s"))
      .select(col(idCol), col("n_toks"),
        avgRound4(col("_s"), col("n_toks")).as("dsir_score"))
  }

  /** Per-document top-`k` terms by smoothed TF-IDF
    * (`tf * ln((N + 1) / (df + 1))`, N = docs with at least one token),
    * score rounded to 4 decimals, ties broken by term. Output:
    * `(idCol, term, tf, df, score, rank)`.
    *
    * One explode scan: the tf table is pinned once (eager
    * `localCheckpoint`, the Prefix.cumsumLong pattern) and BOTH
    * downstream passes read the pinned copy — `df` as a partial-
    * aggregated `groupBy(token).count()` joined back on term, and the
    * per-doc rank window over doc_id. `df` must NOT be a count window
    * partitioned by the term: under a Zipf corpus the head token
    * appears in nearly every document, so that window's hottest
    * partition is O(n_docs) rows on ONE task — and AQE's skew split
    * applies to joins and aggregations, never to window exchanges. The
    * groupBy formulation partial-aggregates map-side (skew-immune), and
    * the join back on term is the Zipf-skewed equi-join AQE DOES split.
    * N counts non-empty docs straight off the column-pruned source (a
    * doc has ≥ 1 token exactly when its trimmed text is non-empty). At
    * 100 TB a pipeline would persist tf to a table instead of the
    * executor-local checkpoint and derive both passes from the stored
    * copy.
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val nDocs = docs.filter(trim(col(textCol)) =!= "")
      .agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        log((col("n_docs") + 1.0) / (col("df") + 1.0)), 4))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("token").as("term"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** BM25 top-`k` retrieval: each query in `queries` (id + whitespace
    * query text) scores every document containing at least one of its
    * terms with Robertson/Okapi BM25 —
    * `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))` (the always-positive
    * Lucene form) times `tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))` —
    * and keeps its `k` best documents. Terms absent from the corpus
    * contribute nothing. Output: `(query_id, idCol, n_hit_terms,
    * score, rank)`, score = per-term contributions rounded to 6
    * decimals and DECIMAL-summed (the determinism convention), rounded
    * to 4.
    *
    * Scale posture: ONE explode scan — the tf table is pinned and dl /
    * df / the candidate match all read the pinned copy. The query set
    * is a bounded user batch, so it broadcasts onto tf (the
    * corpus-sized side never shuffles for the match) and df comes off
    * the query-filtered tf as a partial-aggregated groupBy — a term's
    * df is identical before and after the term filter, and the filtered
    * frame is query-vocabulary-bounded, so df broadcasts back. Doc
    * length attaches by a uniform doc-keyed equi-join; corpus stats
    * ride a 1-row broadcast. The per-query top-k LOOKS like the x40
    * defect class (a window partitioned by one bounded-cardinality
    * key, each partition O(matched corpus)) but is NOT: Spark's
    * rank-limit pushdown (InferWindowGroupLimit) turns the
    * `row_number ≤ k` filter into a map-side `WindowGroupLimit
    * Partial` per input partition BEFORE the exchange, so the final
    * per-query partition receives ≤ k·numPartitions pre-pruned rows —
    * plan-guarded in QueriesPlanSpec, so a formulation drift that
    * defeats the pushdown (e.g. rank exposed without the filter, or a
    * non-rank window function) fails the suite instead of dying at
    * 100 TB.
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val tf = tokens(docs, idCol, textCol)
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val dl = tf.groupBy(col(idCol)).agg(sum(col("tf")).as("dl"))
    // avg as exact long sum / count, the same arithmetic the oracle runs
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val qt = queryTerms(queries, qidCol, qtextCol)
    val tfq = tf.join(broadcast(qt.select("token").distinct()), "token")
    bm25ScoreTopK(tfq, qt, dl, stats, idCol, k, k1, b)
  }

  /** Distinct `(query_id, token)` pairs of a whitespace-tokenized query
    * batch — the query-side frame both [[bm25TopK]] and
    * [[LexIndexStore.searchTopK]] score against.
    */
  private[operators] def queryTerms(queries: DataFrame, qidCol: String,
      qtextCol: String): DataFrame =
    queries.select(col(qidCol).as("query_id"),
        explode(split(trim(col(qtextCol)), "\\s+")).as("token"))
      .filter(col("token") =!= "").distinct()

  /** Shared BM25 scorer+ranker: `tfq` = candidate postings already
    * restricted to the query vocabulary (`idCol`, token, tf), `qt` =
    * distinct (query_id, token), `dl` = (`idCol`, dl), `stats` = the
    * 1-row (n_docs, avgdl) frame. df comes off `tfq` itself (identical
    * before/after the query-term restriction and bounded by the query
    * vocabulary, so it broadcasts back). Extracted so the persisted-index
    * search ([[LexIndexStore]]) runs the EXACT arithmetic of the
    * on-the-fly path — parity is structural, not coincidental.
    */
  /** `qMatch`: optional PER-QUERY attribute restriction — (query
    * attributes frame keyed by query_id with columns pre-renamed
    * `_q_<c>`, the matched column names). The doc side of each equality
    * must ride the `dl` frame (the persisted index denormalizes
    * metadata into doclens); the filter applies AFTER the dl join and
    * BEFORE scoring/ranking, so every query keeps its k
    * within-its-own-slice results while df/idf/avgdl stay corpus-level
    * (the Lucene filtered-query semantics, per query).
    */
  private[operators] def bm25ScoreTopK(tfq: DataFrame, qt: DataFrame,
      dl: DataFrame, stats: DataFrame, idCol: String, k: Int,
      k1: Double, b: Double,
      qMatch: Option[(DataFrame, Seq[String])] = None): DataFrame = {
    val dfq = tfq.groupBy("token").agg(count(lit(1)).as("df"))
    val contrib =
      log(lit(1.0) + (col("n_docs").cast("double") - col("df") + 0.5) /
          (col("df") + 0.5)) *
        (col("tf").cast("double") * (k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    val joined = tfq
      .join(broadcast(dfq), "token")
      .join(broadcast(qt), "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
    val scored = qMatch.fold(joined) { case (qAttrs, cols) =>
      joined.join(broadcast(qAttrs), "query_id")
        .filter(cols.map(c => col(c) === col(s"_q_$c")).reduce(_ && _))
    }
      .groupBy(col("query_id"), col(idCol))
      .agg(count(lit(1)).as("n_hit_terms"),
        sum(round(contrib, 6)
          .cast(org.apache.spark.sql.types.DecimalType(28, 6))).as("_s"))
      .select(col("query_id"), col(idCol), col("n_hit_terms"),
        round(col("_s").cast("double"), 4).as("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol), col("n_hit_terms"),
        col("score"), col("rank"))
  }
}
