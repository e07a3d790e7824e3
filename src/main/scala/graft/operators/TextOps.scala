package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines over the
  * `documents` table (doc_id, text, lang, source, n_chars): language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * Everything is Column-composition (built-in string/regex/higher-order
  * functions) — no UDFs, so the whole stage is a single codegen'd pass per
  * document; at 100 TB these run scan-parallel with zero shuffles.
  */
object TextOps {

  /** Whitespace tokenization (empty string → 0 tokens). */
  def wsTokens(text: Column): Column =
    when(trim(text) === "" || text.isNull, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def wsTokenCount(text: Column): Column = size(wsTokens(text))

  /** BPE-ish subword-boundary token count: runs of word chars OR single
    * non-word-non-space chars — the usual pre-tokenizer regex shape.
    * ASCII classes keep Spark (Java regex) and any SQL oracle (RE2)
    * agreeing byte-for-byte.
    */
  val BpeTokenPattern = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"
  def bpeTokenCount(text: Column): Column =
    coalesce(regexp_count(text, lit(BpeTokenPattern)), lit(0))

  /** Punctuation/symbol count: chars that are neither alphanumeric nor
    * whitespace.
    */
  def punctCount(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9\\s]+", ""))

  def punctRatio(text: Column): Column =
    punctCount(text).cast("double") / greatest(length(text), lit(1)).cast("double")

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and hard-coded: language ID here is a
    * cheap distributed heuristic, not a model.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "las"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ein", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"))

  /** Fraction of whitespace tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val toks = wsTokens(lower(text))
    val stops = array(stopwords(lang).map(lit): _*)
    size(filter(toks, t => array_contains(stops, t))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")
  }

  /** Language-ID heuristic: CJK-character density decides zh; otherwise the
    * language whose stopword list hits most tokens. Ties break to the
    * lexicographically larger code (array_max over (score, lang) structs) —
    * deterministic.
    */
  def langId(text: Column): Column = {
    val cjk = length(regexp_replace(text, "[^\\u4e00-\\u9fff]+", ""))
    val scored = array(stopwords.keys.toSeq.sorted.map { l =>
      struct(stopwordRatio(text, l).as("score"), lit(l).as("lang"))
    }: _*)
    val best = array_max(scored)
    when(cjk.cast("double") / greatest(length(text), lit(1)) > 0.05, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Quality score in [0,1]: blend of length band, punctuation sanity,
    * mean-word-length band, and stopword presence — the standard cheap
    * quality gates (length/punct/stopword ratios).
    */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val lenScore = least(len / 200.0, lit(1.0)) * when(len > 20000, 0.5).otherwise(1.0)
    val punctScore = when(punctRatio(text) > 0.2, 0.3).otherwise(1.0)
    val toks = wsTokenCount(text).cast("double")
    val meanWord = len / greatest(toks, lit(1.0))
    val wordScore = when(meanWord < 2 || meanWord > 12, 0.5).otherwise(1.0)
    val anyStop = greatest(stopwords.keys.toSeq.sorted.map(l => stopwordRatio(text, l)): _*)
    val stopScore = when(anyStop > 0.05, 1.0).otherwise(0.7)
    round(lenScore * punctScore * wordScore * stopScore, 4)
  }

  /** Word n-gram shingles of the lowercased text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = wsTokens(lower(text))
    when(size(toks) < n, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Document fingerprint: min-hash of word-5-gram shingle hashes (a
    * winnowing-style rolling fingerprint — the minimum of the shingle hash
    * sequence, via the [[graft.functions.ShingleHashes]] kernel), plus the
    * full-text hash. Identical pipeline on every executor → deterministic.
    */
  def fingerprint(text: Column): Column =
    struct(
      xxhash64(text).as("full_hash"),
      array_min(graft.functions.TextVectorExpressions.shingle_hashes(text, 5))
        .as("min_shingle_hash"))
}
