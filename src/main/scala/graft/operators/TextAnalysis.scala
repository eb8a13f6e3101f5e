package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All are narrow per-row
  * projections built from codegen'd built-ins — they add zero shuffles to
  * whatever pipeline they're composed into.
  */
object TextAnalysis {

  // --- Quality metrics (raw counts, deterministic integers) ---------------

  def alphaChars(c: Column): Column = length(regexp_replace(c, "[^a-zA-Z]", ""))
  def digitChars(c: Column): Column = length(regexp_replace(c, "[^0-9]", ""))
  def punctChars(c: Column): Column = length(regexp_replace(c, "[^.,;:!?'\"()-]", ""))
  def spaceChars(c: Column): Column = length(c) - length(regexp_replace(c, " ", ""))

  /** Whitespace token count (0 for blank). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish subword count: word-piece regex split (letters runs, digit
    * runs, single punctuation) — an upper-bound proxy for tokenizer cost. */
  def subwordCount(c: Column): Column =
    size(filter(
      split(c, "(?<=[^a-zA-Z0-9])|(?=[^a-zA-Z0-9])"),
      t => length(trim(t)) > 0))

  /** Stopword fraction of tokens — the classic web-text quality signal
    * (near-0 for boilerplate/gibberish); one codegen kernel call. */
  def stopwordRatio(c: Column): Column =
    graft.functions.GraftFunctions.stopword_ratio(c)

  /** Quality projection: raw counts + the stopword-ratio signal. */
  def qualityMetrics(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_chars_m", length(col(textCol)))
      .withColumn("alpha_chars", alphaChars(col(textCol)))
      .withColumn("digit_chars", digitChars(col(textCol)))
      .withColumn("punct_chars", punctChars(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("stopword_ratio", stopwordRatio(col(textCol)))

  // --- Language identification (n-gram / stopword heuristic) --------------

  /** Stopword tables per language (matches PagesGen's generator so the
    * heuristic is verifiable on synthetic data, and sensible on real text). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "that", "it", "is", "was", "for"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "que", "une", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "auf", "sich"),
    "ja" -> Seq("これ", "それ", "です", "ます", "した", "ない", "ある", "する", "いる", "この"))

  /** Score for one language: count of tokens that are stopwords of it. */
  private def langScore(tokens: Column, lang: String): Column =
    size(array_intersect_count(tokens, stopwords(lang)))

  // array_intersect drops duplicates; we want occurrence counts, so filter
  private def array_intersect_count(tokens: Column, stops: Seq[String]): Column =
    filter(tokens, t => stops.map(s => t === s).reduce(_ || _))

  /** Predicted language: argmax stopword-hit count over the table; "und"
    * (undetermined) when no stopword hits at all. Ties go to the
    * lexicographically greatest language code (mirrored by the t03
    * oracle). One codegen kernel call per row — the HOF formulation
    * (per-language interpreted array filters) was 4 interpreted passes
    * over every document's tokens. */
  def langId(c: Column): Column = graft.functions.GraftFunctions.lang_id(c)

  /** Equivalent declarative form (kept for reference/verification — the
    * kernel must match it; asserted in TextAnalysisSpec). */
  private[operators] def langIdDeclarative(c: Column): Column = {
    val tokens = split(lower(c), "\\s+")
    val scored = stopwords.keys.toSeq.sorted.map { l =>
      struct(langScore(tokens, l).as("score"), lit(l).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Rolling-hash document fingerprint: winnowing-style min-k of 64-bit
    * xxh64 values over character w-grams — robust to small edits. One
    * codegen kernel pass per row (the array-expression form hashed every
    * gram through interpreted HOFs). */
  def fingerprint(c: Column, w: Int = 8, k: Int = 4): Column =
    graft.functions.GraftFunctions.doc_fingerprint(c, w, k)
}
