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

  // --- Repetition signals (Gopher-style quality rules) ---------------------

  /** Within-document repetition signals, the Gopher/MassiveText quality
    * rules re-expressed as count ratios (integer-ratio doubles — exact and
    * oracle-comparable):
    *   top2_frac — occurrences of the single most frequent word 2-gram over
    *     all 2-gram occurrences (boilerplate/spam pages repeat one phrase);
    *   dup5_frac — fraction of word 5-gram occurrences whose gram occurs
    *     more than once (template/churned text).
    * Docs with fewer than n words score 0.0.
    *
    * Plan shape at scale: explode n-grams → partial-aggregated
    * groupBy(id, gram) → groupBy(id); both exchanges carry the doc id, the
    * second reuses the first's hash partitioning (no extra shuffle), and
    * map-side combine collapses within-doc repeats before any wire bytes.
    */
  def repetitionSignals(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def gramStats(n: Int, outCol: String, dup: Boolean): DataFrame = {
      val words = filter(split(trim(lower(col(textCol))), "\\s+"), w => length(w) > 0)
      val grams = when(size(words) >= n,
        transform(sequence(lit(1), size(words) - (n - 1)),
          i => concat_ws(" ", slice(words, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val counts = docs
        .select(col(idCol), explode(grams).as("g"))
        .groupBy(col(idCol), col("g"))
        .agg(count(lit(1)).as("cnt"))
      val agg =
        if (dup) counts.groupBy(col(idCol)).agg(
          (sum(when(col("cnt") > 1, col("cnt")).otherwise(0)).cast("double") /
            sum(col("cnt")).cast("double")).as(outCol))
        else counts.groupBy(col(idCol)).agg(
          (max(col("cnt")).cast("double") /
            sum(col("cnt")).cast("double")).as(outCol))
      agg
    }
    docs.select(col(idCol))
      .join(gramStats(2, "top2_frac", dup = false), Seq(idCol), "left")
      .join(gramStats(5, "dup5_frac", dup = true), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top2_frac"), lit(0.0)).as("top2_frac"),
        coalesce(col("dup5_frac"), lit(0.0)).as("dup5_frac"))
  }

  /** Rolling-hash document fingerprint: winnowing-style min-k of 64-bit
    * xxh64 values over character w-grams — robust to small edits. One
    * codegen kernel pass per row (the array-expression form hashed every
    * gram through interpreted HOFs). */
  def fingerprint(c: Column, w: Int = 8, k: Int = 4): Column =
    graft.functions.GraftFunctions.doc_fingerprint(c, w, k)
}
