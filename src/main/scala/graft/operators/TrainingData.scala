package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-curation pipeline — the composition a
  * training-data user actually runs, wired from the engine's own
  * operators: quality gate → exact dedup → benchmark decontamination →
  * per-language mixing. Every stage emits an observable row counter
  * (`queryExecution.observedMetrics` after any action:
  * curation_input / _quality / _dedup / _decontam / _out), so a curation
  * run reports its own funnel — nothing is silently dropped.
  *
  * Scale shape: the quality gate and the mix are narrow filters (the rate
  * dim and the eval-gram set are broadcast); the only wide exchanges are
  * the dedup window on the content digest and the decontamination gram
  * aggregate — both keyed, never all-pairs.
  */
object TrainingData {

  final case class CurationConfig(
      minTokens: Int = 30,
      minStopwordRatio: Double = 0.0,
      langRates: Map[String, Double] = Map.empty, // absent stratum = dropped
      contamN: Int = 13,
      salt: String = "curate")

  def curate(
      docs: DataFrame,
      evalSet: Option[DataFrame],
      cfg: CurationConfig,
      textCol: String = "text",
      idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    val base = docs.select(col(idCol), col(langCol), col(textCol))
      .observe("curation_input", count(lit(1)).as("rows"))

    // 1. quality gate — narrow codegen filters, zero shuffle
    val quality = base
      .filter(TextAnalysis.tokenCount(col(textCol)) >= cfg.minTokens &&
        TextAnalysis.stopwordRatio(col(textCol)) >= cfg.minStopwordRatio)
      .observe("curation_quality", count(lit(1)).as("rows"))

    // 2. exact dedup — first (min id) doc per content digest survives
    val deduped = Dedup.exact(quality, textCol, idCol)
      .filter(!col("is_dup"))
      .drop("digest", "is_dup", "keeper")
      .observe("curation_dedup", count(lit(1)).as("rows"))

    // 3. benchmark decontamination — any doc sharing a contamN-gram with
    // the eval corpus is dropped (broadcast eval-gram set, anti-join).
    // Contaminated ids are computed from the PRE-dedup quality set, not
    // from `deduped`: referencing `deduped` twice would evaluate its wide
    // digest-window exchange twice per run, while the quality set is a
    // narrow scan — and flagging a doc that dedup drops anyway changes
    // nothing in the anti-join.
    val clean = (evalSet match {
      case Some(ev) =>
        // same broadcast-dim kernel form as Dedup.decontaminate: the eval
        // grams collect once into a (sorted hash, gram bytes) dim and each
        // quality doc answers "any shared contamN-gram?" in ONE codegen
        // kernel call (byte-compared, string-exact) — no corpus-wide gram
        // explode, no join below the anti-join
        val contaminated = Dedup.decontaminate(
            quality, ev, textCol = textCol, idCol = idCol, n = cfg.contamN,
            evalTextCol = textCol)
          .filter(col("contaminated"))
          .select(col(idCol))
        deduped.join(contaminated, Seq(idCol), "left_anti")
      case None => deduped
    }).observe("curation_decontam", count(lit(1)).as("rows"))

    // 4. per-language mixing — deterministic (id, salt)-hash sampling
    Mixing.stratifiedSample(clean, langCol, cfg.langRates, idCol, cfg.salt)
      .observe("curation_out", count(lit(1)).as("rows"))
  }
}
