package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed end-to-end training-data curation pipeline — the
  * "run every stage a corpus needs" entry point that strings the
  * engine's cleaning, filtering, dedup and sampling operators into one
  * flow:
  *
  *   clean (markup strip + PII redact)        — pure projection
  *   → filter (language / quality / length)   — pure predicates
  *   → exact dedup (keep min id per content)  — one keyed shuffle
  *   → content-keyed sample                   — pure filter
  *
  * Everything before the dedup shuffle fuses into a single scan stage
  * under whole-stage codegen; the predicates sit upstream of the
  * shuffle, so the exchange only carries surviving rows. The stages
  * deliberately run cheapest-first (projection/predicates prune before
  * the shuffle pays, the sample is last so kept-rate statistics are
  * measured on curated data).
  */
object Curation {

  /** Tuning knobs; defaults mirror common corpus-cleaning settings. */
  case class CurationConfig(
      lang: Option[String] = Some("en"),
      minQuality: Double = 0.5,
      minTokens: Int = 5,
      sampleFraction: Double = 1.0)

  /** Returns the curated corpus: (id, text_clean, lang, quality,
    * n_tokens) for every surviving document. */
  def curate(df: DataFrame, idCol: String, textCol: String,
             cfg: CurationConfig = CurationConfig()): DataFrame = {
    // materialized once: Catalyst's CollapseProject + predicate
    // pushdown otherwise re-inline the 5-regex cleaning chain into
    // every derived column, every filter predicate AND the dedup
    // shuffle key (~34 copies in the optimized plan, measured). The
    // cleaned/featured frame is also the stage output a production
    // pipeline persists between curation steps.
    // (langIdFromCounts-with-projected-counts buys nothing here: the
    // counts aren't output columns, so CollapseProject would substitute
    // them straight back into the CASE — the plain composition is the
    // same plan with less code)
    val cleaned = df.select(col(idCol).as("id"),
      TextAnalysis.redactPii(TextAnalysis.stripMarkup(col(textCol)))
        .as("text_clean"))
      .withColumn("lang", TextAnalysis.langId(col("text_clean")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text_clean")))
      .withColumn("n_tokens",
        TextAnalysis.tokenCount(col("text_clean")).cast("long"))
      .localCheckpoint()
    val filtered = cleaned
      .filter(cfg.lang.map(l => col("lang") === l).getOrElse(lit(true)))
      .filter(col("quality") >= cfg.minQuality &&
        col("n_tokens") >= cfg.minTokens)
    val deduped = Dedup.exactDedup(filtered, "id", "text_clean")
    if (cfg.sampleFraction >= 1.0) deduped
    else Sampling.hashSample(deduped, "id", cfg.sampleFraction)
  }
}
