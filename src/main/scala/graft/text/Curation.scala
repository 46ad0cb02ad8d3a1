package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sim.Dedup

/** The composed corpus-curation funnel (q85) — the end-to-end pipeline a
  * training-data run actually executes, chaining the engine's text and
  * dedup operators in their production order over one corpus pass:
  *
  *   1. language gate   — keep docs the marker-word classifier calls `lang`
  *      ([[TextAnalysis.langId]], q17's operator);
  *   2. quality gate    — keep docs with ≥ `minWords` tokens and stopword
  *      ratio ≥ `minStopRatio` ([[TextAnalysis.qualityFeatures]], q18's);
  *   3. exact dedup     — one survivor (min `doc_id`) per `md5(text)`
  *      fingerprint among the quality survivors (q10's operator, window
  *      form);
  *   4. near-dup dedup  — one survivor per [[Dedup.neardupComponents]]
  *      connected component among the exact survivors (q84's operator):
  *      chains A~B~C collapse to one kept doc even when A≁C directly.
  *
  * Output is the per-source attrition funnel (`n_input → n_lang →
  * n_quality → n_exact → n_final`), the number every curation run reports —
  * survivors are attributed to their own `source`, so the funnel also shows
  * which sources lose docs to cross-source near-dup collisions.
  *
  * Scale shape: stages 1-2 are codegen'd projections fused into the scan;
  * stage 3 is one window shuffle on the content fingerprint; stage 4 reuses
  * q84's component labels (bounded label-propagation rounds) plus one window
  * shuffle on `rep_id`; the funnel itself is a partial-aggregated 20-group
  * rollup. Nothing materializes the corpus more than once per stage, and
  * every per-doc intermediate is two join keys wide.
  *
  * Fully oracle-gated: every stage is DuckDB-expressible (q17/q18/q10's
  * oracle fragments + q84's recursive-CTE closure), so the WHOLE composed
  * pipeline — including the interaction ordering of the gates and both
  * dedup survivors — is hash-checked end-to-end, not just its pieces. */
object Curation {

  def curationFunnel(spark: SparkSession, dir: String, lang: String = "en",
                     minWords: Long = 20L, minStopRatio: Double = 0.03): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // qualityFeatures emits (n_chars, n_words, punct_ratio, stopword_ratio,
    // mean_word_len); the funnel gates on n_words + stopword_ratio, computed
    // by the SAME column expressions q18 is oracle-gated on
    val feats = TextAnalysis.qualityFeatures(col("text"))
    // persisted: `flagged` feeds exactKeep (and through it nearKeep) AND the
    // final attrition join — Spark has no cross-consumer common-subplan
    // elimination, so without the persist one funnel run re-evaluates the
    // langId/quality regex projections 3-4x (the Dedup.rareShingles pattern)
    val flagged = graft.core.CacheScope.persist(docs
      .select(col("doc_id"), col("source"), md5(col("text")).as("fp"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        feats(1), feats(3)) // n_words, stopword_ratio
      .withColumn("lang_ok", col("lang_pred") === lit(lang))
      .withColumn("qual_ok",
        col("lang_ok") && col("n_words") >= minWords &&
          col("stopword_ratio") >= minStopRatio),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val exactKeep = flagged.filter(col("qual_ok"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"))
    val comps = Dedup.neardupComponents(spark, dir)
      .select(col("doc_id"), col("rep_id"))
    val nearKeep = exactKeep.join(comps, "doc_id")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("rep_id")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"))
    flagged
      .join(exactKeep.withColumn("exact_keep", lit(true)), Seq("doc_id"), "left")
      .join(nearKeep.withColumn("final_keep", lit(true)), Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_input"),
        sum(when(col("lang_ok"), 1L).otherwise(0L)).as("n_lang"),
        sum(when(col("qual_ok"), 1L).otherwise(0L)).as("n_quality"),
        sum(when(col("exact_keep"), 1L).otherwise(0L)).as("n_exact"),
        sum(when(col("final_keep"), 1L).otherwise(0L)).as("n_final"))
  }
}
