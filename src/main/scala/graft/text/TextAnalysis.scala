package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Text-corpus analysis operators for a training-data pipeline, built from
  * codegen'd built-ins only (no UDFs in the hot path).
  *
  * The reference does line-oriented text analytics with regex + entropy
  * heuristics (extgrep:38-56 likely-hash filter; js_mincer.py LoC counting;
  * db.py:100-187 regex metadata projections); these are the corpus-scale
  * equivalents over the `documents` table.
  */
object TextAnalysis {

  /** Whitespace token count (BPE-ish subword count approximated by the
    * word-piece regex below in `subwordCount`). */
  def tokenCount(c: Column): Column =
    when(length(trim(c)) === 0, lit(0)).otherwise(size(split(trim(c), "\\s+")))

  /** Sub-word unit count: splits on whitespace AND letter/digit boundaries —
    * a cheap deterministic stand-in for a BPE tokenizer's piece count. */
  def subwordCount(c: Column): Column =
    size(filter(split(c, "[^A-Za-z0-9]+"), x => length(x) > 0))

  /** Quality-score features: length, punctuation ratio, stopword ratio,
    * mean word length — the standard pre-training quality heuristics. */
  def qualityFeatures(doc: Column): Seq[Column] = {
    val n = length(doc)
    val punct = n - length(regexp_replace(doc, "[.,;:!?]", ""))
    val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")
    val words = split(trim(doc), "\\s+")
    val nWords = tokenCount(doc)
    val nStop = size(filter(words, w => stopwords.map(s => w === lit(s)).reduce(_ || _)))
    Seq(
      n.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      round(punct.cast("double") / greatest(n, lit(1)), 4).as("punct_ratio"),
      round(nStop.cast("double") / greatest(nWords, lit(1)), 4).as("stopword_ratio"),
      round((n - nWords + 1).cast("double") / greatest(nWords, lit(1)), 4).as("mean_word_len"))
  }

  /** Language-ID by marker-word scoring: count hits of per-language marker
    * words, pick argmax (ties → alphabetical language order). A deterministic
    * n-gram-heuristic language classifier; the marker lists are stand-ins
    * for real per-language frequency tables. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "que", "de", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  def langScore(doc: Column, markers: Seq[String]): Column = {
    val words = split(trim(doc), "\\s+")
    size(filter(words, w => markers.map(m => w === lit(m)).reduce(_ || _)))
  }

  def langId(doc: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => (lang, langScore(doc, ms)) }
    // argmax with alphabetical tiebreak: fold left keeping strictly-greater
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) => (when(s > bs, lit(lang)).otherwise(bl), greatest(s, bs))
    }
    when(best._2 === 0, lit("unknown")).otherwise(best._1)
  }

  /** Content fingerprint: md5 over the lowercase alphanumeric normalization —
    * the corpus analog of the reference's normalized-content md5 dedup keys
    * (db.py:195; file_identifiers.py:41-51 normalize-then-hash). */
  def fingerprint(c: Column): Column =
    md5(regexp_replace(lower(c), "[^a-z0-9]", ""))

  // ---- query entry points over the documents table ----

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      subwordCount(col("text")).cast("long").as("n_subwords"))

  def quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id") +: qualityFeatures(col("text")): _*)

  def languageId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), langId(col("text")).as("lang_pred"))

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** Corpus rollup by source: volume + quality profile per source — the
    * per-class summary shape of the reference's run metrics (crawler:81-99). */
  def sourceProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text")).cast("long")).as("total_tokens"),
        round(avg(length(col("text"))), 2).as("avg_chars"))
}
