package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** PII redaction (q91) — the scrubbing pass a training pipeline runs before
  * text reaches the trainer: find and replace emails, IPv4 addresses, and
  * international phone numbers with class tokens, and report per-document
  * counts plus a digest of the redacted text (LLM-pipeline mandate; no
  * reference analog — the reference archives raw pages, a training pipeline
  * must scrub them).
  *
  * Design constraints:
  *  - every regex is written in the Java ∩ RE2 common subset (character
  *    classes, bounded repetition, `\b`/`\d` — no backrefs, no lookaround)
  *    so the DuckDB oracle replays the EXACT same patterns;
  *  - the three replace passes are ordered email → IPv4 → phone; the
  *    classes are disjoint by construction (emails end in an alpha TLD,
  *    IPv4 is dotted digits, phones are dash-joined digits behind `+`), so
  *    the order is not load-bearing, but it is still pinned on both sides;
  *  - the synthetic corpus contains no PII, so the operator PLANTS it
  *    deterministically from `doc_id` arithmetic (the q67/q87 closed-form
  *    synthesis pattern): both engines build the identical augmented text,
  *    which puts detection, counting, AND the replacement semantics inside
  *    the oracle hash gate — `md5(redacted)` disagrees if a single
  *    replacement span differs.
  *
  * Scale shape: a pure codegen projection (`regexp_count`/`regexp_replace`
  * are whole-stage-codegen built-ins) — no shuffle, no state; scrubbing
  * 100 TB costs one scan, embarrassingly parallel.
  */
object Redaction {

  /** Java ∩ RE2 portable patterns (single-quoted in the oracle, so no
    * DuckDB escape processing — the strings below are byte-identical on
    * both sides). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{1,3}-\\d{3}-\\d{3}-\\d{4}"

  /** Deterministic PII planting — a pure function of `doc_id` (mod-3 class
    * rotation; every 15th doc carries a second email so the count column is
    * not constant-1 on the email class). */
  private[text] def plantedText: Column = concat(
    col("text"),
    when(col("doc_id") % 3 === 0, concat(
      lit(" reach user"), col("doc_id").cast("string"), lit("@example.com today"),
      when(col("doc_id") % 15 === 0,
        concat(lit(" cc admin"), col("doc_id").cast("string"), lit("@corp.example.org")))
        .otherwise(lit(""))))
      .when(col("doc_id") % 3 === 1, concat(
        lit(" node at 10."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") % 100).cast("string"),
        lit("."), (col("doc_id") % 50).cast("string"), lit(" up")))
      .otherwise(concat(
        lit(" dial +1-555-"), lpad((col("doc_id") % 1000).cast("string"), 3, "0"),
        lit("-0199 soon"))))

  /** q91 — per-document PII scrub report: class counts, redacted length,
    * and the md5 digest of the redacted text (the digest is what the oracle
    * hash-gates — replacement spans, tokens, and ordering included). */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    val redacted =
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), lit(EmailRe), lit("<EMAIL>")),
          lit(Ipv4Re), lit("<IP>")),
        lit(PhoneRe), lit("<PHONE>"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), plantedText.as("text"))
      .select(
        col("doc_id"), col("source"),
        regexp_count(col("text"), lit(EmailRe)).cast("long").as("n_email"),
        regexp_count(col("text"), lit(Ipv4Re)).cast("long").as("n_ip"),
        regexp_count(col("text"), lit(PhoneRe)).cast("long").as("n_phone"),
        length(redacted).cast("long").as("redacted_len"),
        md5(redacted).as("redacted_md5"))
  }

  /** DuckDB replay: identical planting arithmetic, identical patterns (RE2
    * parses the same strings), `'g'`-flagged replaces in the same order. */
  def redactPiiOracleSql(): String =
    s"""WITH p AS (SELECT doc_id, source, text ||
       |  CASE WHEN doc_id % 3 = 0 THEN ' reach user' || doc_id || '@example.com today' ||
       |         CASE WHEN doc_id % 15 = 0 THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END
       |       WHEN doc_id % 3 = 1 THEN ' node at 10.' || (doc_id % 256) || '.' || (doc_id % 100) || '.' || (doc_id % 50) || ' up'
       |       ELSE ' dial +1-555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-0199 soon' END AS text
       |  FROM documents),
       |r AS (SELECT doc_id, source,
       |  len(regexp_extract_all(text, '$EmailRe')) AS n_email,
       |  len(regexp_extract_all(text, '$Ipv4Re')) AS n_ip,
       |  len(regexp_extract_all(text, '$PhoneRe')) AS n_phone,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), '$PhoneRe', '<PHONE>', 'g') AS red
       |  FROM p)
       |SELECT doc_id, source, CAST(n_email AS BIGINT) AS n_email,
       |  CAST(n_ip AS BIGINT) AS n_ip, CAST(n_phone AS BIGINT) AS n_phone,
       |  CAST(length(red) AS BIGINT) AS redacted_len, md5(red) AS redacted_md5
       |FROM r""".stripMargin
}
