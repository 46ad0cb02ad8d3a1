package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Passage-level exact dedup (q98) — the sub-document complement to q10's
  * doc-level exact dedup (LLM-pipeline mandate; the ExactSubstr observation
  * of Lee et al., "Deduplicating Training Data Makes Language Models
  * Better", at passage granularity): web corpora repeat PASSAGES — nav-bar
  * boilerplate, license headers, syndicated paragraphs — inside documents
  * that are not duplicates of each other, so doc-level dedup cannot remove
  * them.
  *
  * Semantics: a document's word stream is segmented into consecutive
  * `segWords`-word passages; a passage INSTANCE is dropped iff an earlier
  * instance of the same passage text exists anywhere in the corpus (global
  * first-occurrence order = (doc_id, seg_idx) — deterministic, never
  * row-order). Output per document: segment count, dropped count, and the
  * md5 of the kept-passage reconstruction, which puts the drop DECISIONS
  * (not just their count) inside the oracle hash gate.
  *
  * The synthetic corpus exercises both duplication shapes deterministically:
  * its own planted exact-dup documents (q10's fixtures) duplicate every
  * segment, and a boilerplate prefix planted from doc_id arithmetic (the
  * q91 pattern — every `doc_id % 7 == 3` doc gets one copy, `% 21 == 10`
  * two, so intra-document repeats are exercised too) duplicates exactly one
  * aligned passage across otherwise-unrelated docs.
  *
  * Scale shape: segmentation is a codegen'd array projection fused into the
  * scan (no explode of WORDS — segments only, 1/segWords the row count);
  * the first-occurrence decision is ONE window shuffle keyed on md5(seg)
  * (constant-width shuffle key regardless of passage length); the per-doc
  * rollup re-aggregates on doc_id. Two exchanges total, both
  * partial-aggregated, nothing corpus-sized materializes on the driver —
  * the same shape at 100 TB, where the md5 window is the standard
  * global-dedup exchange. */
object PassageDedup {

  /** 16 words exactly — one full segment when prepended. */
  val Boilerplate: String =
    "click here to accept cookies and subscribe to our newsletter for the latest updates and offers"

  /** Deterministic boilerplate planting (pure function of doc_id) — shared
    * with [[DupSpans]] (q100), which measures the same planted repetition
    * with overlapping windows. */
  private[text] def plantedTextCol: Column =
    when(col("doc_id") % 21 === 10, concat(lit(Boilerplate + " " + Boilerplate + " "), col("text")))
      .when(col("doc_id") % 7 === 3, concat(lit(Boilerplate + " "), col("text")))
      .otherwise(col("text"))

  /** The oracle-side twin of [[plantedTextCol]] (a full SELECT over
    * `documents`, aliased `doc_id, source, text`). */
  private[text] def plantedTextSql: String =
    s"""SELECT doc_id, source,
       |  CASE WHEN doc_id % 21 = 10 THEN '$Boilerplate $Boilerplate ' || text
       |       WHEN doc_id % 7 = 3 THEN '$Boilerplate ' || text
       |       ELSE text END AS text FROM documents""".stripMargin

  def passageDedup(spark: SparkSession, dir: String, segWords: Int = 16): DataFrame = {
    val segs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), plantedTextCol.as("text"))
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("source"), explode(expr(
        s"""transform(sequence(0, cast(ceil(size(ws) / $segWords.0) as int) - 1),
           |  i -> struct(cast(i as bigint) as seg_idx,
           |              array_join(slice(ws, i * $segWords + 1, $segWords), ' ') as seg))""".stripMargin))
        .as("s"))
      .select(col("doc_id"), col("source"), col("s.seg_idx"), col("s.seg"))
    val marked = segs.withColumn("rn", row_number().over(
      Window.partitionBy(md5(col("seg"))).orderBy(col("doc_id"), col("seg_idx"))))
    marked.groupBy("doc_id", "source").agg(
      count(lit(1)).as("n_segments"),
      sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_dropped"),
      md5(array_join(
        transform(
          filter(
            array_sort(collect_list(struct(col("seg_idx"), col("rn"), col("seg")))),
            x => x.getField("rn") === 1),
          x => x.getField("seg")),
        " ")).as("kept_md5"))
  }

  /** DuckDB replay: identical planting, segmentation (1-based inclusive
    * list slice == Spark's (start, length) slice at aligned bounds),
    * first-occurrence window, and ordered kept-text reconstruction. */
  def passageDedupOracleSql(segWords: Int = 16): String =
    s"""WITH base AS ($plantedTextSql),
       |wsrc AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM base),
       |segs AS (SELECT doc_id, source,
       |  unnest(list_transform(range(0, CAST(ceil(len(ws) / $segWords.0) AS BIGINT)),
       |    i -> struct_pack(seg_idx := i, seg := array_to_string(ws[i*$segWords+1:(i+1)*$segWords], ' ')))) AS s
       |  FROM wsrc),
       |m AS (SELECT doc_id, source, CAST(s.seg_idx AS BIGINT) AS seg_idx, s.seg AS seg,
       |  row_number() OVER (PARTITION BY md5(s.seg) ORDER BY doc_id, s.seg_idx) AS rn FROM segs)
       |SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_segments,
       |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_dropped,
       |  md5(coalesce(string_agg(seg, ' ' ORDER BY seg_idx) FILTER (WHERE rn = 1), '')) AS kept_md5
       |FROM m GROUP BY 1, 2""".stripMargin
}
