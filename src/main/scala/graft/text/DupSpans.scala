package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Duplicated-SPAN coverage (q100) — the unaligned complement to q98's
  * aligned passage dedup (the actual ExactSubstr observation of Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better": duplicated
  * text rarely falls on segment boundaries, so coverage must be measured by
  * OVERLAPPING windows, not disjoint ones). Per document, the fraction of
  * its tokens covered by any word n-gram that occurs more than once in the
  * corpus (counting instances, so an n-gram repeated inside ONE document
  * duplicates too):
  *
  *  - every position i of every doc mints the instance (doc, i, g_i) of its
  *    overlapping n-gram g_i = w[i..i+n);
  *  - an instance is DUPLICATED iff its n-gram text has global instance
  *    count ≥ 2;
  *  - the doc's covered-token count is the size of the union of the flagged
  *    intervals [i, i+n) — a gaps-and-islands merge, NOT a sum (overlapping
  *    flagged windows share tokens; a naive sum over-counts ~n×).
  *
  * Relational shape (why this is not q93/q98 again): the global instance
  * count is a groupBy on md5(n-gram) — constant-width key, map-side partial
  * aggregation collapses even a 10^9-instance boilerplate n-gram to one row
  * per input partition before the exchange — and instances flag themselves
  * via a semi-join against the duplicated-gram set (broadcast when small;
  * as a shuffle join it is AQE-skew-splittable, which a window over
  * partitionBy(g) — all of one n-gram's instances buffered in ONE task —
  * is not). Then one window exchange keyed on doc_id for the interval
  * merge (running-max island detection — per-partition state bounded by
  * doc length), and a final doc rollup that reuses the window's
  * partitioning. No pair join anywhere: coverage is a property of the
  * n-gram multiset, so output stays O(corpus positions) even at that
  * degenerate input — the one that blows up pairwise formulations. The
  * instance mint feeds both the count and the probe side, so it is
  * persisted ([[graft.core.CacheScope]]) rather than re-minted.
  *
  * The corpus exercises all three span shapes deterministically via the
  * SAME boilerplate planting as q98 (one shared 16-word prefix across the
  * doc_id % 7 == 3 docs → cross-doc partial coverage with unique bridge
  * n-grams into each doc's own text; the % 21 == 10 docs' doubled prefix →
  * intra-doc repeats; the corpus's planted exact-dup docs → full coverage),
  * and the DuckDB oracle replays instance minting, global counting, and the
  * island merge end to end — every covered-token count is hash-gated. */
object DupSpans {

  def dupSpanCoverage(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    val terms = (0 until n).map(j => s"ws[i+$j]").mkString(", ")
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), PassageDedup.plantedTextCol.as("text"))
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("source"), size(col("ws")).as("n_tokens"), col("ws"))
    val instances = graft.core.CacheScope.persist(docs.filter(col("n_tokens") >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, size(ws) - $n), i -> struct(cast(i as bigint) as pos, md5(concat_ws(' ', $terms)) as g))"))
        .as("s"))
      .select(col("doc_id"), col("s.pos"), col("s.g")))
    // global instance count per n-gram text (same-doc repeats count too):
    // a partial-aggregating groupBy + semi-join, NOT a window on g — a hot
    // n-gram's instances must never funnel into one task
    val dupGrams = instances.groupBy(col("g"))
      .agg(count(lit(1)).as("cnt")).filter(col("cnt") >= 2).select("g")
    val flagged = instances.join(dupGrams, Seq("g"), "left_semi")
      .select(col("doc_id"), col("pos").as("s"), (col("pos") + n).as("e"))
    // gaps-and-islands union of the flagged [s, e) intervals, per doc
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val islands = flagged
      .withColumn("prev_max_e",
        max(col("e")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("island",
        sum(when(col("s") >= coalesce(col("prev_max_e"), lit(Long.MinValue)), 1L).otherwise(0L))
          .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg((max(col("e")) - min(col("s"))).as("span"))
      .groupBy("doc_id").agg(sum(col("span")).as("covered"))
    docs.select(col("doc_id"), col("source"), col("n_tokens").cast("long").as("n_tokens"))
      .join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        coalesce(col("covered"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered"), lit(0L)).cast("double") / col("n_tokens"), 4)
          .as("dup_span_frac"))
  }

  /** DuckDB replay: identical planting, overlapping instance minting,
    * global count, island merge, and rollup. */
  def dupSpanCoverageOracleSql(n: Int = 8): String = {
    val terms = (1 to n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH base AS (${PassageDedup.plantedTextSql}),
       |d AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM base),
       |raw AS (SELECT doc_id, unnest(list_transform(range(0, len(ws) - ${n - 1}),
       |    i -> struct_pack(pos := i, g := md5($terms)))) AS s
       |  FROM d WHERE len(ws) >= $n),
       |inst AS (SELECT doc_id, CAST(s.pos AS BIGINT) AS pos, s.g AS g FROM raw),
       |f AS (SELECT doc_id, pos AS s, pos + $n AS e FROM (
       |  SELECT doc_id, pos, count(*) OVER (PARTITION BY g) AS cnt FROM inst) WHERE cnt >= 2),
       |isl AS (SELECT doc_id, s, e,
       |  sum(CASE WHEN s >= coalesce(prev_max_e, -1) THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY s ROWS UNBOUNDED PRECEDING) AS island
       |  FROM (SELECT doc_id, s, e,
       |    max(e) OVER (PARTITION BY doc_id ORDER BY s
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e FROM f)),
       |cov AS (SELECT doc_id, sum(span) AS covered FROM (
       |  SELECT doc_id, island, max(e) - min(s) AS span FROM isl GROUP BY 1, 2) GROUP BY 1)
       |SELECT d.doc_id, d.source, CAST(len(d.ws) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
       |  round(CAST(coalesce(cov.covered, 0) AS DOUBLE) / len(d.ws), 4) AS dup_span_frac
       |FROM d LEFT JOIN cov ON cov.doc_id = d.doc_id""".stripMargin
  }
}
