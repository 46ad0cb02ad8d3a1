package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** q103 — C4-style line-level cleaning (LLM-pipeline mandate; no reference
  * analog): the public C4 heuristics (Raffel et al. 2020, §2.2) applied per
  * LINE inside each document, before the document reaches doc-level gates —
  * web text carries navigation stubs, cookie banners and script warnings
  * that doc-level quality scores (q18) average away.
  *
  * Keep a line iff ALL of:
  *   - it ends in terminal punctuation (`.` / `!` / `?`),
  *   - it has at least [[MinLineWords]] whitespace words,
  *   - its lowercase form contains none of the boilerplate markers
  *     (`javascript`, `cookie`, `lorem ipsum`) and no `{` (C4's
  *     curly-brace/code marker, applied at line granularity here).
  * A document survives (`keep_doc`) iff at least [[MinKeptLines]] lines
  * survive — C4's "at least three sentences" page rule.
  *
  * The synthetic corpus is single-line and unpunctuated, so the operator
  * PLANTS a deterministic multi-line body from `doc_id` arithmetic (the
  * q67/q91 closed-form-synthesis convention): every rule fires on a known
  * id class, and both engines build the identical text, which puts the
  * split, every per-line decision, the reassembled text (via
  * `md5(cleaned)`), and the doc-level rule inside the oracle hash gate.
  *
  * Scale shape: a pure codegen projection — `split` + higher-order
  * `filter`/`aggregate` over the line array, zero shuffles, no state;
  * cleaning 100 TB costs one scan, embarrassingly parallel.
  */
object LineClean {

  val MinLineWords = 5
  val MinKeptLines = 3

  private val Markers = Seq("javascript", "cookie", "lorem ipsum")

  /** Deterministic multi-line planting — a pure function of (doc_id, text).
    * Line classes: a well-formed intro (always kept), the raw corpus words
    * (dropped: no terminal punctuation), one rotating bad line per id mod 4
    * (boilerplate / too short / cookie banner), a second good line on id
    * mod 5, a third on id mod 10 (those docs clear the ≥3-lines page rule),
    * and a curly-brace code line on id mod 9. */
  private[text] def plantedLines: Column = concat(
    concat(lit("intro line for document "), col("doc_id").cast("string"),
      lit(" with plenty of words here.")),
    lit("\n"), col("text"),
    when(col("doc_id") % 4 === 1,
      lit("\nplease enable javascript to continue reading this page."))
      .when(col("doc_id") % 4 === 2, lit("\ntoo short."))
      .when(col("doc_id") % 4 === 3,
        lit("\nthis site uses cookies to improve your browsing session."))
      .otherwise(lit("")),
    when(col("doc_id") % 9 === 0,
      lit("\nfunction f() { return the page template verbatim here; }"))
      .otherwise(lit("")),
    when(col("doc_id") % 5 === 0, concat(
      lit("\nclosing summary line number "), col("doc_id").cast("string"),
      lit(" ends properly.")))
      .otherwise(lit("")),
    when(col("doc_id") % 10 === 0,
      lit("\na third good sentence appears in this document as well."))
      .otherwise(lit("")))

  /** The per-line keep rule as a Column predicate (the oracle replays it
    * with the identical clause order inside `list_filter`). */
  private[text] def keepLine(l: Column): Column = {
    val base = substring(l, -1, 1).isin(".", "!", "?") &&
      size(split(l, " ")) >= MinLineWords &&
      !l.contains("{")
    Markers.foldLeft(base)((acc, m) => acc && !lower(l).contains(m))
  }

  /** q103 — per-document line-cleaning report: line counts before/after,
    * surviving word mass, the md5 of the reassembled cleaned text (the
    * hash gate over every kept-line DECISION and the reassembly order),
    * and the C4 page-level keep flag. */
  def lineClean(spark: SparkSession, dir: String): DataFrame = {
    val lines = split(col("text"), "\n")
    val kept  = filter(lines, keepLine _)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), plantedLines.as("text"))
      .select(col("doc_id"), col("source"), lines.as("lines"), kept.as("kept"))
      .select(
        col("doc_id"), col("source"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        aggregate(col("kept"), lit(0L),
          (acc, x) => acc + size(split(x, " ")).cast("long")).as("kept_words"),
        md5(concat_ws("\n", col("kept"))).as("cleaned_md5"),
        (size(col("kept")) >= MinKeptLines).as("keep_doc"))
  }

  /** DuckDB replay: identical planting arithmetic, identical keep rule
    * (clause for clause), identical reassembly separator. */
  def lineCleanOracleSql(): String = {
    val markers = Markers
      .map(m => s"NOT contains(lower(x), '$m')").mkString(" AND ")
    s"""WITH p AS (SELECT doc_id, source,
       |  'intro line for document ' || doc_id || ' with plenty of words here.' ||
       |  chr(10) || text ||
       |  CASE WHEN doc_id % 4 = 1 THEN chr(10) || 'please enable javascript to continue reading this page.'
       |       WHEN doc_id % 4 = 2 THEN chr(10) || 'too short.'
       |       WHEN doc_id % 4 = 3 THEN chr(10) || 'this site uses cookies to improve your browsing session.'
       |       ELSE '' END ||
       |  CASE WHEN doc_id % 9 = 0 THEN chr(10) || 'function f() { return the page template verbatim here; }' ELSE '' END ||
       |  CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'closing summary line number ' || doc_id || ' ends properly.' ELSE '' END ||
       |  CASE WHEN doc_id % 10 = 0 THEN chr(10) || 'a third good sentence appears in this document as well.' ELSE '' END
       |  AS text FROM documents),
       |l AS (SELECT doc_id, source, string_split(text, chr(10)) AS lines FROM p),
       |k AS (SELECT doc_id, source, lines,
       |  list_filter(lines, x -> right(x, 1) IN ('.', '!', '?')
       |    AND len(string_split(x, ' ')) >= $MinLineWords
       |    AND NOT contains(x, '{') AND $markers) AS kept FROM l)
       |SELECT doc_id, source,
       |  CAST(len(lines) AS BIGINT) AS n_lines,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  CAST(coalesce(list_sum(list_transform(kept, x -> len(string_split(x, ' ')))), 0) AS BIGINT) AS kept_words,
       |  md5(array_to_string(kept, chr(10))) AS cleaned_md5,
       |  len(kept) >= $MinKeptLines AS keep_doc
       |FROM k""".stripMargin
  }
}
