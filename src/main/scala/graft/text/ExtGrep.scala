package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.Tables

/** The reference's `extgrep` composed as ONE catalog query
  * (extgrep:97-161): a date-bounded scan of the archive's latest content →
  * per-pattern match → per-(date, pattern) rollup.
  *
  * The likely-hash router (extgrep:38-56) is reproduced faithfully WHERE the
  * reference runs it: on the PATTERN, driver-side, before the scan — a
  * pattern that "looks like a hash" (32/40/64 hex chars, high Shannon
  * entropy) routes to md5-equality against the content hash instead of a
  * regex scan (the reference greps its md5 columns for such patterns). The
  * routing decision is over a handful of literal strings, so the BIG scan
  * stays fully declarative: one date-pruned pass, each pattern evaluated as
  * a codegen'd boolean, exploded to (pattern, hit) and aggregated — no
  * per-pattern rescans.
  */
object ExtGrep {

  final case class Pattern(name: String, expr: String)

  /** extgrep:38-56 — the pattern classifier: hex-digest shape + entropy
    * above the reference's threshold (≥ 2.0 bits over alphanumerics). */
  def looksLikeHash(p: String): Boolean =
    Set(32, 40, 64).contains(p.length) &&
      p.matches("[0-9a-fA-F]+") &&
      graft.functions.ExprImpl.shannonEntropy(UTF8String.fromString(p)) >= 2.0

  /** Default pattern set for the catalog query: two content regexes plus a
    * hash-shaped digest (md5("password") — routes to the hash tier). */
  val DefaultPatterns: Seq[Pattern] = Seq(
    Pattern("k_sixty", "\"k\": 6[0-9]"),
    Pattern("k_single_digit", "\"k\": [0-9]\\}"),
    Pattern("digest_probe", "5f4dcc3b5aa765d61d8327deb882cf99"))

  /** Date-bounded grep: scan rows with `ts` in [from, until), match every
    * pattern (regex tier or hash tier per [[looksLikeHash]]), roll up match
    * counts per (day, pattern). */
  def grep(spark: SparkSession, dir: String,
           from: String = "2024-01-08", until: String = "2024-01-22",
           patterns: Seq[Pattern] = DefaultPatterns): DataFrame = {
    val matchStructs: Seq[Column] = patterns.map { p =>
      val hit: Column =
        if (looksLikeHash(p.expr)) md5(col("props")) === lit(p.expr.toLowerCase)
        else col("props").rlike(p.expr)
      struct(lit(p.name).as("pattern"), hit.as("hit"))
    }
    Tables.events(spark, dir)
      // P5 date bound — reaches the scan as a pushed filter
      .filter(col("ts") >= lit(from).cast("timestamp") &&
        col("ts") < lit(until).cast("timestamp"))
      .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
        explode(array(matchStructs: _*)).as("m"))
      .filter(col("m.hit"))
      .groupBy(col("day"), col("m.pattern").as("pattern"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** extgrep over the ARCHIVE — the reference's actual input: it walks
    * dated tar members inside a lexicographic date window and greps file
    * content per crawl date (extgrep:97-161; the per-date member loop
    * :128-148). Composed here over the same crawl_date-windowed archive
    * slice the create-db rebuild uses (CreateDb.archiveRows/slice), one
    * scan, patterns exploded — the q62 shape re-pointed at archived
    * payloads instead of the event stream. The `rev_marker` pattern only
    * matches second-crawl bodies, so the per-date rollup proves the grep
    * sees each crawl's OWN content, not the latest. */
  val ArchivePatterns: Seq[Pattern] = Seq(
    Pattern("w_spark", "\\bspark\\b"),
    Pattern("w_merge", "\\bmerge\\b"),
    Pattern("rev_marker", "rev2$"))

  def grepArchive(spark: SparkSession, dir: String,
                  from: String = "2024-01-03", until: String = "2024-01-25",
                  patterns: Seq[Pattern] = ArchivePatterns): DataFrame = {
    val matchStructs: Seq[Column] = patterns.map { p =>
      struct(lit(p.name).as("pattern"), col("text").rlike(p.expr).as("hit"))
    }
    graft.etl.CreateDb.slice(graft.etl.CreateDb.archiveRows(spark, dir), from, until)
      .select(col("crawl_date"), explode(array(matchStructs: _*)).as("m"))
      .filter(col("m.hit"))
      .groupBy(col("crawl_date"), col("m.pattern").as("pattern"))
      .agg(count(lit(1)).as("n_matches"))
  }

  /** DuckDB replay of [[grepArchive]] with [[ArchivePatterns]]. Same
    * s-interpolator caveat as below: `\\b` ships as `\b`. */
  def grepArchiveOracleSql(from: String = "2024-01-03", until: String = "2024-01-25"): String =
    s"""WITH arch AS (
       |  SELECT doc_id, text,
       |    '2024-01-' || lpad(CAST(doc_id % 14 + 1 AS VARCHAR), 2, '0') AS crawl_date
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, text || ' rev2',
       |    '2024-01-' || lpad(CAST(doc_id % 14 + 15 AS VARCHAR), 2, '0')
       |  FROM documents),
       |sliced AS (SELECT * FROM arch
       |  WHERE crawl_date >= '$from' AND crawl_date < '$until'),
       |p(pattern, rx) AS (VALUES
       |  ('w_spark', '\\bspark\\b'),
       |  ('w_merge', '\\bmerge\\b'),
       |  ('rev_marker', 'rev2$$'))
       |SELECT crawl_date, pattern, count(*) AS n_matches
       |FROM sliced, p WHERE regexp_matches(text, rx)
       |GROUP BY crawl_date, pattern""".stripMargin

  /** The DuckDB oracle replay of [[grep]] with [[DefaultPatterns]] — the
    * routing outcome is baked into the SQL the same way extgrep bakes it
    * into the generated query. NOTE the `s"""` interpolator processes
    * escapes (unlike a plain triple-quoted literal), so `\\}` below ships
    * as `\}` — byte-identical to the Spark pattern. */
  def grepOracleSql(from: String = "2024-01-08", until: String = "2024-01-22"): String =
    s"""WITH e AS (SELECT strftime(ts, '%Y-%m-%d') AS day, props FROM events
       |  WHERE ts >= TIMESTAMP '$from' AND ts < TIMESTAMP '$until'),
       |p(pattern, rx, is_hash) AS (VALUES
       |  ('k_sixty', '"k": 6[0-9]', false),
       |  ('k_single_digit', '"k": [0-9]\\}', false),
       |  ('digest_probe', '5f4dcc3b5aa765d61d8327deb882cf99', true))
       |SELECT day, pattern, count(*) AS n_matches
       |FROM e, p
       |WHERE (is_hash AND md5(e.props) = lower(rx))
       |   OR (NOT is_hash AND regexp_matches(e.props, rx))
       |GROUP BY day, pattern""".stripMargin
}
