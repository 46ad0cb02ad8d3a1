package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.snapshot.SnapshotTable

/** The composed `create-db` re-ETL driver — "the relational store is
  * re-derivable from the golden archive" (database/README.md:63-69).
  *
  * The reference rebuilds its entire DB from the tar archive in one job:
  * per extension, extract the tar once, then for every dated crawl inside
  * the LEXICOGRAPHIC [from, until] date window run the full incremental
  * loader — overview + child tables + comment dedup — against that date's
  * members (create-db:57-87; chunking :147-152; the per-date loop and date
  * compare :76-81). The invariant: the rebuilt store equals the store the
  * nightly incremental loads produced.
  *
  * Spark-first: the archive is a snapshot table partitioned by crawl_date
  * (date filter = partition pruning, not a tar walk), and the "extract the
  * tar once" discipline becomes ONE cached scan of the date slice feeding
  * all four derivations — overview projection (P8), token child (A6),
  * annotation child (F9), comment content table (md5-PK dedup) — instead of
  * four archive reads. Each child table keys on (doc_id, crawl_date, …),
  * the (extid, date) PK shape of the reference schemas (extension.sql:23-44,
  * review.sql:23-35); the comment table keys on commentmd5 alone
  * (review_comment.sql:23-28 content dedup ACROSS crawls).
  */
object CreateDb {

  final case class ChildTables(overview: DataFrame, tokens: DataFrame,
                               annotations: DataFrame, comments: DataFrame)

  val Keys: Seq[String] = Seq("doc_id", "crawl_date")

  /** The synthetic golden archive: every document crawled twice — day
    * `doc_id%14+1` (original text) and day `doc_id%14+15` (a revised body)
    * — so the date window selects different crawl sets per doc and the
    * rebuild provably processes per-(doc, date) rows, not per-doc. */
  def archiveRows(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val first = docs.select(col("doc_id"), col("text"), col("source"),
      concat(lit("2024-01-"),
        lpad((col("doc_id") % 14 + 1).cast("string"), 2, "0")).as("crawl_date"))
    val second = docs.select(col("doc_id"),
      concat(col("text"), lit(" rev2")).as("text"), col("source"),
      concat(lit("2024-01-"),
        lpad((col("doc_id") % 14 + 15).cast("string"), 2, "0")).as("crawl_date"))
    first.unionByName(second)
  }

  /** Lexicographic [from, until) date window over the archive —
    * create-db:76-81's `date < from_date / date > until_date` skip,
    * compared as strings exactly like the reference ("compared
    * lexographically", create-db:44-46). On the partitioned snapshot this
    * is partition pruning. */
  def slice(archive: DataFrame, from: String, until: String): DataFrame =
    archive.filter(col("crawl_date") >= from && col("crawl_date") < until)

  /** One-pass rebuild: cache the date slice, derive all four child tables
    * from it (the "extract the tar once per extension" discipline). The
    * persist registers with [[graft.core.CacheScope]] so a scoped caller
    * (crawl rounds, repeated bench sweeps) releases it at scope end
    * instead of pinning one slice per invocation for the session's life. */
  def rebuild(archiveSlice: DataFrame): ChildTables = {
    val s = graft.core.CacheScope.persist(archiveSlice,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    ChildTables(
      overview = Etl.overviewMetadataFrom(s, Keys),
      tokens = Etl.tokenChildTableFrom(s, Keys),
      annotations = Etl.annotationsExplodeFrom(s, Keys),
      comments = Etl.commentTableFrom(s, Keys))
  }

  /** The q69 surface: rebuild over the default window and emit the store
    * summary — per table: rows, distinct PK-ish keys, and a content
    * checksum (sum over a value column) so the composed derivation is
    * hash-gated end to end, not just counted. */
  def rebuildSummary(spark: SparkSession, dir: String,
                     from: String = "2024-01-05", until: String = "2024-01-20"): DataFrame = {
    val t = rebuild(slice(archiveRows(spark, dir), from, until))
    val ov = t.overview.agg(
      count(lit(1)).as("n_rows"), countDistinct(col("doc_id")).as("n_keys"),
      sum(col("downloads")).as("chk")).select(lit("overview").as("tbl"), col("*"))
    val tok = t.tokens.agg(
      count(lit(1)).as("n_rows"), countDistinct(col("token_md5")).as("n_keys"),
      sum(length(col("token")).cast("long")).as("chk")).select(lit("tokens").as("tbl"), col("*"))
    val ann = t.annotations.agg(
      count(lit(1)).as("n_rows"), countDistinct(col("commentmd5")).as("n_keys"),
      sum(col("rating").cast("long")).as("chk")).select(lit("annotations").as("tbl"), col("*"))
    val cmt = t.comments.agg(
      count(lit(1)).as("n_rows"), countDistinct(col("commentmd5")).as("n_keys"),
      sum(col("n_refs")).as("chk")).select(lit("comments").as("tbl"), col("*"))
    ov.unionByName(tok).unionByName(ann).unionByName(cmt)
  }

  /** DuckDB replay of [[rebuildSummary]] — the archive synthesis, window,
    * and all four derivations composed in SQL (fragments shared in spirit
    * with the q44/q51/q52/q53 oracles, re-sourced from the sliced archive
    * and carrying crawl_date). Summed integers cast to BIGINT (HUGEINT
    * comparator hazard). */
  def summaryOracleSql(from: String = "2024-01-05", until: String = "2024-01-20"): String =
    s"""WITH arch AS (
       |  SELECT doc_id, text, source,
       |    '2024-01-' || lpad(CAST(doc_id % 14 + 1 AS VARCHAR), 2, '0') AS crawl_date
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, text || ' rev2', source,
       |    '2024-01-' || lpad(CAST(doc_id % 14 + 15 AS VARCHAR), 2, '0')
       |  FROM documents),
       |sliced AS (SELECT * FROM arch
       |  WHERE crawl_date >= '$from' AND crawl_date < '$until'),
       |tok AS (SELECT DISTINCT doc_id, crawl_date, md5(word) AS token_md5, word FROM (
       |    SELECT doc_id, crawl_date, unnest(string_split(trim(text), ' ')) AS word
       |    FROM sliced) t
       |  WHERE length(word) > 0),
       |ann AS (SELECT doc_id, crawl_date,
       |    '{"author":"u' || CAST(doc_id % 7 AS VARCHAR) || '","comment":"' ||
       |    substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1, 24) ||
       |    '","rating":' || CAST(doc_id % 5 + 1 AS VARCHAR) || '}' AS a FROM sliced),
       |p AS (SELECT doc_id, crawl_date, ')]}''' || chr(10) || '{"annotations":[' || a ||
       |  CASE WHEN doc_id % 3 = 0 THEN ',' || a ELSE '' END || ']}' AS payload FROM ann),
       |s AS (SELECT doc_id, crawl_date,
       |  substr(payload, strpos(payload, '{"')) AS body FROM p),
       |x AS (SELECT doc_id, crawl_date,
       |  json_extract_string(body, '$$.annotations[' || i || '].author') AS author,
       |  json_extract_string(body, '$$.annotations[' || i || '].comment') AS comment,
       |  CAST(json_extract(body, '$$.annotations[' || i || '].rating') AS INTEGER) AS rating
       |  FROM s CROSS JOIN (SELECT unnest([0, 1]) AS i)),
       |annx AS (SELECT DISTINCT doc_id, crawl_date, author, comment, rating,
       |  md5(comment) AS commentmd5 FROM x WHERE author IS NOT NULL),
       |cmt AS (SELECT md5(comment) AS commentmd5, count(*) AS n_refs
       |  FROM x WHERE author IS NOT NULL GROUP BY 1),
       |h AS (SELECT doc_id, crawl_date,
       |  '<span class="users">' || format('{:,}', doc_id % 1000000 * 977 + 1000) || ' users</span>' AS html
       |  FROM sliced),
       |ov AS (SELECT doc_id, crawl_date,
       |  CAST(replace(nullif(regexp_extract(html, '<span class="users">([0-9,]+) users', 1), ''),
       |    ',', '') AS BIGINT) AS downloads FROM h)
       |SELECT 'overview' AS tbl, count(*) AS n_rows,
       |  count(DISTINCT doc_id) AS n_keys, CAST(sum(downloads) AS BIGINT) AS chk FROM ov
       |UNION ALL SELECT 'tokens', count(*), count(DISTINCT token_md5),
       |  CAST(sum(length(word)) AS BIGINT) FROM tok
       |UNION ALL SELECT 'annotations', count(*), count(DISTINCT commentmd5),
       |  CAST(sum(rating) AS BIGINT) FROM annx
       |UNION ALL SELECT 'comments', count(*), count(DISTINCT commentmd5),
       |  CAST(sum(n_refs) AS BIGINT) FROM cmt""".stripMargin

  /** Commit the rebuilt tables as snapshot tables under `outDir` via the
    * MERGE sink — the reference's per-table ON-DUP-KEY inserts
    * (create-db → db.py → mysql_backend.py). Returns committed versions. */
  def commitAll(spark: SparkSession, outDir: String, t: ChildTables): Map[String, Int] = Map(
    "overview" -> Etl.mergeUpsert(spark,
      new SnapshotTable(spark, s"$outDir/overview"), t.overview
        .withColumn("__v", lit(1)), Keys, "__v", updatesUniqueByKey = true),
    "tokens" -> Etl.mergeUpsert(spark,
      new SnapshotTable(spark, s"$outDir/tokens"), t.tokens
        .withColumn("__v", lit(1)), Keys :+ "token_md5", "__v", updatesUniqueByKey = true),
    "annotations" -> Etl.mergeUpsert(spark,
      new SnapshotTable(spark, s"$outDir/annotations"), t.annotations
        .withColumn("__v", lit(1)), Keys ++ Seq("author", "commentmd5"), "__v",
      updatesUniqueByKey = true),
    "comments" -> Etl.mergeUpsert(spark,
      new SnapshotTable(spark, s"$outDir/comments"), t.comments
        .withColumn("__v", lit(1)), Seq("commentmd5"), "__v", updatesUniqueByKey = true))
}
