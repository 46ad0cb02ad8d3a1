package graft.etl

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The cdnjs catalog BUILD pipeline — the source side of S13.
  *
  * The reference constructs its library-detection hash dimension by walking
  * the cdnjs git tree into per-file records (cdnjs_git.py:165-190
  * `get_all_lib_files`: every file under the `ajax/libs` tree except
  * `package.json`/`.gitkeep`), parsing `(library, version)` out of the path
  * (`get_file_libinfo`, cdnjs_git.py:107-137), dating each release with the
  * file's FIRST commit (`get_add_date` cdnjs_git.py:38-51 — `git log
  * --reverse | head -1` — collected per (lib, version) in
  * `build_release_date_dic` :303-314), hashing every file at several
  * normalization tiers (update_database_for_file :195-244), and inserting in
  * chunks of 200 with up to 4 retries per chunk (:265-291).
  *
  * Spark-first: the tree walk becomes a deterministic release-file Dataset,
  * the per-release `git log` loop becomes ONE window-min over commit dates
  * (no per-group subprocess — the 100 TB shape), the path parse is a codegen
  * `regexp_extract` projection, and the chunked-retry insert is a
  * `foreachPartition` envelope ([[chunkedRetryInsert]]). The built catalog
  * feeds the existing detection joins (q54 exact tier, q63 hash dim) and the
  * U4 reconcile ([[Etl.reconcile]]) unchanged.
  */
object CdnjsCatalog {

  /** Synthetic release tree, derived deterministically from `documents`
    * (corpus docs, the q54 convention): path shape
    * `ajax/libs/<lib>/<version>/<file>` with occasional `package.json` /
    * `.gitkeep` members so the walk's exclusion filter has real work, plus
    * a per-file commit date (the git-history stand-in). */
  def releaseFiles(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("text"),
        concat(lit("ajax/libs/lib"), (col("doc_id") % 20).cast("string"),
          lit("/v"), (col("doc_id") % 7).cast("string"), lit("/"),
          when(col("doc_id") % 95 === 0, lit("package.json"))
            .when(col("doc_id") % 95 === 45, lit(".gitkeep"))
            .otherwise(concat(lit("file"), col("doc_id").cast("string"), lit(".js"))))
          .as("path"),
        concat(lit("2024-"),
          lpad(((col("doc_id") * 7) % 12 + 1).cast("string"), 2, "0"), lit("-"),
          lpad((col("doc_id") % 28 + 1).cast("string"), 2, "0")).as("commit_date"))

  /** The walk's member filter (cdnjs_git.py:170-179: basename not in
    * [package.json, .gitkeep]). */
  private def keptFiles(files: DataFrame): DataFrame =
    files.filter(!col("path").rlike("/(package\\.json|\\.gitkeep)$"))

  /** AS_IS-tier catalog records: one row per kept release file with
    * `(library, version)` parsed from the path, the release `add_date`
    * (min commit date per (library, version) — the `git log --reverse`
    * analog as a window, not a per-release git walk), full-content md5,
    * the q54-convention prefix hash `fh` (the cross-corpus match key for
    * this synthetic corpus, which has no exact-duplicate texts), size and
    * line count. The NORMALIZED tier (minced code lines) is
    * [[normalizedTier]] — same records over `Mincer.normalize` output. */
  def buildCatalog(spark: SparkSession, dir: String): DataFrame =
    catalogFrom(releaseFiles(spark, dir))

  /** AS_IS derivation over an arbitrary release-file frame — the shared
    * core of the full build and the delta path (which feeds it only the
    * touched releases' files). The add_date window is per (library,
    * version), so it is CORRECT on any release-complete subset. */
  def catalogFrom(files: DataFrame): DataFrame = {
    val parsed = keptFiles(files)
      .withColumn("library", regexp_extract(col("path"), "^ajax/libs/([^/]+)/", 1))
      .withColumn("version", regexp_extract(col("path"), "^ajax/libs/[^/]+/([^/]+)/", 1))
    parsed
      .withColumn("add_date",
        min(col("commit_date")).over(Window.partitionBy("library", "version")))
      .select(col("path"), col("library"), col("version"), col("add_date"),
        lit("AS_IS").as("typ"),
        md5(col("text")).as("md5"),
        md5(substring(col("text"), 1, 20)).as("fh"),
        length(col("text")).as("size"),
        size(split(col("text"), "\n", -1)).as("loc"))
  }

  /** NORMALIZED-tier records (file_identifiers.py:41-51 + cdnjs typ enum
    * cdnjs.sql:25): hash the mincer-normalized code view instead of the
    * raw bytes. Typed map (the mincer is a state machine) — covered by
    * spec, not the SQL oracle. */
  def normalizedTier(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parsed = keptFiles(releaseFiles(spark, dir))
      .withColumn("library", regexp_extract(col("path"), "^ajax/libs/([^/]+)/", 1))
      .withColumn("version", regexp_extract(col("path"), "^ajax/libs/[^/]+/([^/]+)/", 1))
      .withColumn("add_date",
        min(col("commit_date")).over(Window.partitionBy("library", "version")))
    parsed
      .select(col("path"), col("library"), col("version"), col("add_date"), col("text"))
      .as[(String, String, String, String, String)]
      .map { case (path, lib, ver, addDate, text) =>
        val (norm, loc) = graft.text.Mincer.normalize(if (text == null) "" else text)
        (path, lib, ver, addDate, "NORMALIZED",
          java.security.MessageDigest.getInstance("MD5").digest(
            norm.getBytes("UTF-8")).map("%02x".format(_)).mkString,
          norm.length, loc)
      }
      .toDF("path", "library", "version", "add_date", "typ", "md5", "size", "loc")
  }

  /** The q66 surface: build the catalog AND prove it feeds detection — the
    * per-release rollup (files, total loc, add_date) left-joined with the
    * count of query-corpus hits through the prefix-hash equi-join (q54's
    * exact tier, with the built dim broadcast as in q63). */
  def catalogBuildAndJoin(spark: SparkSession, dir: String): DataFrame = {
    val cat = buildCatalog(spark, dir)
    val queries = Tables.documents(spark, dir)
      .filter(col("doc_id") % 5 =!= 0)
      .select(md5(substring(col("text"), 1, 20)).as("fh"))
    val hits = queries
      .join(broadcast(cat.select("library", "version", "fh")), "fh")
      .groupBy("library", "version").agg(count(lit(1)).as("n_hits"))
    cat.groupBy("library", "version", "add_date")
      .agg(count(lit(1)).as("n_files"), sum(col("loc").cast("long")).as("total_loc"))
      .join(hits, Seq("library", "version"), "left")
      .na.fill(0L, Seq("n_hits"))
  }

  /** DuckDB replay of [[catalogBuildAndJoin]]. The windowed/summed integer
    * outputs are cast to BIGINT (DuckDB sums to HUGEINT, which the driver
    * comparator coerces to float64 — the q46/q61 lesson). */
  val catalogOracleSql: String =
    """WITH f AS (SELECT doc_id, text,
      |    'ajax/libs/lib' || CAST(doc_id % 20 AS VARCHAR) || '/v' ||
      |      CAST(doc_id % 7 AS VARCHAR) || '/' ||
      |      (CASE WHEN doc_id % 95 = 0 THEN 'package.json'
      |            WHEN doc_id % 95 = 45 THEN '.gitkeep'
      |            ELSE 'file' || CAST(doc_id AS VARCHAR) || '.js' END) AS path,
      |    '2024-' || lpad(CAST((doc_id * 7) % 12 + 1 AS VARCHAR), 2, '0') || '-' ||
      |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS commit_date
      |  FROM documents WHERE doc_id % 5 = 0),
      |kept AS (SELECT * FROM f
      |  WHERE NOT regexp_matches(path, '/(package\.json|\.gitkeep)$')),
      |parsed AS (SELECT doc_id, text, commit_date,
      |    regexp_extract(path, '^ajax/libs/([^/]+)/', 1) AS library,
      |    regexp_extract(path, '^ajax/libs/[^/]+/([^/]+)/', 1) AS version,
      |    md5(substr(text, 1, 20)) AS fh,
      |    len(string_split(text, chr(10))) AS loc
      |  FROM kept),
      |add_dates AS (SELECT library, version, min(commit_date) AS add_date
      |  FROM parsed GROUP BY 1, 2),
      |cat AS (SELECT p.*, a.add_date FROM parsed p
      |  JOIN add_dates a USING (library, version)),
      |q AS (SELECT md5(substr(text, 1, 20)) AS fh FROM documents WHERE doc_id % 5 <> 0),
      |hits AS (SELECT c.library, c.version, count(*) AS n_hits
      |  FROM q JOIN cat c USING (fh) GROUP BY 1, 2),
      |g AS (SELECT library, version, add_date, count(*) AS n_files,
      |    CAST(sum(loc) AS BIGINT) AS total_loc
      |  FROM cat GROUP BY 1, 2, 3)
      |SELECT g.library, g.version, g.add_date, g.n_files, g.total_loc,
      |  COALESCE(h.n_hits, 0) AS n_hits
      |FROM g LEFT JOIN hits h ON g.library = h.library AND g.version = h.version"""
      .stripMargin

  /** Incremental catalog UPDATE — the reference's git-pull delta path
    * (`pull_get_updated_lib_files` cdnjs_git.py:137-163 + the release-date
    * rebuild for the touched libvers, :290-314). The unit of re-derivation
    * is the RELEASE, not the file: `add_date` is a per-(library, version)
    * aggregate, so any release a changed path belongs to is re-derived in
    * full from the CURRENT tree — which also makes deletions converge (a
    * deleted file's release is touched; its prior rows drop with the
    * release and the re-derivation simply doesn't emit them). Exactly the
    * reference shape: `build_release_date_dic(changed libvers)` walks git
    * history per touched release, never per unchanged one.
    *
    * `deriveTiers` is the records derivation applied to the touched files
    * (default: the AS_IS tier, [[catalogFrom]]); a store holding more
    * tiers MUST pass the same derivation that built `prior`, or the
    * untouched tiers of changed files would carry stale hashes.
    *
    * Invariant (spec-gated): stale build + delta update == full rebuild,
    * and re-applying the same delta is a no-op. */
  def updateCatalog(spark: SparkSession, dir: String, prior: DataFrame,
                    changedPaths: DataFrame,
                    deriveTiers: DataFrame => DataFrame = catalogFrom): DataFrame = {
    def release(df: DataFrame): DataFrame = df.select(
      regexp_extract(col("path"), "^ajax/libs/([^/]+)/", 1).as("library"),
      regexp_extract(col("path"), "^ajax/libs/[^/]+/([^/]+)/", 1).as("version"))
    val changedReleases = release(changedPaths).distinct()
    // only the touched releases' files flow into the derivation — the walk
    // prunes BEFORE any hashing/windowing (at scale the release tree is
    // partitioned by (library, version): partition pruning)
    val touchedFiles = releaseFiles(spark, dir)
      .withColumn("library", regexp_extract(col("path"), "^ajax/libs/([^/]+)/", 1))
      .withColumn("version", regexp_extract(col("path"), "^ajax/libs/[^/]+/([^/]+)/", 1))
      .join(changedReleases, Seq("library", "version"), "left_semi")
      .drop("library", "version")
    val delta = deriveTiers(touchedFiles)
    // USING joins move key columns to the front — restore the prior's
    // column order so callers see a drop-in replacement catalog
    prior.join(changedReleases, Seq("library", "version"), "left_anti")
      .unionByName(delta)
      .select(prior.columns.map(col).toSeq: _*)
  }

  /** The chunked-retry insert envelope (cdnjs_git.py:265-291): each
    * partition's rows stream in chunks of `chunkSize`; a chunk is offered
    * to `insert` up to `maxRetries` times (the reference opens a fresh
    * connection per attempt and re-runs the WHOLE chunk — correctness rests
    * on the PK upsert making re-inserts idempotent, exactly as here); a
    * chunk that exhausts its retries is counted and skipped, not rethrown
    * (the reference logs "Giving up" and continues, :282-284). Returns
    * (chunksOk, chunksFailed) accumulated across all partitions. */
  def chunkedRetryInsert[T](ds: Dataset[T], chunkSize: Int = 200, maxRetries: Int = 4)(
      insert: Seq[T] => Unit): (Long, Long) = {
    require(chunkSize > 0 && maxRetries > 0)
    val ok = ds.sparkSession.sparkContext.longAccumulator("cdnjs_chunks_ok")
    val failed = ds.sparkSession.sparkContext.longAccumulator("cdnjs_chunks_failed")
    ds.foreachPartition { it: Iterator[T] =>
      it.grouped(chunkSize).foreach { chunk =>
        var retries = 0
        var success = false
        while (!success && retries < maxRetries) {
          try { insert(chunk); success = true; ok.add(1) }
          catch { case scala.util.control.NonFatal(_) => retries += 1 }
        }
        if (!success) failed.add(1)
      }
    }
    (ok.value, failed.value)
  }
}
