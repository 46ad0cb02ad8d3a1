package graft.etl

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Shared sink state for the chunked-retry envelope tests — static so the
  * foreachPartition closures (which run in executor threads of the local
  * master) and the test assert against the same maps. */
object FlakySink {
  val rows = new ConcurrentHashMap[Long, String]()
  val attempts = new ConcurrentHashMap[Int, AtomicInteger]()
  @volatile var failFirstN: Int = 0
  @volatile var poisonChunkOf: Long = -1L

  def reset(failFirst: Int, poison: Long = -1L): Unit = {
    rows.clear(); attempts.clear(); failFirstN = failFirst; poisonChunkOf = poison
  }

  /** Insert a chunk with injected failures: every chunk fails its first
    * `failFirstN` attempts; a chunk containing `poisonChunkOf` always
    * fails. Rows land keyed by PK, so re-inserted chunks are idempotent —
    * the same invariant the reference's ON-DUP-KEY PK gives it. */
  def insert(chunk: Seq[(Long, String)]): Unit = {
    val chunkKey = chunk.head._1.toInt
    val n = attempts.computeIfAbsent(chunkKey, _ => new AtomicInteger(0)).incrementAndGet()
    if (chunk.exists(_._1 == poisonChunkOf)) throw new RuntimeException("poisoned")
    // partial write BEFORE the failure: the retry must overwrite, not double
    chunk.take(chunk.size / 2).foreach { case (k, v) => rows.put(k, v) }
    if (n <= failFirstN) throw new RuntimeException(s"flaky attempt $n")
    chunk.foreach { case (k, v) => rows.put(k, v) }
  }
}

/** cdnjs catalog build (S13 source side, cdnjs_git.py:165-314) + the
  * chunked-retry insert envelope (:265-291). */
class CdnjsCatalogSpec extends SparkSpec {
  import org.apache.spark.sql.Row

  test("walk excludes package.json/.gitkeep members (cdnjs_git.py:170-179)") {
    val files = CdnjsCatalog.releaseFiles(spark, sf0001)
    val total = files.count()
    val excluded = files.filter(col("path").rlike("/(package\\.json|\\.gitkeep)$")).count()
    val kept = CdnjsCatalog.buildCatalog(spark, sf0001).count()
    assert(excluded > 0, "fixture must exercise the exclusion filter")
    assert(kept === total - excluded)
  }

  test("add_date is the FIRST commit date per (library, version) — the git log --reverse analog") {
    val cat = CdnjsCatalog.buildCatalog(spark, sf0001)
    // every row of a release carries the same add_date = min(commit_date)
    val files = CdnjsCatalog.releaseFiles(spark, sf0001)
      .filter(!col("path").rlike("/(package\\.json|\\.gitkeep)$"))
      .withColumn("library", regexp_extract(col("path"), "^ajax/libs/([^/]+)/", 1))
      .withColumn("version", regexp_extract(col("path"), "^ajax/libs/[^/]+/([^/]+)/", 1))
      .groupBy("library", "version").agg(min("commit_date").as("expect"))
    val mismatch = cat.select("library", "version", "add_date").distinct()
      .join(files, Seq("library", "version"))
      .filter(col("add_date") =!= col("expect"))
    assert(mismatch.count() === 0)
    // and a release with >1 file has ONE add_date, not per-file dates
    val multi = cat.groupBy("library", "version")
      .agg(countDistinct("add_date").as("n"), count(lit(1)).as("files"))
      .filter(col("files") > 1)
    assert(multi.filter(col("n") =!= 1).count() === 0)
  }

  test("NORMALIZED tier hashes the minced code view, not the raw bytes") {
    val asis = CdnjsCatalog.buildCatalog(spark, sf0001)
      .select(col("path"), col("md5").as("raw_md5"))
    val norm = CdnjsCatalog.normalizedTier(spark, sf0001)
    assert(norm.select("typ").distinct().collect().map(_.getString(0)).toSeq === Seq("NORMALIZED"))
    // same release files, one row each
    assert(norm.count() === asis.count())
    // spot-check one row against Mincer.normalize directly
    val row = CdnjsCatalog.releaseFiles(spark, sf0001)
      .filter(col("path").endsWith(".js")).orderBy("doc_id").head()
    val text = row.getAs[String]("text")
    val (expectNorm, expectLoc) = graft.text.Mincer.normalize(text)
    val got = norm.filter(col("path") === row.getAs[String]("path")).head()
    assert(got.getAs[Int]("loc") === expectLoc)
    val expectMd5 = java.security.MessageDigest.getInstance("MD5")
      .digest(expectNorm.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got.getAs[String]("md5") === expectMd5)
  }

  test("built catalog feeds the U4 reconcile against a prior catalog") {
    val cat = CdnjsCatalog.buildCatalog(spark, sf0001)
      .withColumn("relkey", concat_ws("/", col("library"), col("version")))
    // prior catalog = releases missing one version (the "outphased" case)
    val prior = cat.filter(col("version") =!= "v0")
      .select("relkey").union(spark.createDataFrame(
        java.util.List.of(Row("libX/v9")),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("relkey",
            org.apache.spark.sql.types.StringType)))))
    val rec = Etl.reconcile(prior, cat, "relkey").collect()
    val localOnly = rec.filter(r => r.getBoolean(1) && !r.getBoolean(2))
    val upstreamOnly = rec.filter(r => !r.getBoolean(1) && r.getBoolean(2))
    assert(localOnly.map(_.getString(0)).toSeq === Seq("libX/v9"))
    assert(upstreamOnly.nonEmpty && upstreamOnly.forall(_.getString(0).endsWith("/v0")))
  }

  test("delta update converges: genuinely stale catalog + changed set == full rebuild; idempotent") {
    import spark.implicits._
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.mkString("|")).sorted.toSeq
    val full = CdnjsCatalog.buildCatalog(spark, sf0001)
    // GENUINELY stale prior: built from a reduced tree in which some files
    // do not exist yet — so carried-forward rows of their releases hold a
    // DIFFERENT (stale) add_date whenever an added file carries the
    // release's min commit_date, the divergence a filtered-from-full stale
    // fixture can never exhibit
    val addedPaths = CdnjsCatalog.releaseFiles(spark, sf0001)
      .filter(substring(md5(col("path")), 1, 1).isin("a", "b", "c"))
      .select("path")
    val staleTree = CdnjsCatalog.releaseFiles(spark, sf0001)
      .join(addedPaths, Seq("path"), "left_anti")
    val staleBuilt = CdnjsCatalog.catalogFrom(staleTree)
    // …and the stale add_dates really differ somewhere (fixture strength)
    val addDateDrift = staleBuilt.select("library", "version", "add_date").distinct()
      .join(full.select(col("library"), col("version"),
        col("add_date").as("cur")).distinct(), Seq("library", "version"))
      .filter(col("add_date") =!= col("cur"))
    assert(addDateDrift.count() > 0, "stale fixture must drift at least one add_date")
    // plus a DELETED file: present in the stale prior, gone upstream
    val ghost = full.limit(1).withColumn("path", lit("ajax/libs/lib0/v0/ghost.js"))
      .withColumn("library", lit("lib0")).withColumn("version", lit("v0"))
    val stale = staleBuilt.unionByName(ghost)
    val changed = addedPaths
      .union(Seq("ajax/libs/lib0/v0/ghost.js").toDF("path"))
    val updated = CdnjsCatalog.updateCatalog(spark, sf0001, stale, changed)
    assert(sorted(updated) === sorted(full))
    // re-applying the same delta is a no-op (the reference's PK upsert)
    val again = CdnjsCatalog.updateCatalog(spark, sf0001, updated, changed)
    assert(sorted(again) === sorted(full))
  }

  test("chunked-retry envelope: transient failures retried, rows exactly-once via PK idempotence") {
    import spark.implicits._
    FlakySink.reset(failFirst = 2)
    val ds = spark.range(0, 1000).map(i => (i.longValue, s"v$i")).repartition(4)
    val (ok, failed) = CdnjsCatalog.chunkedRetryInsert(ds, chunkSize = 100, maxRetries = 4)(
      FlakySink.insert)
    assert(failed === 0L)
    assert(ok >= 10L) // >= ceil(1000/100); partition remainders may add chunks
    assert(FlakySink.rows.size === 1000)
    (0L until 1000L).foreach(i => assert(FlakySink.rows.get(i) === s"v$i"))
    // every chunk needed exactly failFirstN+1 attempts
    FlakySink.attempts.forEach((_, n) => assert(n.get() === 3))
  }

  test("chunked-retry envelope: a poisoned chunk gives up after maxRetries without sinking the run") {
    import spark.implicits._
    FlakySink.reset(failFirst = 0, poison = 500L)
    val ds = spark.range(0, 1000).map(i => (i.longValue, s"v$i")).coalesce(1)
    val (ok, failed) = CdnjsCatalog.chunkedRetryInsert(ds, chunkSize = 100, maxRetries = 4)(
      FlakySink.insert)
    assert(failed === 1L)
    assert(ok === 9L)
    // the poisoned chunk's rows are absent; all others landed
    assert(!FlakySink.rows.containsKey(500L))
    assert(FlakySink.rows.size === 900)
  }
}
