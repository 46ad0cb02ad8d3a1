package graft.frontier

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{FrontierEntry, Ids}

/** Frontier construction — the reference's work-list algebra
  * (crawler:203-215): known = archive-scan ∪ forum-conf; discovered =
  * sitemap ids anti-joined against known, capped; work-list = known ∪
  * discovered with a forums flag (archive.py:589-592).
  */
object Frontier {

  /** Overview-URL template — config.py:33-35 analog (synthetic host space
    * so politeness/host-salting has real key diversity; `nHosts` compresses
    * to one host for the reference's single-store shape). */
  def urlFor(id: String, nHosts: Int = 16): String = {
    val h = Math.floorMod(Ids.mix64(id.hashCode.toLong), nHosts.toLong)
    s"https://store-$h.example.com/detail/$id"
  }

  def hostOf(url: String): String = {
    val i = url.indexOf("://")
    val rest = url.substring(i + 3)
    val j = rest.indexOf('/')
    if (j < 0) rest else rest.substring(0, j)
  }

  /** Line-filter for config-derived id lists (`^[a-p]+$`, archive.py:637). */
  def validIdLines(raw: Dataset[String]): Dataset[String] = {
    raw.filter(col("value").rlike(Ids.LinePattern)).as(raw.encoder)
  }

  /** Strict 32-char id filter (discovery extraction, discover.py:48). */
  def validIds(raw: Dataset[String]): Dataset[String] =
    raw.filter(col("value").rlike(Ids.IdPattern)).as(raw.encoder)

  // ---- S3: sitemap shard discovery (discover.py:27-75), network-free ----
  // The transport (requests.get) is the only piece the sandbox can't run;
  // the parsing + fan-out semantics are full: index XML → generic shard
  // URLs → per-shard <loc> extraction → 32-char id regex → validity filter.

  /** Shard URLs from the sitemap INDEX document — `<loc>` elements kept
    * only in the generic `?shard=N&numshards=M` form (language-parameterized
    * shard urls return SUBSETS of the plain ones and are skipped,
    * discover.py:33-40). The index is one small document; parsing it
    * driver-side mirrors the reference exactly. */
  /** Minimal XML entity unescape for `<loc>` TEXT — spec-compliant sitemap
    * XML must escape `&` as `&amp;`, so the shard query strings arrive as
    * `?shard=0&amp;numshards=4`. */
  private[frontier] def xmlUnescape(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")

  def sitemapShardUrls(indexXml: String, sitemapBase: String): Seq[String] = {
    val generic = (java.util.regex.Pattern.quote(sitemapBase) + "\\?shard=\\d+&numshards=\\d+").r
    "<loc>([^<]*)</loc>".r.findAllMatchIn(indexXml)
      .map(m => xmlUnescape(m.group(1).trim))
      .filter(u => generic.pattern.matcher(u).matches())
      .toSeq
  }

  /** Distributed shard scan: (url, xml) shard documents → candidate ids.
    * One codegen'd pass: `regexp_extract_all` pulls every `<loc>` text,
    * explode fans them out, the 32-char lowercase run is the candidate id
    * (discover.py:46-48's `re.search("[a-z]{32}", url)`); [[validIds]]
    * downstream enforces the strict store alphabet. */
  def sitemapIds(shardDocs: DataFrame): Dataset[String] = {
    import shardDocs.sparkSession.implicits._
    shardDocs
      .select(explode(expr("regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)")).as("loc"))
      .select(regexp_extract(col("loc"), "[a-z]{32}", 0).as("value"))
      .filter(length(col("value")) === 32)
      .as[String]
  }

  /** Work-list build (crawler:203-215 + archive.py:589-592):
    * known ∪ (discovered ⟕anti known, limit maxNew), forums-flagged.
    *
    * With `store = Some(SeenStore)`, the pre-filter is the PERSISTED
    * two-tier probe (epoch bloom + per-run cuckoo spills) — no per-run full
    * scan of the seen corpus to rebuild it (the dominant constant of a
    * nightly run at 10^10 ids). The probe only loads when it provably
    * covers every committed url_seen version (SeenStore.loadProbe's crash
    * validation); otherwise this falls back to the full-rebuild path. Forum
    * ids (small config set) fold into the probe's bloom copy so the filter
    * still covers everything `known` contains; the exact anti-join
    * downstream is unchanged, so exactness never depends on the filter's
    * freshness. */
  def buildWorklist(spark: SparkSession,
                    existing: Dataset[String],
                    forumIds: Dataset[String],
                    discovered: Dataset[String],
                    maxNew: Int,
                    runId: Int,
                    nHosts: Int = 16,
                    store: Option[SeenStore] = None): Dataset[FrontierEntry] = {
    import spark.implicits._
    val known = existing.union(forumIds).distinct()
    val shardProbe = store.filter(_.sharded).flatMap(_.loadShardProbe(spark))
    val dedup: org.apache.spark.sql.DataFrame = if (shardProbe.isDefined) {
      // SHARDED epoch (10^10-key mode): bloom AND spill filters are
      // tables, candidates co-shuffle to their shard once
      // (SeenSet.shardedMaybeSeenTiers — every tier probed in one
      // cogroup); only the few-thousand-row forum filter rides as an
      // in-expression column probe
      val (shards, spillTables, _) = shardProbe.get
      val forumBloom = BlockedBloom.sized(8192)
      forumIds.distinct().toDF("value")
        .select(SeenSet.idHash(org.apache.spark.sql.functions.col("value")).as("h"))
        .as[Long].collect().foreach(forumBloom.add)
      // no persist on cand here: unlike the in-heap branch it has exactly
      // ONE consumer (the cogroup); `flagged` is the shared intermediate
      val cand = discovered.distinct().toDF("value")
      val h = SeenSet.idHash(org.apache.spark.sql.functions.col("value"))
      val flagged = graft.core.CacheScope.persist(
        SeenSet.shardedMaybeSeenTiers(spark, cand, "value", shards, spillTables,
          store.get.shardCount)
          .toDF("value", "in_shard")
          .withColumn("maybe", org.apache.spark.sql.functions.col("in_shard") ||
            BloomProbe.might(forumBloom, h)))
      flagged.filter(!org.apache.spark.sql.functions.col("maybe")).select("value")
        .union(flagged.filter(org.apache.spark.sql.functions.col("maybe")).select("value")
          .join(known.toDF("value"), Seq("value"), "left_anti"))
    } else store.flatMap(_.loadProbe()) match {
      case Some(SeenProbe(bloom, spills, _)) =>
        // forum list = config-file lines (archive.py:634-639), a few
        // thousand rows — fold their xxhash64s into the epoch filter copy
        forumIds.distinct().toDF("value")
          .select(SeenSet.idHash(org.apache.spark.sql.functions.col("value")).as("h"))
          .as[Long].collect().foreach(bloom.add)
        val h = SeenSet.idHash(org.apache.spark.sql.functions.col("value"))
        // maybe-seen if ANY tier says so; each filter ships once per
        // executor via addReferenceObj (≤ maxSpillRuns small spills)
        val probe = spills.foldLeft(BloomProbe.might(bloom, h))(
          (acc, sp) => acc || CuckooProbe.might(sp, h))
        val cand = graft.core.CacheScope.persist(discovered.distinct().toDF("value"))
        cand.filter(!probe)
          .union(cand.filter(probe).join(known.toDF("value"), Seq("value"), "left_anti"))
      case None =>
        SeenSet.dedupWithBloom(
          spark, discovered.distinct().toDF("value"), known.toDF("value"), "value",
          expectedSeen = 1 << 20)
    }
    // scope-registered persist: the crawl loop unpersists it at round end
    // (CacheScope.withScope), so iterative crawls don't leak cached rounds
    val freshAll = graft.core.CacheScope.persist(dedup)
    // deterministic cap (discover.py:66-73). A global sort+limit with
    // k ≈ |fresh| funnels everything through one CollectLimit partition —
    // bypass it when the cap isn't binding (the common case), so the cap
    // costs one count() instead of a global top-k.
    val fresh: Dataset[String] =
      if (freshAll.count() <= maxNew) freshAll.as[String]
      else freshAll.orderBy("value").limit(maxNew).as[String]
    // distinct: a duplicated forum id would duplicate its frontier row
    // through the flag join (set semantics, crawler:204)
    val forumsSet = forumIds.distinct().toDF("fid")
    // known is distinct by construction; fresh is distinct AND anti-joined
    // against known → the union is already a set. No distinct = one fewer
    // full shuffle of the frontier.
    // No broadcast hint on the forums flag join: small forum sets broadcast
    // via AQE on their own; large ones must shuffle — a forced broadcast
    // serializes the driver on hash-table build (Amdahl at bench scale,
    // OOM risk at 10^10 scale).
    known.union(fresh).toDF("id")
      .join(forumsSet, col("id") === col("fid"), "left")
      .select(col("id"), col("fid").isNotNull.as("forums"))
      .as[(String, Boolean)]
      .map { case (id, forums) =>
        val url = urlFor(id, nHosts)
        FrontierEntry(id, url, hostOf(url), forums, runId)
      }
  }
}
