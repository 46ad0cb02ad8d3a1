package graft.frontier

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.core.Ids
import org.apache.spark.sql.functions.col

/** Persistent two-tier seen-state: epoch bloom + per-run cuckoo spills,
  * crash validation against the url_seen version chain, epoch rolls with a
  * PERSISTED capacity budget. */
class SeenStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ids(lo: Int, hi: Int) = (lo until hi).map(i => Ids.syntheticId(i.toLong))

  private def hashesOf(xs: Seq[Long]) =
    spark.createDataset(xs).toDF("h").as[Long]

  /** Simulate a committed url_seen snapshot version (manifest file only —
    * the store validates against the version listing, not the data). */
  private def fakeSeenCommit(dir: String, v: Int): Unit = {
    val m = Paths.get(dir, "url_seen", "manifests")
    Files.createDirectories(m)
    Files.write(m.resolve(f"v$v%06d.json"), "{}".getBytes("UTF-8"))
    ()
  }

  test("incremental path == rebuild path across runs; no per-run corpus scan needed") {
    val dir = Files.createTempDirectory("graft_seenstore").toString
    val store = new SeenStore(dir, expectedKeys = 1 << 16)
    val forum = spark.createDataset(ids(0, 7))

    // run 1: no epoch filter yet → identical to the rebuild path by definition
    val d1 = spark.createDataset(ids(0, 300))
    val f1 = Frontier.buildWorklist(spark, spark.emptyDataset[String], forum, d1,
      maxNew = 1000, runId = 1, store = Some(store))
      .collect().map(e => (e.id, e.forums)).toSet
    val f1ref = Frontier.buildWorklist(spark, spark.emptyDataset[String], forum, d1,
      maxNew = 1000, runId = 1)
      .collect().map(e => (e.id, e.forums)).toSet
    assert(f1 == f1ref)

    // graduate run 1's ids (first commit = epoch roll: builds the bloom)
    fakeSeenCommit(dir, 1)
    val h1 = spark.createDataset(ids(0, 300))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (rolled1, n1) = store.commitRun(spark, h1, 300, seenVersion = 1, h1, 300)
    assert(rolled1 && n1 == 300 && store.bloomExists)

    // run 2: overlapping + fresh discoveries; the store path must equal the
    // full-rebuild path exactly (filters are a pre-filter, anti-join exact)
    val existing = spark.createDataset(ids(0, 300))
    val d2 = spark.createDataset(ids(150, 500))
    val inc = Frontier.buildWorklist(spark, existing, forum, d2,
      maxNew = 1000, runId = 2, store = Some(store))
      .collect().map(e => (e.id, e.forums)).toSet
    val ref = Frontier.buildWorklist(spark, existing, forum, d2,
      maxNew = 1000, runId = 2)
      .collect().map(e => (e.id, e.forums)).toSet
    assert(inc == ref, "epoch-probe dedup must match the rebuild path")

    // graduate run 2 as a SPILL (O(delta)) and check run 3 parity again —
    // now the probe has both tiers live
    fakeSeenCommit(dir, 2)
    val h2 = spark.createDataset(ids(300, 500))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (rolled2, n2) = store.commitRun(spark, h2, 200, seenVersion = 2,
      fullCorpusHashes = fail("spill path must not scan the corpus"),
      fullCount = fail("spill path must not count the corpus"))
    assert(!rolled2 && n2 == 500)
    val existing3 = spark.createDataset(ids(0, 500))
    val d3 = spark.createDataset(ids(400, 800))
    val inc3 = Frontier.buildWorklist(spark, existing3, forum, d3,
      maxNew = 1000, runId = 3, store = Some(store))
      .collect().map(e => (e.id, e.forums)).toSet
    val ref3 = Frontier.buildWorklist(spark, existing3, forum, d3,
      maxNew = 1000, runId = 3)
      .collect().map(e => (e.id, e.forums)).toSet
    assert(inc3 == ref3, "bloom+spill dedup must match the rebuild path")
  }

  test("spill commit is O(delta): the epoch bloom file is not rewritten") {
    val dir = Files.createTempDirectory("graft_seenstore_spill").toString
    val store = new SeenStore(dir, expectedKeys = 1 << 16)
    fakeSeenCommit(dir, 1)
    store.commitRun(spark, hashesOf((0 until 500).map(i => Ids.mix64(i.toLong))),
      500, seenVersion = 1, hashesOf((0 until 500).map(i => Ids.mix64(i.toLong))), 500)
    val bloomBytes = Files.readAllBytes(Paths.get(dir, "url_seen_bloom.bin"))
    fakeSeenCommit(dir, 2)
    val delta = (500 until 700).map(i => Ids.mix64(i.toLong))
    val (rolled, covered) = store.commitRun(spark, hashesOf(delta), 200, seenVersion = 2,
      fullCorpusHashes = fail("spill path must not scan the corpus"),
      fullCount = fail("spill path must not count the corpus"))
    assert(!rolled && covered == 700)
    assert(java.util.Arrays.equals(bloomBytes,
      Files.readAllBytes(Paths.get(dir, "url_seen_bloom.bin"))),
      "spill commit must leave the multi-GB epoch bloom file untouched")
    // the spill covers the delta (no false negatives through the probe)
    val probe = store.loadProbe().get
    assert(delta.forall(h => probe.spills.exists(_.mightContain(h))))
    assert(probe.coveredKeys == 700)
  }

  test("crash gap: a url_seen version without its spill invalidates the probe; next commit heals by rolling") {
    val dir = Files.createTempDirectory("graft_seenstore_crash").toString
    val store = new SeenStore(dir, expectedKeys = 1 << 16)
    fakeSeenCommit(dir, 1)
    val h1 = (0 until 400).map(i => Ids.mix64(i.toLong))
    store.commitRun(spark, hashesOf(h1), 400, seenVersion = 1, hashesOf(h1), 400)
    assert(store.loadProbe().isDefined)
    // crash: run 2 commits its url_seen snapshot but dies before commitRun
    fakeSeenCommit(dir, 2)
    assert(store.loadProbe().isEmpty,
      "a version gap means the filter under-covers — the probe must refuse to load")
    // run 3 commits; the store heals with a roll from the authoritative corpus
    fakeSeenCommit(dir, 3)
    val all = (0 until 900).map(i => Ids.mix64(i.toLong))
    val (rolled, covered) = store.commitRun(spark,
      hashesOf((700 until 900).map(i => Ids.mix64(i.toLong))), 200, seenVersion = 3,
      hashesOf(all), 900)
    assert(rolled && covered == 900)
    val probe = store.loadProbe().get
    assert(all.forall(probe.bloom.mightContain), "healed epoch covers the corpus")
  }

  test("roll capacity is PERSISTED: a corpus past the constructor default rolls once, then spills") {
    val dir = Files.createTempDirectory("graft_seenstore_budget").toString
    // constructor budget 1024; the corpus will grow to 1300 > 1024
    val store = new SeenStore(dir, expectedKeys = 1024)
    fakeSeenCommit(dir, 1)
    val h1 = (0 until 600).map(i => Ids.mix64(i.toLong))
    val (r1, _) = store.commitRun(spark, hashesOf(h1), 600, 1, hashesOf(h1), 600)
    assert(r1, "first commit builds the epoch")
    fakeSeenCommit(dir, 2)
    val all2 = (0 until 1300).map(i => Ids.mix64(i.toLong))
    val h2 = (600 until 1300).map(i => Ids.mix64(i.toLong))
    val (r2, n2) = store.commitRun(spark, hashesOf(h2), 700, 2, hashesOf(all2), 1300)
    assert(r2 && n2 == 1300, "600-key budget exhausted → epoch roll from the corpus")
    // REGRESSION (round-2 advice): the roll persisted capacity 2×1300, so the
    // next small delta must take the spill path — not re-roll every run
    fakeSeenCommit(dir, 3)
    val h3 = (1300 until 1400).map(i => Ids.mix64(i.toLong))
    val (r3, n3) = store.commitRun(spark, hashesOf(h3), 100, seenVersion = 3,
      fullCorpusHashes = fail("capacity must come from the persisted meta, not the constructor"),
      fullCount = fail("no corpus count on the spill path"))
    assert(!r3 && n3 == 1400)
    val probe = store.loadProbe().get
    assert(all2.forall(probe.bloom.mightContain))
    assert(h3.forall(h => probe.spills.exists(_.mightContain(h))))
  }

  test("sharded epoch mode: table-resident shards + spills dedup exactly like the rebuild path") {
    val dir = Files.createTempDirectory("graft_seenstore_sharded").toString
    val store = new SeenStore(dir, expectedKeys = 1 << 16, numShards = 8)
    val forum = spark.createDataset(ids(0, 7))

    // run 1: no epoch → rebuild-path parity by definition; commit ROLLS
    // into the parquet shard table (not a single bloom file)
    fakeSeenCommit(dir, 1)
    val h1 = spark.createDataset(ids(0, 400))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (r1, n1) = store.commitRun(spark, h1, 400, seenVersion = 1, h1, 400)
    assert(r1 && n1 == 400)
    assert(Files.isDirectory(Paths.get(dir, "url_seen_bloom_shards")))
    assert(!Files.exists(Paths.get(dir, "url_seen_bloom.bin")),
      "sharded mode must not write the single-filter artifact")
    assert(store.loadProbe().isEmpty, "in-heap probe is not available in sharded mode")

    // run 2: spill commit (O(delta), shard table untouched), then the
    // frontier's sharded dedup must equal the exact rebuild path
    fakeSeenCommit(dir, 2)
    val h2 = spark.createDataset(ids(400, 600))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (r2, n2) = store.commitRun(spark, h2, 200, seenVersion = 2,
      fullCorpusHashes = fail("spill path must not scan the corpus"),
      fullCount = fail("spill path must not count the corpus"))
    assert(!r2 && n2 == 600)
    // the spill is TABLE-RESIDENT in sharded mode: a (shard, cuckooBytes)
    // parquet dir + sidecar count json, never a single in-heap .bin whose
    // geometry cap would force epoch rolls on big nightly deltas
    assert(Files.isDirectory(Paths.get(dir, "url_seen_spill-v000002.shards")))
    assert(Files.exists(Paths.get(dir, "url_seen_spill-v000002.json")))
    assert(!Files.exists(Paths.get(dir, "url_seen_spill-v000002.bin")),
      "sharded mode must not write a monolithic spill filter")
    val existing = spark.createDataset(ids(0, 600))
    val d3 = spark.createDataset(ids(300, 1000))
    val inc = Frontier.buildWorklist(spark, existing, forum, d3,
      maxNew = 2000, runId = 3, store = Some(store))
      .collect().map(e => (e.id, e.forums)).toSet
    val ref = Frontier.buildWorklist(spark, existing, forum, d3,
      maxNew = 2000, runId = 3)
      .collect().map(e => (e.id, e.forums)).toSet
    assert(inc == ref, "sharded-probe dedup must match the rebuild path")

    // crash gap invalidates the sharded probe too
    fakeSeenCommit(dir, 3)
    assert(store.loadShardProbe(spark).isEmpty,
      "a version gap must invalidate the shard-table probe")

    // v3's own commit IS the heal: its spill closes the gap while the
    // chain stays contiguous, so no roll is needed
    val h3 = spark.createDataset(ids(600, 700))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (r3, _) = store.commitRun(spark, h3, 100, seenVersion = 3,
      fullCorpusHashes = fail("spill path must not scan the corpus"),
      fullCount = fail("spill path must not count the corpus"))
    assert(!r3, "committing the missing version's spill heals without rolling")
    assert(store.loadShardProbe(spark).isDefined)
    // now simulate a crash BETWEEN the spill table's directory move and its
    // sidecar json (the publish point): the half-written spill must be
    // invisible, so the probe invalidates
    fakeSeenCommit(dir, 4)
    val h4 = spark.createDataset(ids(700, 750))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (r4, _) = store.commitRun(spark, h4, 50, seenVersion = 4,
      fullCorpusHashes = fail("spill path must not scan the corpus"),
      fullCount = fail("spill path must not count the corpus"))
    assert(!r4)
    Files.delete(Paths.get(dir, "url_seen_spill-v000004.json"))
    assert(store.loadShardProbe(spark).isEmpty,
      "a spill table without its sidecar json must read as a version gap")
    // a MALFORMED sidecar (partial write on a non-atomic filesystem) must
    // read as a gap too — silently counting 0 keys would let the bloom
    // overfill past its persisted capacity with no signal
    Files.write(Paths.get(dir, "url_seen_spill-v000004.json"),
      "{\"cou".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(store.loadShardProbe(spark).isEmpty,
      "a corrupt sidecar json must read as a version gap, not count 0")
  }

  test("maxSpillRuns consolidation: spills accumulate then one roll absorbs them") {
    val dir = Files.createTempDirectory("graft_seenstore_consol").toString
    val store = new SeenStore(dir, expectedKeys = 1 << 16, maxSpillRuns = 2)
    var corpus = Seq.empty[Long]
    var rolls = 0
    (1 to 5).foreach { v =>
      fakeSeenCommit(dir, v)
      val delta = ((v - 1) * 100 until v * 100).map(i => Ids.mix64(i.toLong))
      corpus = corpus ++ delta
      val c = corpus
      val (rolled, _) = store.commitRun(spark, hashesOf(delta), 100, v,
        hashesOf(c), c.size.toLong)
      if (rolled) rolls += 1
    }
    // v1 roll (initial epoch), v2+v3 spill, v4 roll (maxSpillRuns=2 hit), v5 spill
    assert(rolls == 2, s"expected initial + one consolidation roll, got $rolls")
    val probe = store.loadProbe().get
    assert(corpus.forall(h =>
      probe.bloom.mightContain(h) || probe.spills.exists(_.mightContain(h))))
  }
}
