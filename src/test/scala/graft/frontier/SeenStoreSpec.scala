package graft.frontier

import java.nio.file.Files

import graft.SparkSpec
import graft.core.Ids
import org.apache.spark.sql.functions.col

/** Persistent two-tier seen-state: incremental epoch bloom across runs,
  * cuckoo delta with commit/abort, epoch rolls. */
class SeenStoreSpec extends SparkSpec {
  import spark.implicits._

  private def ids(lo: Int, hi: Int) = (lo until hi).map(i => Ids.syntheticId(i.toLong))

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

    // graduate run 1's ids into the epoch filter
    val h1 = spark.createDataset(ids(0, 300))
      .toDF("value").select(SeenSet.idHash(col("value")).as("h")).as[Long]
    val (rolled1, n1) = store.commitRun(spark, h1, 300, h1, 300)
    assert(!rolled1 && n1 == 300 && store.bloomExists)

    // run 2: overlapping + fresh discoveries; the store path must equal the
    // full-rebuild path exactly (bloom is a pre-filter, anti-join is exact)
    val existing = spark.createDataset(ids(0, 300))
    val d2 = spark.createDataset(ids(150, 500))
    val inc = Frontier.buildWorklist(spark, existing, forum, d2,
      maxNew = 1000, runId = 2, store = Some(store))
      .collect().map(e => (e.id, e.forums)).toSet
    val ref = Frontier.buildWorklist(spark, existing, forum, d2,
      maxNew = 1000, runId = 2)
      .collect().map(e => (e.id, e.forums)).toSet
    assert(inc == ref, "epoch-bloom dedup must match the rebuild path")
  }

  test("epoch roll: exhausting the budget rebuilds once from the corpus") {
    val dir = Files.createTempDirectory("graft_seenstore_roll").toString
    val store = new SeenStore(dir, expectedKeys = 1024)
    val h1 = spark.createDataset((0 until 600).map(i =>
      Ids.mix64(i.toLong))).toDF("h").as[Long]
    val (r1, n1) = store.commitRun(spark, h1, 600, h1, 600)
    assert(!r1 && n1 == 600)
    val all = spark.createDataset((0 until 1300).map(i =>
      Ids.mix64(i.toLong))).toDF("h").as[Long]
    val h2 = spark.createDataset((600 until 1300).map(i =>
      Ids.mix64(i.toLong))).toDF("h").as[Long]
    val (r2, n2) = store.commitRun(spark, h2, 700, all, 1300)
    assert(r2 && n2 == 1300, "budget exhausted → epoch roll from the corpus")
    val (bloom, _) = store.loadBloom().get
    // rebuilt filter still covers everything (no false negatives)
    (0 until 1300).foreach(i => assert(bloom.mightContain(Ids.mix64(i.toLong))))
  }

  test("delta tier: abort removes staged ids, commit graduates them") {
    val dir = Files.createTempDirectory("graft_seenstore_delta").toString
    val store = new SeenStore(dir, expectedKeys = 1 << 14)
    val staged = (0 until 50).map(i => Ids.mix64(i.toLong ^ 0xABCL))
    store.beginRun(staged.iterator)
    assert(staged.forall(store.delta.mightContain))
    store.abortRun(staged.iterator)
    assert(!staged.exists(store.delta.mightContain),
      "aborted run must leave no trace in the delta tier")
    // commit path: staged again, graduates into the bloom and leaves delta
    store.beginRun(staged.iterator)
    val hs = spark.createDataset(staged).toDF("h").as[Long]
    store.commitRun(spark, hs, staged.size.toLong, hs, staged.size.toLong)
    val (bloom, _) = store.loadBloom().get
    assert(staged.forall(bloom.mightContain), "committed ids live in the epoch filter")
    assert(!staged.exists(store.delta.mightContain), "graduation clears the delta")
  }
}
