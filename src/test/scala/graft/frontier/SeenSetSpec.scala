// (BloomAgg coverage lives in BloomAggSpec alongside this file)
package graft.frontier

import graft.SparkSpec
import graft.core.Ids
import org.apache.spark.sql.functions._

class SeenSetSpec extends SparkSpec {
  import spark.implicits._

  test("BlockedBloom: no false negatives, bounded false positives") {
    val bloom = BlockedBloom.sized(10000, bitsPerKey = 10, numHashes = 5)
    val keys = (0L until 10000L).map(Ids.mix64)
    keys.foreach(bloom.add)
    assert(keys.forall(bloom.mightContain), "bloom must never lose a key")
    val probes = (100000L until 120000L).map(Ids.mix64)
    val fp = probes.count(bloom.mightContain).toDouble / probes.size
    assert(fp < 0.05, s"false-positive rate too high: $fp")
  }

  test("BlockedBloom: merge is union (treeAggregate combOp semantics)") {
    val a = new BlockedBloom(64, 5); val b = new BlockedBloom(64, 5)
    (0L until 500L).foreach(i => a.add(Ids.mix64(i)))
    (500L until 1000L).foreach(i => b.add(Ids.mix64(i)))
    a.mergeInPlace(b)
    assert((0L until 1000L).forall(i => a.mightContain(Ids.mix64(i))))
  }

  test("BlockedBloom: serialization round-trip") {
    val a = new BlockedBloom(32, 4)
    (0L until 100L).foreach(i => a.add(i * 7 + 1))
    val b = BlockedBloom.deserialize(a.serialized)
    assert((0L until 100L).forall(i => b.mightContain(i * 7 + 1)))
    assert(b.numBlocks == 32 && b.numHashes == 4)
  }

  test("CuckooFilter: add/contains/remove with no false negatives") {
    val f = new CuckooFilter(4096)
    val keys = (0L until 8000L).map(Ids.mix64) // 50% load
    assert(keys.forall(f.add), "inserts at 50% load must succeed")
    assert(keys.forall(f.mightContain))
    // delete support — the reason cuckoo is the mutable spill tier
    keys.take(4000).foreach(k => assert(f.remove(k)))
    val fpAfter = keys.take(4000).count(f.mightContain)
    assert(fpAfter < 200, s"removed keys mostly gone, got $fpAfter residual")
    assert(keys.drop(4000).forall(f.mightContain), "surviving keys intact")
  }

  test("dedupWithBloom == dedupExact == set model") {
    val seen = (0 until 3000).map(i => s"id_$i")
    val candidates = (1500 until 4500).map(i => s"id_$i")
    val expected = candidates.toSet -- seen.toSet
    val seenDf = seen.toDF("id")
    val candDf = candidates.toDF("id")
    val exact = SeenSet.dedupExact(candDf, seenDf, "id").as[String].collect().toSet
    val bloomed = SeenSet.dedupWithBloom(spark, candDf, seenDf, "id", 3000)
      .as[String].collect().toSet
    assert(exact == expected)
    assert(bloomed == expected, "bloom path must stay EXACT (fp fall through to anti-join)")
  }

  test("two-tier (bloom snapshot + cuckoo delta) dedup stays exact") {
    val snapshotSeen = (0 until 2000).map(i => s"a_$i")
    val deltaSeen = (0 until 500).map(i => s"b_$i")
    val allSeen = snapshotSeen ++ deltaSeen
    val candidates = (1000 until 3000).map(i => s"a_$i") ++ (250 until 750).map(i => s"b_$i")
    val expected = candidates.toSet -- allSeen.toSet

    val bloom = BlockedBloom.sized(2000)
    // same hash the probe column computes: xxhash64 — build via Spark to match
    val hashes = snapshotSeen.toDF("id").select(SeenSet.idHash(col("id"))).as[Long].collect()
    hashes.foreach(bloom.add)
    val cuckoo = new CuckooFilter(2048)
    deltaSeen.toDF("id").select(SeenSet.idHash(col("id"))).as[Long].collect().foreach(cuckoo.add)

    val out = SeenSet.dedupWithTiers(spark, candidates.toDF("id"), allSeen.toDF("id"),
      "id", bloom, cuckoo).as[String].collect().toSet
    assert(out == expected)
  }

  test("sharded probe (cogroup) dedup stays exact, including shards with no seen keys") {
    import spark.implicits._
    val seen = (0 until 3000).map(i => s"seen_$i")
    val candidates = (1500 until 4500).map(i => s"seen_$i") ++ (0 until 800).map(i => s"fresh_$i")
    val expected = candidates.toSet -- seen.toSet
    // more shards than distinct seen hash-slices guarantees some EMPTY
    // shards — their candidates must classify definitely-new, exactly
    for (numShards <- Seq(4, 64)) {
      val out = SeenSet.dedupSharded(spark, candidates.toDF("id"), seen.toDF("id"),
        "id", numShards, blocksPerShard = 128)
        .as[String].collect()
      assert(out.toSet == expected, s"numShards=$numShards")
      assert(out.length == expected.size, "no duplicate output rows")
    }
  }

  test("sharded bloom build covers all inserted keys") {
    val hashes = spark.createDataset((0L until 5000L).map(Ids.mix64))
    val shards = SeenSet.buildBloomShards(spark, hashes, numShards = 8, blocksPerShard = 256)
      .collect().toMap
    assert(shards.size == 8)
    val filters = shards.map { case (s, bytes) => s -> BlockedBloom.deserialize(bytes) }
    assert((0L until 5000L).map(Ids.mix64).forall { h =>
      filters(Math.floorMod(h, 8L).toInt).mightContain(h)
    })
  }
}
