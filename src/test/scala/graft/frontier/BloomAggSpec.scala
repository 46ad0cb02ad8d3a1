package graft.frontier

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bloom_agg: distributed bloom build inside the Catalyst agg path, with
  * partial/final merge semantics == the treeAggregate build. */
class BloomAggSpec extends SparkSpec {
  import spark.implicits._

  test("bloom_agg builds a filter with no false negatives; FP rate bounded") {
    val seen = spark.range(0L, 50000L).select(xxhash64(col("id")).as("h"))
    val bytes = seen.agg(BloomAgg(col("h"), expectedKeys = 50000L)).head.getAs[Array[Byte]](0)
    val bloom = BlockedBloom.deserialize(bytes)
    // no false negatives over every inserted key
    val misses = spark.range(0L, 50000L).select(xxhash64(col("id")).as("h")).as[Long]
      .collect().count(h => !bloom.mightContain(h))
    assert(misses == 0)
    // false-positive rate on disjoint probes stays within the 10-bits/key budget
    val fps = spark.range(1000000L, 1050000L).select(xxhash64(col("id")).as("h")).as[Long]
      .collect().count(bloom.mightContain)
    assert(fps < 50000 * 0.05, s"fp rate too high: $fps/50000")
  }

  test("bloom_agg merge across partitions == treeAggregate build") {
    val hashes = spark.range(0L, 20000L).select(xxhash64(col("id")).as("h")).as[Long]
    val viaAgg = BlockedBloom.deserialize(
      hashes.toDF("h").repartition(8)
        .agg(BloomAgg(col("h"), expectedKeys = 20000L)).head.getAs[Array[Byte]](0))
    val viaTree = SeenSet.buildBloomTree(hashes, expectedKeys = 20000L)
    // same sizing → identical bit patterns regardless of build path
    assert(viaAgg.numBlocks == viaTree.numBlocks)
    assert(viaAgg.words.toSeq == viaTree.words.toSeq)
  }

  test("per-group blooms: one filter per shard via GROUP BY") {
    val df = spark.range(0L, 8000L)
      .select((col("id") % 4).as("shard"), xxhash64(col("id")).as("h"))
    val rows = df.groupBy("shard").agg(BloomAgg(col("h"), 2000L).as("bloom")).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val shard = r.getLong(0)
      val bloom = BlockedBloom.deserialize(r.getAs[Array[Byte]](1))
      // keys of this shard are all present
      val keys = (0L until 8000L).filter(_ % 4 == shard)
      // recompute xxhash64 via Spark for parity with the build
      val hs = spark.createDataset(keys).select(xxhash64(col("value")).as("h")).as[Long].collect()
      assert(hs.forall(bloom.mightContain))
    }
  }
}
