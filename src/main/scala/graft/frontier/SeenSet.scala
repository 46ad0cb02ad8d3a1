package graft.frontier

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType}

/** URL-seen dedup — the engine's J1 (discover.py:68: `id not in known_ids`).
  *
  * Architecture (north rule): candidates → bloom pre-filter (definitely-new
  * pass straight through; maybe-seen fall to an exact `left_anti` join) →
  * exact result. Bloom false positives only cost join work, never
  * correctness. The bloom is built distributed and merged via
  * `treeAggregate` (depth 2) so driver merge cost is O(log parts); at larger
  * budgets the filter shards by hash-slice (partitioned build via
  * `groupByKey.mapGroups`, one shard row each) and the probe co-shuffles
  * candidates with their shard — no full-filter broadcast needed.
  */
object SeenSet {

  /** xxhash64 of the id column — the engine's canonical URL hash (north rule
    * "canonicalizes and xxHash64-hashes URLs"). */
  def idHash(c: Column): Column = xxhash64(c)

  /** Distributed bloom build over the seen-id hashes: each partition
    * allocates its OWN filter locally (the task closure carries only the
    * sizing ints — a treeAggregate zeroValue would serialize the whole
    * empty filter into EVERY task binary, GBs per task at a 10^10-key
    * epoch), then partials merge log-depth via `treeReduce(depth=2)`
    * (SURVEY §4 "partial + final aggregation"). */
  def buildBloomTree(seenHashes: Dataset[Long], expectedKeys: Long,
                     bitsPerKey: Int = 10, numHashes: Int = 5): BlockedBloom = {
    val proto = BlockedBloom.sized(math.max(expectedKeys, 1024), bitsPerKey, numHashes)
    val (nb, nh) = (proto.numBlocks, proto.numHashes)
    val rdd = seenHashes.rdd
    if (rdd.getNumPartitions == 0) proto
    else rdd.mapPartitions { it =>
      val b = new BlockedBloom(nb, nh)
      it.foreach(b.add)
      Iterator.single(b)
    }.treeReduce((a, b) => a.mergeInPlace(b), depth = 2)
  }

  /** Sharded build: one blocked bloom per hash-slice, built streaming per
    * group; returns (shard, bloomBytes) rows that stay table-resident (the
    * 10^10-scale path where no single filter fits one JVM). */
  def buildBloomShards(spark: SparkSession, seenHashes: Dataset[Long], numShards: Int,
                       blocksPerShard: Int, numHashes: Int = 5): Dataset[(Int, Array[Byte])] = {
    import spark.implicits._
    seenHashes
      .groupByKey(h => Math.floorMod(h, numShards.toLong).toInt)
      .mapGroups { (shard, it) =>
        val bloom = new BlockedBloom(blocksPerShard, numHashes)
        it.foreach(bloom.add)
        (shard, bloom.serialized)
      }
  }

  /** Sharded cuckoo build — the table-resident form of a run's spill delta
    * (the cuckoo analog of [[buildBloomShards]]): one filter per hash-slice,
    * (shard, cuckooBytes) rows. At 10^10-frontier scale a nightly delta can
    * be 10^8+ keys; ONE in-heap spill filter would be GiBs in every task
    * binary (addReferenceObj) and GiBs through treeReduce, so past the
    * single-filter cap the spill becomes this table and rides the same
    * cogroup probe as the bloom shards. `add` throws on overflow rather than
    * dropping (a dropped fingerprint would be a pre-filter false negative —
    * callers size bucketsPerShard with headroom). */
  def buildCuckooShards(spark: SparkSession, hashes: Dataset[Long], numShards: Int,
                        bucketsPerShard: Int): Dataset[(Int, Array[Byte])] = {
    import spark.implicits._
    hashes
      .groupByKey(h => Math.floorMod(h, numShards.toLong).toInt)
      .mapGroups { (shard, it) =>
        val f = new CuckooFilter(bucketsPerShard)
        it.foreach { h =>
          if (!f.add(h)) throw new IllegalStateException("cuckoo shard overflow")
        }
        (shard, f.serialized)
      }
  }

  /** Exact dedup: candidates not in seen (the always-correct baseline). */
  def dedupExact(candidates: DataFrame, seen: DataFrame, idCol: String): DataFrame =
    candidates.join(seen.select(idCol), Seq(idCol), "left_anti")

  /** Bloom-accelerated exact dedup: the broadcastable-filter path.
    * `definitely new ∪ (maybe-seen ⟕anti seen)`. The candidate set is
    * persisted before branching — the two probe branches would otherwise
    * re-execute the candidate plan (and any shuffle feeding it) twice. */
  def dedupWithBloom(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
                     idCol: String, expectedSeen: Long): DataFrame = {
    import spark.implicits._
    val bloom = buildBloomTree(
      seen.select(idHash(col(idCol)).as("h")).as[Long], expectedSeen)
    val probe = BloomProbe.might(bloom, idHash(col(idCol)))
    val cand = graft.core.CacheScope.persist(candidates)
    val definitelyNew = cand.filter(!probe)
    val maybeSeen = cand.filter(probe)
    definitelyNew.union(maybeSeen.join(seen.select(idCol), Seq(idCol), "left_anti"))
  }

  /** Sharded-filter exact dedup — the 10^10-key path where NO single bloom
    * fits one JVM (10^10 keys × 10 bits ≈ 12.5 GB; `addReferenceObj` would
    * ship it in every task binary). The filter stays TABLE-RESIDENT: one
    * (shard, bloomBytes) row per hash-slice ([[buildBloomShards]]);
    * candidates co-shuffle to their shard and probe it via `cogroup` — each
    * task deserializes exactly ONE shard filter (≈ totalBits/numShards),
    * never the whole thing. Exactness is unchanged: maybe-seen rows fall
    * to the exact anti-join; a shard with no seen keys has no row, and its
    * candidates are definitely new. */
  /** Co-shuffle candidates with a table-resident shard-filter table and
    * flag each as maybe-seen: one shard filter deserialized per task.
    * Returns (value, maybe) pairs. */
  def shardedMaybeSeen(spark: SparkSession, candidates: DataFrame, idCol: String,
                       shards: Dataset[(Int, Array[Byte])],
                       numShards: Int): Dataset[(String, Boolean)] =
    shardedMaybeSeenTiers(spark, candidates, idCol, shards, Nil, numShards)

  /** Multi-tier sharded probe: the epoch bloom shards PLUS any number of
    * per-run cuckoo spill shard tables, all sharded by the same
    * `floorMod(hash, numShards)` slice so one cogroup co-shuffles a
    * candidate with every tier's filter for its slice. Each task
    * deserializes ≤ 1 bloom + (spill runs) cuckoo shard filters — a few
    * rows per shard — never a whole-corpus filter. */
  def shardedMaybeSeenTiers(spark: SparkSession, candidates: DataFrame, idCol: String,
                            bloomShards: Dataset[(Int, Array[Byte])],
                            cuckooShards: Seq[Dataset[(Int, Array[Byte])]],
                            numShards: Int): Dataset[(String, Boolean)] = {
    import spark.implicits._
    val tagged = cuckooShards
      .map(_.map { case (s, b) => (s, false, b) })
      .foldLeft(bloomShards.map { case (s, b) => (s, true, b) })(_ union _)
    candidates.select(col(idCol).cast("string").as("value"))
      .withColumn("h", idHash(col("value")))
      .select(col("value"), col("h"),
        pmod(col("h"), lit(numShards.toLong)).cast("int").as("shard"))
      .as[(String, Long, Int)]
      .groupByKey(_._3)
      .cogroup(tagged.groupByKey(_._1)) { (_, cands, filters) =>
        var bloom: BlockedBloom = null
        val cuckoos = scala.collection.mutable.ArrayBuffer.empty[CuckooFilter]
        filters.foreach { case (_, isBloom, bytes) =>
          if (isBloom) bloom = BlockedBloom.deserialize(bytes)
          else cuckoos += CuckooFilter.deserialize(bytes)
        }
        cands.map { case (v, h, _) =>
          (v, (bloom != null && bloom.mightContain(h)) ||
            cuckoos.exists(_.mightContain(h)))
        }
      }
  }

  def dedupSharded(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
                   idCol: String, numShards: Int, blocksPerShard: Int,
                   numHashes: Int = 5): DataFrame = {
    import spark.implicits._
    val shards = buildBloomShards(spark,
      seen.select(idHash(col(idCol)).as("h")).as[Long], numShards, blocksPerShard, numHashes)
    val probed = shardedMaybeSeen(spark, candidates, idCol, shards, numShards)
    val definitelyNew = probed.filter(!_._2).map(_._1).toDF("value")
    val maybeSeen = probed.filter(_._2).map(_._1).toDF("value")
    definitelyNew.union(
      maybeSeen.join(seen.select(col(idCol).cast("string").as("value")), Seq("value"), "left_anti"))
      .withColumnRenamed("value", idCol)
  }

  /** Bloom + cuckoo two-tier probe: bloom = last snapshot (immutable),
    * cuckoo = delta inserts since (mutable, supports delete on rollback).
    * A key is maybe-seen if either tier says so. */
  def dedupWithTiers(spark: SparkSession, candidates: DataFrame, seen: DataFrame,
                     idCol: String, bloom: BlockedBloom, cuckoo: CuckooFilter): DataFrame = {
    val h = idHash(col(idCol))
    val probe = BloomProbe.might(bloom, h) || CuckooProbe.might(cuckoo, h)
    val definitelyNew = candidates.filter(!probe)
    val maybeSeen = candidates.filter(probe)
    definitelyNew.union(maybeSeen.join(seen.select(idCol), Seq(idCol), "left_anti"))
  }
}

/** bloom_might_contain(hash) — codegen'd probe; the filter object ships in
  * the task binary via `ctx.addReferenceObj` (one deserialize per executor,
  * not per row). */
case class BloomMightContain(bloom: BlockedBloom, child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    bloom.mightContain(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", bloom, classOf[BlockedBloom].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}

case class CuckooMightContain(filter: CuckooFilter, child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    filter.mightContain(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftCuckoo", filter, classOf[CuckooFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContain($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): CuckooMightContain =
    copy(child = newChild)
  override def prettyName: String = "cuckoo_might_contain"
}

object BloomProbe {
  def might(bloom: BlockedBloom, hashCol: Column): Column =
    Bridge.column(BloomMightContain(bloom, Bridge.expression(hashCol)))
}
object CuckooProbe {
  def might(f: CuckooFilter, hashCol: Column): Column =
    Bridge.column(CuckooMightContain(f, Bridge.expression(hashCol)))
}
