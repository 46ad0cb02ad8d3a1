package graft.frontier

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Dataset, SparkSession}

/** Persistent two-tier seen-state across crawl runs (T2 at frontier scale).
  *
  * `Frontier.buildWorklist` builds a bloom from the full known set on every
  * call — a full scan of the seen corpus per nightly run, which at a 10^10
  * frontier is the most expensive constant in the loop. This store makes the
  * filter an EPOCH artifact:
  *
  *  - the bloom persists beside the `url_seen` snapshot (atomic tmp+move,
  *    same discipline as manifest commits) and each run EXTENDS it with just
  *    that run's new ids — a scan of the delta, not the corpus;
  *  - the cuckoo tier holds the CURRENT run's inserts until the run's
  *    snapshot commit succeeds: commit graduates them into the bloom, abort
  *    deletes them (cuckoo supports delete; a bloom doesn't), so a crashed
  *    run never poisons the epoch filter — the reference's
  *    archive-is-the-golden-source discipline (database/README.md:63-69);
  *  - when inserted keys outgrow the filter's budget the epoch ROLLS: the
  *    bloom is rebuilt once from the authoritative snapshot (the only
  *    remaining full scan, amortized over many runs).
  *
  * Exactness is unaffected throughout: the bloom remains a pre-filter ahead
  * of the exact anti-join (SeenSet.dedupWithBloom's contract — the filter
  * must contain every seen id, which extend/roll maintain).
  */
final class SeenStore(dir: String, expectedKeys: Long = 1L << 22,
                      bitsPerKey: Int = 10, numHashes: Int = 5) {
  private val bloomPath = Paths.get(dir, "url_seen_bloom.bin")
  private val metaPath = Paths.get(dir, "url_seen_bloom.json")
  Files.createDirectories(Paths.get(dir))

  /** Current-run delta tier (driver-held; 4 slots per bucket, sized for a
    * per-run delta ≈ expectedKeys/16, power-of-two buckets required). */
  val delta: CuckooFilter = new CuckooFilter(
    math.max(1024, Integer.highestOneBit(math.max(1, (expectedKeys / 64).toInt)) * 2))

  def bloomExists: Boolean = Files.exists(bloomPath)

  def loadBloom(): Option[(BlockedBloom, Long)] =
    if (!bloomExists) None
    else {
      val bloom = BlockedBloom.deserialize(Files.readAllBytes(bloomPath))
      val n = if (Files.exists(metaPath)) {
        """"insertedKeys":(\d+)""".r
          .findFirstMatchIn(new String(Files.readAllBytes(metaPath), StandardCharsets.UTF_8))
          .map(_.group(1).toLong).getOrElse(0L)
      } else 0L
      Some((bloom, n))
    }

  private def save(bloom: BlockedBloom, insertedKeys: Long): Unit = {
    val tmp = Paths.get(dir, s".bloom-tmp-${System.nanoTime()}")
    Files.write(tmp, bloom.serialized)
    Files.move(tmp, bloomPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    val mtmp = Paths.get(dir, s".bloommeta-tmp-${System.nanoTime()}")
    Files.write(mtmp, s"""{"insertedKeys":$insertedKeys,"expectedKeys":$expectedKeys}"""
      .getBytes(StandardCharsets.UTF_8))
    Files.move(mtmp, metaPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  private def emptyBloom(): BlockedBloom =
    BlockedBloom.sized(math.max(expectedKeys, 1024L), bitsPerKey, numHashes)

  /** Stage this run's new id hashes into the delta tier (pre-commit). */
  def beginRun(newHashes: Iterator[Long]): Unit =
    newHashes.foreach(delta.add)

  /** Abort: remove the staged hashes — the epoch filter never saw them. */
  def abortRun(staged: Iterator[Long]): Unit =
    staged.foreach(delta.remove)

  /** Commit: extend the epoch bloom with the run's new hashes (distributed
    * delta scan, NOT a corpus scan), clear them from the delta tier, roll
    * the epoch from `fullCorpusHashes` if the budget is exhausted. Returns
    * (rolled, insertedKeysAfter). */
  def commitRun(spark: SparkSession, newHashes: Dataset[Long], newCount: Long,
                fullCorpusHashes: => Dataset[Long], fullCount: => Long): (Boolean, Long) = {
    val (bloom, n) = loadBloom().getOrElse((emptyBloom(), 0L))
    if (n + newCount > expectedKeys) {
      // epoch roll: one full rebuild from the authoritative snapshot
      val total = fullCount
      val grown = BlockedBloom.sized(
        math.max(expectedKeys, total * 2), bitsPerKey, numHashes)
      val rebuilt = fullCorpusHashes.rdd.treeAggregate(grown)(
        (b, h) => { b.add(h); b }, (a, b) => a.mergeInPlace(b), depth = 2)
      save(rebuilt, total)
      clearDelta(newHashes)
      (true, total)
    } else {
      val extended = newHashes.rdd.treeAggregate(bloom)(
        (b, h) => { b.add(h); b }, (a, b) => a.mergeInPlace(b), depth = 2)
      save(extended, n + newCount)
      clearDelta(newHashes)
      (false, n + newCount)
    }
  }

  private def clearDelta(hashes: Dataset[Long]): Unit = {
    // delta is driver-held and per-run small; graduation removes its entries
    hashes.toLocalIterator().forEachRemaining(h => { delta.remove(h); () })
  }
}
