package graft.scheduler

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

import graft.core.{CrawlConfig, FrontierEntry, Ids, ScheduledFetch}

/** Deterministic virtual-clock politeness scheduler (SURVEY.md §7.1 step 5).
  *
  * Reference semantics being reproduced (ExtensionCrawler):
  *  - the nightly work-list is a seeded shuffle of the frontier
  *    (`random.shuffle(tups)`, archive.py:594) pulled in order by the worker
  *    pool (chunksize=1, archive.py:603-605) → crawl ORDER is the shuffled
  *    list order;
  *  - "restricted" (forum) requests are globally exclusive and must start
  *    ≥ 0.6 s + U(0, 0.15) s after the previous restricted request
  *    (request_manager.py:15-42); normal requests only wait out the spacing
  *    after the most recent restricted request.
  *
  * The oracle (`VirtualClockOracle`) defines the schedule as a pure function
  * of (frontier, config): shuffle key, jitter and durations all derive from
  * seeded 64-bit mixes of the id. The Spark pipeline computes the identical
  * schedule distributed:
  *  - global `seq` via range-repartition + per-partition offset indexing
  *    (a distributed prefix count — no driver collect of data rows);
  *  - the restricted chain via a per-partition prefix sum with broadcast
  *    partition offsets (restricted class is O(1-2%) of the frontier,
  *    download-report-one-week.gp:20-22);
  *  - normal rows look up their restricted predecessor by binary search in
  *    the broadcast restricted boundary list (compact: one (seq,end) pair
  *    per restricted item; for frontiers where even that outgrows the
  *    driver, the same lookup is expressible as a range bucket join).
  * Physical parallelism changes wall-clock throughput, never the schedule.
  */
object Politeness {

  /** Deterministic 64-bit string hash (pure Scala — shared verbatim by the
    * oracle and the distributed pipeline, so parity is by construction). */
  def strHash64(s: String, seed: Long): Long = {
    var h = seed ^ 0x9E3779B97F4A7C15L
    var i = 0
    while (i < s.length) { h = Ids.mix64(h ^ s.charAt(i).toLong); i += 1 }
    h
  }

  /** Politeness spacing for an id: normalMs + deterministic jitter in
    * [0, jitterMaxMs] (request_manager.py:19,33's 0.6 s + U(0,0.15) s under
    * a seeded RNG). */
  def spacingMs(id: String, cfg: CrawlConfig): Long =
    cfg.politenessNormalMs + Math.floorMod(Ids.mix64(strHash64(id, cfg.shuffleSeed) ^ 0x51ED2701L), cfg.jitterMaxMs + 1)

  /** Deterministic synthetic fetch duration (50-149 ms virtual). */
  def durationMs(id: String, cfg: CrawlConfig): Long =
    50L + Math.floorMod(Ids.mix64(strHash64(id, cfg.shuffleSeed) ^ 0xD1B54A32D192ED03L), 100L)

  /** The seeded-shuffle sort key (archive.py:594 made deterministic). */
  def shuffleKey(id: String, cfg: CrawlConfig): Long = strHash64(id, cfg.shuffleSeed)

  /** Distributed schedule — exactly equal to
    * [[VirtualClockOracle.schedule]] on the same inputs.
    *
    * Scale design: the global sort uses a DETERMINISTIC bucket partitioner on
    * the top bits of the (sign-flipped) shuffle key instead of
    * `repartitionByRange` — the keys are uniform 64-bit mixes, so buckets
    * balance by construction and the range-sampling pass over the full
    * dataset disappears. Shuffle rows carry only (key, id, host, forums) —
    * the url never travels. Per-partition in-memory sort is safe at any
    * frontier size because partition count scales with the data
    * (10^10 rows / 2^17 buckets ≈ 76k rows per partition). */
  def schedule(spark: SparkSession, frontier: Dataset[FrontierEntry], cfg: CrawlConfig,
               numPartitions: Int = 0): Dataset[ScheduledFetch] = {
    import spark.implicits._
    val parts0 = if (numPartitions > 0) numPartitions else spark.sessionState.conf.numShufflePartitions
    // next power of two ≥ parts0 so the bucket is a bit-shift of the key
    val p = math.max(Integer.highestOneBit(math.max(parts0, 1)) *
      (if (Integer.bitCount(math.max(parts0, 1)) == 1) 1 else 2), 1)
    val shift = 64 - Integer.numberOfTrailingZeros(p)

    // 1. slim keyed rows; bucket = top bits of unsigned(key) — monotone in
    //    the signed key order the oracle sorts by, so bucket index order IS
    //    global order; within a bucket all keys share a sign → one in-memory
    //    sort per partition completes the global sort without sampling.
    val slim = frontier.map(e => (shuffleKey(e.id, cfg), e.id, e.host, e.forums))
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = p
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }
    val sorted = slim.rdd
      .map(t => (if (shift >= 64) 0 else (((t._1 ^ Long.MinValue) >>> shift)).toInt, t))
      .partitionBy(part)
      .mapPartitions(it => {
        val arr = it.map(_._2).toArray
        java.util.Arrays.sort(arr, Ordering.by((t: (Long, String, String, Boolean)) => (t._1, t._2)))
        arr.iterator
      }, preservesPartitioning = true)
    // SER: raw-object RDD caching of tens of millions of tuples is pure
    // GC pressure; serialized blocks keep the heap flat. Scope-registered so
    // iterative crawl loops release it at round end.
    graft.core.CacheScope.persistRdd(sorted, StorageLevel.MEMORY_AND_DISK_SER)

    // 2. global seq = per-partition offset (prefix count over P counters,
    //    driver-side; P values, never data rows) + local index
    val counts = sorted.mapPartitions(it => Iterator.single(it.size)).collect()
    val seqOffsets = counts.scanLeft(0L)(_ + _)
    val bcSeqOff = spark.sparkContext.broadcast(seqOffsets)
    def seqd = sorted.mapPartitionsWithIndex { (pid, it) =>
      var s = bcSeqOff.value(pid)
      it.map { t => val r = (s, t); s += 1; r }
    }

    // 3. restricted chain: prefix-sum of (spacing + duration) in seq order —
    //    restricted rows are already partition-ordered by seq
    val restricted = seqd.filter(_._2._4)
    val partStats = restricted
      .mapPartitions { it =>
        var sum = 0L; var n = 0L
        it.foreach { case (_, (_, id, _, _)) =>
          sum += spacingMs(id, cfg) + durationMs(id, cfg); n += 1
        }
        Iterator.single((sum, n))
      }
      .collect()
    val restrictedCount = partStats.map(_._2).sum
    val chainOffsets = partStats.map(_._1).scanLeft(0L)(_ + _)
    val bcChainOff = spark.sparkContext.broadcast(chainOffsets)
    val restrictedSched = spark.createDataset(
      restricted.mapPartitionsWithIndex { (pid, it) =>
        var cum = bcChainOff.value(pid)
        it.map { case (seq, (_, id, host, _)) =>
          val start = cum + spacingMs(id, cfg)
          cum += spacingMs(id, cfg) + durationMs(id, cfg)
          ScheduledFetch(seq, id, host, "restricted", start)
        }
      })
    graft.core.CacheScope.persist(restrictedSched, StorageLevel.MEMORY_AND_DISK)

    // 4. normal rows: start = end-of-last-restricted-before(seq) + spacing.
    //    Two physical plans, same semantics:
    //    (a) broadcast path — one (seq, endMs) pair per restricted item
    //        (1-2% of the frontier, download-report-one-week.gp:20-22),
    //        broadcast once, binary-searched per row;
    //    (b) bucketed-boundary path beyond cfg.broadcastBoundaryLimit —
    //        boundaries shuffle to the partition whose seq-range contains
    //        them (seqd partitions ARE contiguous seq ranges), carry-ins
    //        flow as O(partitions) per-partition maxima; the normal rows
    //        never move. Driver cost O(partitions), network O(restricted).
    val normalSched =
      if (restrictedCount <= cfg.broadcastBoundaryLimit) {
        val boundaries: Array[(Long, Long)] = restrictedSched
          .map(s => (s.seq, s.startMs + durationMs(s.id, cfg)))
          .collect().sortBy(_._1)
        val bcBounds = spark.sparkContext.broadcast(boundaries)
        spark.createDataset(
          seqd.filter(!_._2._4).mapPartitions { it =>
            val bounds = bcBounds.value
            it.map { case (seq, (_, id, host, _)) =>
              // binary search: last restricted with rseq < seq
              var lo = 0; var hi = bounds.length - 1; var ans = -1
              while (lo <= hi) {
                val mid = (lo + hi) >>> 1
                if (bounds(mid)._1 < seq) { ans = mid; lo = mid + 1 } else hi = mid - 1
              }
              val start = if (ans < 0) 0L else bounds(ans)._2 + spacingMs(id, cfg)
              ScheduledFetch(seq, id, host, "normal", start)
            }
          })
      } else {
        // (b) bucketed boundaries. Target partition of a boundary = the seqd
        // partition whose [offset, nextOffset) range holds its seq.
        val offsets = seqOffsets // length P+1, ascending
        def pidOf(seq: Long): Int = {
          var lo = 0; var hi = offsets.length - 2; var ans = 0
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            if (offsets(mid) <= seq) { ans = mid; lo = mid + 1 } else hi = mid - 1
          }
          ans
        }
        val identityPart = new org.apache.spark.Partitioner {
          override def numPartitions: Int = p
          override def getPartition(key: Any): Int = key.asInstanceOf[Int]
        }
        val byPid = restrictedSched
          .map(s => (s.seq, s.startMs + durationMs(s.id, cfg)))
          .rdd
          .map(b => (pidOf(b._1), b))
          .partitionBy(identityPart)
          .mapPartitions(it => {
            val arr = it.map(_._2).toArray
            java.util.Arrays.sort(arr, Ordering.by((b: (Long, Long)) => b._1))
            arr.iterator
          }, preservesPartitioning = true)
        // carry-in per partition: the latest boundary in any EARLIER
        // partition — O(P) values through the driver, never data rows
        val maxPer: Array[(Long, Long)] = byPid
          .mapPartitionsWithIndex { (pid, it) =>
            var last: (Long, Long) = null
            it.foreach(b => last = b)
            Iterator.single((pid, last))
          }
          .collect().sortBy(_._1).map(_._2)
        val carryIn = new Array[(Long, Long)](p)
        var running: (Long, Long) = null
        var i = 0
        while (i < p) {
          carryIn(i) = running
          if (maxPer(i) != null) running = maxPer(i)
          i += 1
        }
        val bcCarry = spark.sparkContext.broadcast(carryIn)
        spark.createDataset(
          seqd.zipPartitions(byPid, preservesPartitioning = true) { (rows, bIt) =>
            val pid = org.apache.spark.TaskContext.getPartitionId()
            val bounds = bIt.toArray // sorted by seq within this partition
            var idx = -1
            var lastEnd = Option(bcCarry.value(pid)).map(_._2).getOrElse(-1L)
            rows.flatMap { case (seq, (_, id, host, forums)) =>
              while (idx + 1 < bounds.length && bounds(idx + 1)._1 < seq) {
                idx += 1; lastEnd = bounds(idx)._2
              }
              if (forums) None
              else Some(ScheduledFetch(seq, id, host, "normal",
                if (lastEnd < 0) 0L else lastEnd + spacingMs(id, cfg)))
            }
          })
      }

    normalSched.union(restrictedSched)
  }
}

/** Sequential reference oracle — the single-threaded semantics of
  * archive.py:588-623 + request_manager.py:15-42 under a virtual clock.
  * Used only by tests and parity checks; never by the pipeline. */
object VirtualClockOracle {
  def schedule(frontier: Seq[FrontierEntry], cfg: CrawlConfig): Seq[ScheduledFetch] = {
    val ordered = frontier.sortBy(e => (Politeness.shuffleKey(e.id, cfg), e.id))
    var lastRestrictedEnd = -1L
    ordered.zipWithIndex.map { case (e, seq) =>
      val spacing = Politeness.spacingMs(e.id, cfg)
      val dur = Politeness.durationMs(e.id, cfg)
      if (e.forums) {
        val start = if (lastRestrictedEnd < 0) spacing else lastRestrictedEnd + spacing
        lastRestrictedEnd = start + dur
        ScheduledFetch(seq.toLong, e.id, e.host, "restricted", start)
      } else {
        val start = if (lastRestrictedEnd < 0) 0L else lastRestrictedEnd + spacing
        ScheduledFetch(seq.toLong, e.id, e.host, "normal", start)
      }
    }
  }
}
