package graft.scheduler

import graft.SparkSpec
import graft.core.{CrawlConfig, FrontierEntry, Ids}

/** Multi-host politeness: robots broadcast, per-host spacing, skew salting
  * (north rule; FIXTURES.md §2 skew scenario). */
class HostSchedulerSpec extends SparkSpec {
  import spark.implicits._

  private def entry(i: Int, host: String): FrontierEntry = {
    val id = Ids.syntheticId(i.toLong)
    FrontierEntry(id, s"https://$host/detail/$id", host, forums = false, discoveredRun = 0)
  }

  test("robots: disallowed URLs are filtered into the dead-letter set") {
    val frontier = spark.createDataset(
      (0 until 20).map(i => entry(i, "a.example.com")) ++
      (20 until 30).map { i =>
        val id = Ids.syntheticId(i.toLong)
        FrontierEntry(id, s"https://a.example.com/private/$id", "a.example.com", false, 0)
      })
    val robots = Seq(RobotsRules("a.example.com", 500L, Seq("/private/")))
    val sched = HostScheduler.schedule(spark, frontier, robots, CrawlConfig()).collect()
    val dead = HostScheduler.disallowed(spark, frontier, robots).collect()
    assert(sched.length == 20 && dead.length == 10)
    assert(dead.forall(_.url.contains("/private/")))
  }

  test("per-host spacing honors each host's crawl-delay; hosts are independent") {
    val frontier = spark.createDataset(
      (0 until 40).map(i => entry(i, "slow.example.com")) ++
      (40 until 80).map(i => entry(i, "fast.example.com")))
    val robots = Seq(
      RobotsRules("slow.example.com", 2000L, Nil),
      RobotsRules("fast.example.com", 100L, Nil))
    val cfg = CrawlConfig()
    val sched = HostScheduler.schedule(spark, frontier, robots, cfg).collect()
    val byHost = sched.groupBy(_.host)
    byHost.foreach { case (host, rows) =>
      val delay = robots.find(_.host == host).get.crawlDelayMs
      rows.sortBy(_.startMs).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.startMs - a.startMs >= delay,
            s"$host spacing ${b.startMs - a.startMs} < $delay")
        case _ =>
      }
    }
    // fast host finishes its 40 fetches before the slow host does
    assert(byHost("fast.example.com").map(_.startMs).max <
      byHost("slow.example.com").map(_.startMs).max)
  }

  test("skew: a hot host splits into salted sub-queues, each internally polite") {
    // 90%-one-host frontier (FIXTURES §2 skew scenario)
    val frontier = spark.createDataset(
      (0 until 900).map(i => entry(i, "hot.example.com")) ++
      (900 until 1000).map(i => entry(i, s"cold-${i % 10}.example.com")))
    val cfg = CrawlConfig()
    val sched = HostScheduler.schedule(spark, frontier, Nil, cfg,
      numSalts = 8, saltThreshold = 100L).collect()
    assert(sched.length == 1000)
    val hot = sched.filter(_.host == "hot.example.com")
    assert(hot.forall(_.fetchClass == "salted"), "hot host must be salted")
    // sub-queues exist: the hot host's virtual finish time shrinks ~numSalts-fold
    // vs one serial lane (900 × (600+dur) ≥ 585s serial; salted lanes ≤ ~1/6)
    val serialFloor = 900L * 600L
    assert(hot.map(_.startMs).max < serialFloor / 4,
      s"salting must parallelize the hot host: max start ${hot.map(_.startMs).max}")
    // each lane still honors the default delay internally: same-lane rows are
    // identified by equal (startMs mod pattern) walk — verify via grouping by
    // reconstructed salt
    val lanes = hot.groupBy(h => Math.floorMod(
      Ids.mix64(Politeness.strHash64(h.id, 0x5A17L)), 8L))
    lanes.foreach { case (_, rows) =>
      rows.sortBy(_.startMs).sliding(2).foreach {
        case Array(a, b) => assert(b.startMs - a.startMs >= HostScheduler.DefaultDelayMs)
        case _ =>
      }
    }
    // cold hosts unaffected
    assert(sched.filter(_.host.startsWith("cold-")).forall(_.fetchClass == "normal"))
  }

  test("schedule honors cfg: durations follow cfg.shuffleSeed, not defaults") {
    // regression: the virtual-clock walk once used CrawlConfig() defaults for
    // durationMs, so non-default seeds diverged from the documented
    // pure-function-of-(frontier, robots, cfg) contract
    val frontier = (0 until 50).map(i => entry(i, "a.example.com"))
    val cfg = CrawlConfig(shuffleSeed = 777L)
    val sched = HostScheduler.schedule(spark, spark.createDataset(frontier), Nil, cfg)
      .collect().sortBy(_.startMs)
    // replay the single-lane walk with the SAME cfg; start times must match
    val ordered = frontier
      .map(e => (Politeness.shuffleKey(e.id, cfg), e.id)).sortBy(t => (t._1, t._2))
    var clock = 0L
    val expected = ordered.map { case (_, id) =>
      val s = clock
      clock += HostScheduler.DefaultDelayMs + Politeness.durationMs(id, cfg)
      (id, s)
    }
    assert(sched.map(s => (s.id, s.startMs)).toSeq == expected)
  }

  test("lane walk is streaming: O(1) state, never materializes its input") {
    // round-2 scale-killer: the walk drained whole partitions into per-lane
    // ArrayBuffers — a 90%-one-host 10^10 frontier would put ~3·10^8 rows in
    // one task's heap. The walk must now emit row i having consumed exactly
    // i+1 input rows (pull-through, no buffering).
    val cfg = CrawlConfig()
    var consumed = 0
    val n = 100000
    val input = Iterator.tabulate(n) { i =>
      consumed += 1
      // one giant lane, pre-sorted by (prio, id) as the shuffle guarantees
      (("hot.example.com", 0, i.toLong, f"id$i%08d"), true)
    }
    val out = HostScheduler.walkLanes(input, Map.empty, cfg)
    val first = out.next()
    assert(consumed == 1, s"walk buffered $consumed rows before first emit")
    assert(first.seq == 0L && first.startMs == 0L)
    var prev = first
    var count = 1
    out.foreach { s =>
      assert(s.startMs - prev.startMs >= HostScheduler.DefaultDelayMs)
      assert(s.seq == prev.seq + 1)
      prev = s; count += 1
    }
    assert(count == n && consumed == n)
  }

  test("lane walk resets clock and rank at lane boundaries") {
    val cfg = CrawlConfig()
    val input = Iterator(
      (("a.example.com", 0, 1L, "id-a1"), false),
      (("a.example.com", 0, 2L, "id-a2"), false),
      (("a.example.com", 1, 1L, "id-a3"), false), // same host, new salt lane
      (("b.example.com", 0, 1L, "id-b1"), false))
    val out = HostScheduler.walkLanes(input, Map.empty, cfg).toList
    assert(out.map(_.seq) == List(0L, 1L, 0L, 0L))
    assert(out(2).startMs == 0L && out(3).startMs == 0L)
    assert(out(1).startMs >= HostScheduler.DefaultDelayMs)
  }

  test("schedule is a pure function of inputs: parallelism-invariant") {
    val frontier = (0 until 500).map(i => entry(i, s"h${i % 7}.example.com"))
    val cfg = CrawlConfig()
    val a = HostScheduler.schedule(spark, spark.createDataset(frontier), Nil, cfg)
      .collect().map(s => (s.host, s.id, s.startMs)).sortBy(t => (t._1, t._2)).toSeq
    val sparded = spark.createDataset(frontier).repartition(13)
    val b = HostScheduler.schedule(spark, sparded, Nil, cfg)
      .collect().map(s => (s.host, s.id, s.startMs)).sortBy(t => (t._1, t._2)).toSeq
    assert(a == b)
  }
}
