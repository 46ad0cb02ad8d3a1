package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Physical-plan audits (SURVEY §4): the optimizations the engine relies on
  * at 100 TB must actually appear in the executed plans — filter pushdown to
  * the parquet scan, column pruning, broadcast joins for dimensions, no
  * redundant shuffles in the window views. Guards against plan regressions
  * the row-level oracle compare can't see. */
class PlanAuditSpec extends SparkSpec {

  private def planString(df: DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  private def countShuffles(df: DataFrame): Int = {
    df.collect()
    var n = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case s: ShuffleExchangeLike => n += 1; s.children.foreach(walk)
        case other => other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    n
  }

  private def scanColumns(df: DataFrame): Set[String] = {
    df.collect()
    val leaves = scala.collection.mutable.Set.empty[String]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        leaves ++= f.requiredSchema.fieldNames
      case other =>
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    leaves.toSet
  }

  private def hasWscg(df: DataFrame): Boolean = {
    df.collect()
    df.queryExecution.executedPlan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
  }

  test("pricing summary: shipdate filter is PUSHED to the parquet scan") {
    val plan = planString(views.ViewQueries.pricingSummary(spark, sf0001))
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$plan")
  }

  test("pricing summary: scan reads ONLY the 6 needed columns (pruning)") {
    val cols = scanColumns(views.ViewQueries.pricingSummary(spark, sf0001))
    assert(cols == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"),
      s"column pruning failed, scan reads: $cols")
  }

  test("brand rollup: dimension join executes as BroadcastHashJoin") {
    val plan = planString(views.ViewQueries.brandRollup(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "fact side must not shuffle for a dim join")
  }

  test("most-recent window view: exactly ONE shuffle (no self-join)") {
    // the reference computes this with an argmax self-join (two scans + two
    // shuffles); the window form shuffles the fact table once
    val n = countShuffles(views.ViewQueries.mostRecent(spark, sf0001))
    assert(n == 1, s"expected 1 shuffle, got $n")
  }

  test("seen-set anti-join plans as a real anti join, never cartesian") {
    val cand = core.Tables.customer(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("c_custkey").cast("string").as("id"))
    val seen = core.Tables.events(spark, sf0001)
      .select(org.apache.spark.sql.functions.col("user_id").cast("string").as("id"))
    val plan = planString(frontier.SeenSet.dedupExact(cand, seen, "id"))
    assert(plan.contains("LeftAnti"), s"expected anti join:\n$plan")
    assert(!plan.contains("Cartesian"), "anti join degenerated to cartesian")
  }

  test("LSH band join: equi-join on (band, chunk), hamming verify inside the join") {
    val df = sim.Dedup.lshHammingJoin(spark, sf0001)
    val plan = planString(df)
    // an equi-join (either strategy), never a nested-loop over all pairs
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"LSH join must be an equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "LSH must prune the pair space")
  }

  test("cosine near-dup pairs: equi-join on bucket, no sort/limit funnel (q86)") {
    val df = sim.Ann.cosineNearDupPairs(spark, sf0001, threshold = 0.40)
    val plan = planString(df)
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"pair join must be an equi-join:\n$plan")
    assert(!plan.contains("CartesianProduct"), "candidate space must stay bucketed")
    // the dedup form is a filter, not a top-k: no single-threaded collect
    // funnel may appear (output scales with duplicates, not the corpus)
    assert(!plan.contains("CollectLimit") && !plan.contains("TakeOrderedAndProject"),
      s"thresholded pairs must not funnel through a global limit:\n$plan")
  }

  test("ANN multi-probe top-k: probe side broadcasts, scan side never shuffles") {
    val df = sim.Ann.lshTopK(spark, sf0001, nPlanes = 4)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin"), s"probe join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    assert(countShuffles(df) == 0, "the corpus side of a 1-query probe must stay in place")
  }

  test("overview metadata projection: one codegen'd scan, no shuffle, pruned columns") {
    val df = etl.Etl.overviewMetadata(spark, sf0001)
    assert(hasWscg(df), "8-regex projection must stay in codegen")
    assert(countShuffles(df) == 0, "a pure projection must not shuffle")
    assert(scanColumns(df) == Set("doc_id", "source", "text"),
      s"scan must read only the 3 source columns: ${scanColumns(df)}")
  }

  test("library-detection pipeline: equi-joins only, never cartesian") {
    val plan = planString(sim.Dedup.libraryDetection(spark, sf0001))
    assert(!plan.contains("CartesianProduct"), s"composed pipeline degenerated:\n$plan")
    assert(plan.contains("Join"), "both match tiers must plan as joins")
  }

  test("annotations explode: a streaming Generate with one dedup shuffle") {
    // from_json is CodegenFallback, so WSCG can't span it; the plan-shape
    // guarantees that matter are: explode runs as Generate (no group
    // buffering) and only the md5-PK distinct shuffles
    val df = etl.Etl.annotationsExplode(spark, sf0001)
    assert(planString(df).contains("Generate"), "explode must plan as Generate")
    assert(countShuffles(df) == 1, "only the distinct should shuffle")
  }

  test("fingerprint suite (custom expressions) stays in one WholeStageCodegen scan stage") {
    val df = Catalog.queries("q37_fingerprint_suite")(spark, sf0001)
    assert(hasWscg(df), "custom exprs fell out of codegen:\n" +
      df.queryExecution.executedPlan.toString)
    assert(countShuffles(df) == 0, "a pure projection must not shuffle")
  }

  test("extgrep: the date bound is PUSHED to the events scan; single pass despite 3 patterns") {
    val df = text.ExtGrep.grep(spark, sf0001)
    val plan = planString(df)
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts") ||
      plan.contains("GreaterThanOrEqual(ts"), s"date bound not pushed:\n$plan")
    // the per-pattern explode must not rescan: exactly one file scan
    var scans = 0
    df.collect()
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => scans += 1
      case other => other.children.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(scans == 1, s"3 patterns must share ONE scan, got $scans")
  }

  test("stall monitor: the window runs on ONE shuffle of the grid (spine join stays broadcast-side)") {
    val df = views.ViewQueries.stallMonitor(spark, sf0001)
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"),
      s"the 1-row bounds cross join must broadcast:\n$plan")
    // grid rows ≈ types × buckets (tiny); the events table itself is
    // scanned for bounds + counts only — never joined row-per-row
    assert(df.collect().length < 10000)
  }

  test("libdet regex tier: known-hash dim joins as broadcast; regex tier is one scan") {
    val plan = planString(sim.Dedup.libraryDetectRegexTier(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"hash dim must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q66 cdnjs build: the built dim joins as BROADCAST; no cartesian") {
    val plan = planString(etl.CdnjsCatalog.catalogBuildAndJoin(spark, sf0001))
    assert(plan.contains("BroadcastHashJoin"), s"built dim must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q69 create-db rebuild: ONE archive derivation feeds all four summaries (cached slice)") {
    val df = etl.CreateDb.rebuildSummary(spark, sf0001)
    val plan = planString(df)
    // the slice is persisted — each branch reads the cache, not parquet×4
    assert(plan.contains("InMemoryTableScan"), s"slice must be cached:\n$plan")
  }

  test("q70 ADC re-rank: candidate funnel is TakeOrdered over the CODE scan; floats join broadcast") {
    val df = sim.Pq.adcRerankTopK(spark, sf0001, candidates = 350)
    val plan = planString(df)
    assert(plan.contains("TakeOrderedAndProject"), s"ADC top-C must be a bounded funnel:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"C survivors must broadcast into the float join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q71 archive grep: three patterns share ONE slice scan") {
    val df = text.ExtGrep.grepArchive(spark, sf0001)
    df.collect()
    var scans = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => scans += 1
      case other => other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    // archiveRows is a union of two projections of documents: 2 scans of
    // the same file, but NOT 2 per pattern (patterns ride one explode)
    assert(scans <= 2, s"patterns must not rescan the archive: $scans scans")
  }

  test("q75 rotated-OPQ steady state: the scan reads the cached code table only") {
    sim.Opq.rotatedAdcTopK(spark, sf0001).collect() // builds rotation + code index
    val df = sim.Opq.rotatedAdcTopK(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"steady-state q75 must read the cached rotated codes:\n$plan")
  }

  test("q60 IVF steady state: probes READ the assignment index — no corpus re-assignment") {
    // first call builds + materializes the (vec_id, cid) index artifact
    sim.Ann.ivfTopK(spark, sf0001).collect()
    // steady-state query: the plan must read the cached assignment …
    val df = sim.Ann.ivfTopK(spark, sf0001)
    df.collect()
    val all = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.execution.SparkPlan]
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
        case other => all += other; other.children.foreach(walk)
      }
      p.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    assert(all.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]),
      s"expected InMemoryTableScan of the IVF index:\n${df.queryExecution.executedPlan}")
    // … and must NOT rescan the parquet corpus or re-run nearestCentroid
    // (k×dim dots per row — the full-corpus scan VERDICT r3 flagged)
    assert(!all.exists(_.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec]),
      "steady-state probe rescanned the parquet corpus")
    val aboveCache = all.collect {
      case pr: org.apache.spark.sql.execution.ProjectExec => pr.projectList.mkString(";")
      case f: org.apache.spark.sql.execution.FilterExec => f.condition.toString
    }.mkString("\n")
    assert(!aboveCache.contains("array_max"),
      s"nearestCentroid recomputed at query time:\n$aboveCache")
  }

  test("q77 IVF-PQ gate steady state: prescore reads the cached (cid, code) index; rerank broadcasts") {
    sim.Pq.ivfPqRerankTopK(spark, sf0001, candidates = 250, nProbe = 8).collect() // build index
    val df = sim.Pq.ivfPqRerankTopK(spark, sf0001, candidates = 250, nProbe = 8)
    val plan = planString(df)
    // the index artifact is a lineage-truncated materialized dataset
    // (localCheckpoint) — the prescore must read it as an existing RDD
    // scan, never re-run the residual-encode expression
    assert(plan.contains("Scan ExistingRDD") || plan.contains("InMemoryTableScan"),
      s"steady-state IVF-PQ must read the materialized code index:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"), s"prescore must be a bounded funnel:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"C survivors must broadcast into the float re-rank join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q78 SDC gate: pair join runs over the cached code index, floats broadcast-joined only at re-rank") {
    sim.Pq.sdcTopPairs(spark, sf0001, candidates = 40000, nPlanes = 4).collect() // build index
    val df = sim.Pq.sdcTopPairs(spark, sf0001, candidates = 40000, nPlanes = 4)
    val plan = planString(df)
    assert(plan.contains("Scan ExistingRDD") || plan.contains("InMemoryTableScan"),
      s"steady-state SDC must read the materialized (bucket, code) index:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"top-C pairs must broadcast into the float re-rank joins:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q81 evidence map: equi-joins only, documents scanned a bounded number of times") {
    val df = text.PermissionGrep.unusedPermissions(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"contingency must not cross-join:\n$plan")
    var scans = 0
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => scans += 1
      case other => other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(df.queryExecution.executedPlan)
    // one scan feeds the minced-grep side, one the manifest side
    assert(scans <= 2, s"evidence map must not rescan documents per permission: $scans scans")
  }

  test("q50 gated form: simhash candidates BROADCAST into the shingle-Jaccard verify") {
    val df = sim.Dedup.simhashVerifiedTopPairs(spark, sf0001)
    val plan = planString(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the candidate pair list must broadcast into the shingle join:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q88 dataset split: a pure projection — ZERO shuffles, two-column scan") {
    val df = etl.TrainPrep.datasetSplit(spark, sf0001)
    assert(countShuffles(df) === 0, "fold assignment must not shuffle")
    val cols = scanColumns(df)
    assert(cols.subsetOf(Set("doc_id", "source")),
      s"split must prune to (doc_id, source), read $cols")
  }

  test("q89 packing: the per-source window partitioning is REUSED by the pack aggregate") {
    // window partitionBy(source) hash-partitions the data; the subsequent
    // groupBy(source, pack_id) is clustered by a superset of those keys, so
    // EnsureRequirements must NOT insert a second exchange — one shuffle
    // total is the 100 TB contract (plus AQE's optional final coalesce)
    val df = etl.TrainPrep.packSequences(spark, sf0001)
    assert(countShuffles(df) === 1,
      "packing must reuse the window's source-partitioning for the aggregate")
    assert(!planString(df).contains("CartesianProduct"))
  }

  test("q87 image near-dup: banded equi-join — no cartesian, no nested loop") {
    val df = sources.Images.phashNeardupPairs(spark, sf0001, limit = 60)
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"phash pairs must join on (band, chunk):\n$plan")
  }

  test("q91 redaction + q92 mixture: pure codegen projections — ZERO shuffles") {
    val redact = text.Redaction.redactPii(spark, sf0001)
    assert(countShuffles(redact) === 0, "PII scrub must not shuffle")
    val mix = etl.TrainPrep.mixtureSample(spark, sf0001)
    assert(countShuffles(mix) === 0, "mixture sampling must not shuffle")
    assert(scanColumns(mix).subsetOf(Set("doc_id", "source")),
      s"mixture must prune to (doc_id, source), read ${scanColumns(mix)}")
  }

  test("q94 repetition stats: two doc-keyed aggregate passes — no cartesian") {
    val df = etl.TrainPrep.repetitionStats(spark, sf0001)
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"repetition stats must stay doc-keyed:\n$plan")
  }

  test("q93 ngram collisions: eval probes the DISTINCT train set — equi-joins only") {
    val df = etl.TrainPrep.ngramCollisions(spark, sf0001)
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"collision probe must stay equi-join shaped:\n$plan")
  }

  test("q90 decontamination: fold columns join the O(pairs) edge list — no cartesian") {
    val df = etl.TrainPrep.decontamination(spark, sf0001)
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"decontamination must stay equi-join shaped:\n$plan")
  }

  test("q96/q97 audio: per-row codec stages — ZERO shuffles, two-column scan") {
    // zero exchanges INCLUDING no Tables.spread: the javax.sound SPI lock
    // convoys fanned-out codec maps (measured 3× slower — Audio.scala doc),
    // so the audio tier deliberately stays a single unshuffled stream
    val feats = sources.Audio.audioFeatures(spark, sf0001)
    assert(countShuffles(feats) === 0, "audio feature extraction must not shuffle")
    assert(scanColumns(feats).subsetOf(Set("doc_id", "source")),
      s"audio must prune to (doc_id, source), read ${scanColumns(feats)}")
    val mix = sources.Audio.audioDownmix(spark, sf0001)
    assert(countShuffles(mix) === 0, "audio downmix must not shuffle")
  }

  test("q98 passage dedup: one window + one rollup exchange, pruned scan, no cartesian") {
    val df = text.PassageDedup.passageDedup(spark, sf0001)
    // window keyed on md5(seg) + the doc-keyed final aggregate; segmentation
    // itself must stay a fused array projection (no per-word explode shuffle)
    assert(countShuffles(df) <= 2, s"passage dedup grew a shuffle: ${countShuffles(df)}")
    assert(scanColumns(df).subsetOf(Set("doc_id", "source", "text")),
      s"passage dedup must prune to (doc_id, source, text), read ${scanColumns(df)}")
    val plan = planString(df)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"passage dedup must stay key-partitioned:\n$plan")
  }

  test("q100 dup-span coverage: gram count partial-aggregates, no window keyed on the gram") {
    val df = text.DupSpans.dupSpanCoverage(spark, sf0001)
    val plan = planString(df)
    // the global instance count must be a (partial-aggregating, AQE-skew-
    // splittable) groupBy + semi-join — a window partitioned by the gram
    // funnels a hot n-gram's every instance into ONE task
    assert(plan.contains("LeftSemi"), s"instances must flag via a semi-join:\n$plan")
    val windowSpecs = "windowspecdefinition\\((\\w+)#".r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(windowSpecs.subsetOf(Set("doc_id")),
      s"only the island merge may use a window (doc-keyed); saw windows on $windowSpecs")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"dup-span coverage must stay key-partitioned:\n$plan")
    assert(scanColumns(df).subsetOf(Set("doc_id", "source", "text")),
      s"must prune to (doc_id, source, text), read ${scanColumns(df)}")
    assert(countShuffles(df) <= 6, s"dup-span coverage grew shuffles: ${countShuffles(df)}")
  }

  test("q104/q105 LM selection: model joins BROADCAST, cuts are scalar broadcasts, pruned scans") {
    // the 100 TB contract: the LM/model table joins the token stream as a
    // broadcast hash join (never a shuffled join on the token key), and the
    // tertile/median cut points fold into 1-row broadcasts — bucket
    // assignment is a scan-side comparison, not a global sort
    val ppl = text.LmQuality.perplexityBuckets(spark, sf0001)
    val pplPlan = planString(ppl)
    assert(pplPlan.contains("BroadcastHashJoin"),
      s"vocab must broadcast into the scoring join:\n$pplPlan")
    assert(!pplPlan.contains("SortMergeJoin"), "no shuffled join on the token key")
    assert(!pplPlan.contains("Window"), "tertiles must not use a global-sort window")
    assert(scanColumns(ppl).subsetOf(Set("doc_id", "text")),
      s"q104 must prune to (doc_id, text), read ${scanColumns(ppl)}")
    val dsir = text.LmQuality.dsirSelection(spark, sf0001)
    val dsirPlan = planString(dsir)
    assert(dsirPlan.contains("BroadcastHashJoin"),
      s"the fixed-width hashed model must broadcast:\n$dsirPlan")
    assert(!dsirPlan.contains("SortMergeJoin") && !dsirPlan.contains("Window"))
    assert(scanColumns(dsir).subsetOf(Set("doc_id", "lang", "text")),
      s"q105 must prune to (doc_id, lang, text), read ${scanColumns(dsir)}")
  }

  test("q101/q102 mince gates: per-doc typed map — ZERO shuffles, two-column scan") {
    // the scanner is sequential per document but documents are independent:
    // the 100 TB contract is a shuffle-free scan→synthesize→split pipeline
    val prof = text.Mincer.minceGate(spark, sf0001)
    assert(countShuffles(prof) === 0, "mince profile gate must not shuffle")
    assert(scanColumns(prof).subsetOf(Set("doc_id", "text")),
      s"gate must prune to (doc_id, text), read ${scanColumns(prof)}")
    val blocks = text.Mincer.minceBlocksGate(spark, sf0001)
    assert(countShuffles(blocks) === 0, "block-trace gate must not shuffle")
    assert(scanColumns(blocks).subsetOf(Set("doc_id", "text")),
      s"gate must prune to (doc_id, text), read ${scanColumns(blocks)}")
  }
}
