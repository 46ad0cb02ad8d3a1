package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q88 (deterministic dataset split) + q89 (next-fit sequence packing) —
  * the two TrainPrep operators. Both are oracle-gated; this spec carries
  * the properties the hash gate can't state: leakage-freedom under
  * re-partitioning/subsetting, per-stratum balance, and the packing
  * boundary rule replayed imperatively. */
class TrainPrepSpec extends SparkSpec {

  test("q88 split: total, deterministic, and consistent under subsetting") {
    val full = TrainPrep.datasetSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
    assert(full.size === 500)
    // every bucket in [0,100), split consistent with its bucket
    full.values.foreach { case (b, s) =>
      assert(b >= 0 && b < 100)
      val expect = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s === expect)
    }
    // leakage-freedom: the assignment of a doc must not depend on which
    // other rows are present — recompute over a filtered half of the corpus
    val halfIds = full.keys.filter(_ % 2 == 1).toSet
    val half = TrainPrep.datasetSplit(spark, sf0001).filter(col("doc_id") % 2 === 1)
      .collect().map(r => (r.getLong(0), (r.getLong(2), r.getString(3)))).toMap
    assert(half.keySet === halfIds)
    half.foreach { case (id, v) => assert(v === full(id), s"doc $id migrated folds") }
  }

  test("q88 split: hash uniformity gives per-source balance without a stratified pass") {
    val bySrc = TrainPrep.datasetSplit(spark, sf0001)
      .groupBy("source", "split").count().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val sources = bySrc.keys.map(_._1).toSet
    sources.foreach { src =>
      val n = Seq("train", "val", "test").map(s => bySrc.getOrElse((src, s), 0L)).sum
      val trainFrac = bySrc.getOrElse((src, "train"), 0L).toDouble / n
      // 25 docs/source at sf0.001 — binomial(25, .8) stays within ±0.25 of
      // 0.8 with overwhelming margin; this catches a broken bucket fn, not noise
      assert(math.abs(trainFrac - 0.8) < 0.25, s"source $src train frac $trainFrac")
    }
  }

  test("q89 packing: every doc packed once; boundary rule replays imperatively") {
    val packs = TrainPrep.packSequences(spark, sf0001, budget = 2048).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(packs.values.map(_._1).sum === 500) // total docs preserved
    // replay next-fit per source in id order and compare pack manifests
    val docs = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"),
        graft.text.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val replay = scala.collection.mutable.Map.empty[(String, Long), (Long, Long)]
    docs.groupBy(_._2).foreach { case (src, rows) =>
      var cum = 0L
      val buckets = rows.sortBy(_._1).map { case (_, _, n) =>
        val b = cum / 2048; cum += n; (b, n) // floor(cum_before / budget)
      }
      // dense renumbering: bucket values can skip when a doc overflows the
      // budget; pack ids are their rank order, contiguous from 0
      val rank = buckets.map(_._1).distinct.sorted.zipWithIndex.toMap
      buckets.foreach { case (b, n) =>
        val pack = rank(b).toLong
        val (c, t) = replay.getOrElse((src, pack), (0L, 0L))
        replay((src, pack)) = (c + 1, t + n)
      }
    }
    assert(packs.keySet === replay.keySet)
    packs.foreach { case (k, (nDocs, tokens, fill)) =>
      assert((nDocs, tokens) === replay(k), s"pack $k")
      assert(math.abs(fill - tokens.toDouble / 2048.0) < 5e-5, s"fill ratio $k")
    }
    // packs overflow by at most one document's tokens, never more (next-fit
    // invariant: a pack closes as soon as its budget is crossed)
    val maxDoc = docs.map(_._3).max
    packs.values.foreach { case (_, tokens, _) => assert(tokens <= 2048 + maxDoc) }
    // pack ids are contiguous from 0 per source — a loader iterating
    // 0..max must never hit a phantom empty pack, even when a document
    // longer than the budget skips bucket values
    packs.keys.groupBy(_._1).foreach { case (src, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.length).toSeq, s"source $src pack ids not dense: $ids")
    }
  }

  test("q89 packing: an over-budget document yields dense ids, not phantom packs") {
    // tiny budget forces every multi-token doc over budget — the bucket
    // sequence skips heavily, pack ids must still come out contiguous
    val packs = TrainPrep.packSequences(spark, sf0001, budget = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    packs.groupBy(_._1).foreach { case (src, ks) =>
      val ids = ks.map(_._2).toSeq.sorted
      assert(ids === (0L until ids.length).toSeq, s"source $src pack ids not dense: $ids")
    }
  }

  test("q92 mixture sample: hash rule replayed, salt-independent of the fold hash, rate monotone") {
    val rows = TrainPrep.mixtureSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(rows.length === 500)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (id, source, bucket, rate, kept) =>
      // replay the salted-hash bucket and the keep rule exactly
      val hex = md.digest(s"mix:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(bucket === java.lang.Long.parseLong(hex.take(6), 16) % 10000)
      val expectRate = TrainPrep.DefaultMixture.toMap.getOrElse(source, TrainPrep.DefaultMixtureRate)
      assert(rate === expectRate)
      assert(kept === (bucket < rate * 10000))
    }
    // rate 1.0 keeps everything; targets order the achieved per-source rates
    val bySource = rows.groupBy(_._2).map { case (s, rs) =>
      s -> rs.count(_._5).toDouble / rs.length }
    assert(bySource("src0") === 1.0)
    assert(bySource("src1") < bySource("src2") && bySource("src2") < bySource("src0"))
    // decision is a pure function of doc_id — consistent under subsetting
    val half = TrainPrep.mixtureSample(spark, sf0001).filter(col("doc_id") % 2 === 0)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toMap
    rows.filter(_._1 % 2 == 0).foreach { case (id, _, _, _, kept) =>
      assert(half(id) === kept, s"doc $id flipped its sampling decision")
    }
  }

  test("q93 ngram collisions: driver-side replay, contamination path exercised") {
    val n = 5
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= n)
    val shingles = docs.map { case (id, ws) =>
      id -> ws.sliding(n).map(_.mkString(" ")).toSet }.toMap
    val split = TrainPrep.datasetSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val trainSet = shingles.collect { case (id, sh) if split(id) == "train" => sh }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = shingles.collect { case (id, sh) if split(id) != "train" =>
      val collided = sh.count(trainSet.contains)
      (id, split(id), sh.size.toLong, collided.toLong,
        BigDecimal(collided.toDouble / sh.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sorted
    val got = TrainPrep.ngramCollisions(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq.sorted
    assert(got === expected)
    assert(got.exists(_._4 > 0), "fixture corpus must contain cross-split n-gram collisions")
    assert(got.exists(_._4 == 0), "and uncontaminated eval docs")
  }

  test("q94 repetition stats: planted docs flag, clean docs don't, ratios replay") {
    val rows = TrainPrep.repetitionStats(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    assert(rows.length === 500)
    rows.foreach { case (id, nWords, topFrac, nGrams, dupRatio, rep) =>
      assert(rep === (topFrac > 0.3 || dupRatio > 0.2), s"doc $id flag rule")
      if (id % 5 == 0) {
        // planted: first word appended 48x -> its count >= 49 of n+48 words,
        // and the repeated tail mints ~46 copies of the same closing 3-gram
        assert(rep, s"planted doc $id must flag (top=$topFrac dup=$dupRatio)")
        assert(topFrac >= 49.0 / nWords - 5e-5) // 4-dp rounded column vs exact fraction
      } else {
        // unplanted docs are random-vocab prose: a stray intra-doc dup
        // 3-gram is possible, heavy repetition is not
        assert(dupRatio < 0.5, s"unplanted doc $id dup ratio $dupRatio")
      }
      assert(nGrams > 0 && topFrac > 0.0 && dupRatio >= 0.0)
    }
    val flagged = rows.count(_._6)
    assert(flagged >= 90 && flagged < 500,
      s"planted ~100 of 500 docs must dominate the flags, got $flagged")
  }

  test("q99 bloom decon gate: bit-identical to q93, probe actually prunes, in the plan") {
    val exact = TrainPrep.ngramCollisions(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq.sorted
    val bloomed = TrainPrep.bloomNgramCollisions(spark, sf0001)
    val got = bloomed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq.sorted
    // no false negatives + miss-branch == join-miss => exact equality
    assert(got === exact)
    // the prefilter is really in the plan (codegen'd scan predicate), and
    // at 10 bits/key it must reject most non-collided eval shingles — the
    // undersized-filter failure mode is silent (correct but prune-free),
    // so measure the split with the filters' OWN runtime metrics: rows
    // entering the exact join (probe pass) vs rows skipping it (probe miss).
    // Only the two filters over the CACHED EVAL relation (it carries
    // doc_id; the cached train n-gram set is (shingle, hit)-shaped) are the
    // probe branches — InferFiltersFromConstraints also copies the probe
    // onto the train side of the equi-join, where every shingle passes by
    // construction; counting that inferred filter would drown the signal.
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), "probe predicate missing from the plan")
    import org.apache.spark.sql.execution.{FilterExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def scansCache(p: SparkPlan): Boolean = p match {
      case s: InMemoryTableScanExec => s.output.exists(_.name == "doc_id")
      case q: QueryStageExec => scansCache(q.plan)
      case other => other.children.exists(scansCache)
    }
    val filters = scala.collection.mutable.ArrayBuffer.empty[FilterExec]
    def walk(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case f: FilterExec =>
        if (f.condition.toString.contains("bloom_might_contain") && scansCache(f)) filters += f
        f.children.foreach(walk)
      case other => other.children.foreach(walk); other.subqueries.foreach(walk)
    }
    walk(bloomed.queryExecution.executedPlan)
    val (miss, pass) = filters.partition(_.condition.toString.contains("NOT bloom_might_contain"))
    assert(pass.nonEmpty && miss.nonEmpty, s"expected both probe branches, got $filters")
    val passRows = pass.map(_.metrics("numOutputRows").value).sum
    val missRows = miss.map(_.metrics("numOutputRows").value).sum
    assert(passRows < missRows,
      s"probe must reject a majority of eval shingles (pass=$passRows, miss=$missRows)")
    assert(got.exists(_._4 == 0), "fixture must have uncontaminated eval docs")
    val cleanShingles = got.filter(_._4 == 0).map(_._3).sum
    assert(cleanShingles > 0)
  }

  test("q90 decontamination: cross-split orientation, worst-offender argmax, nothing invented") {
    val split = TrainPrep.datasetSplit(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val pairs = graft.sim.Dedup.ngramJaccard(spark, sf0001, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val got = TrainPrep.decontamination(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    // replay: orient each near-dup edge train -> eval, keep worst per eval doc
    val crossEdges = pairs.flatMap { case (a, b, j) =>
      Seq((a, b, j), (b, a, j)) } // (train candidate, eval candidate, jaccard)
      .filter { case (t, e, _) => split(t) == "train" && split(e) != "train" }
    val expected = crossEdges.groupBy(_._2).map { case (evalId, es) =>
      val (t, _, j) = es.map { case (t, _, j) => (t, evalId, j) }
        .minBy { case (t, _, j) => (-j, t) }
      (evalId, split(evalId), t, j)
    }.toSeq.sorted
    assert(got.sorted.toSeq === expected)
    assert(got.nonEmpty, "the fixture corpus must exercise the contamination path")
    got.foreach { case (e, es, t, _) =>
      assert(split(t) === "train" && split(e) === es && es != "train")
    }
  }
}
