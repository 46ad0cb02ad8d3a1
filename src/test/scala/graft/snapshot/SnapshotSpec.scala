package graft.snapshot

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-snap").toString

  test("commit/read round-trip with version monotonicity") {
    val dir = tmpDir()
    val t = new SnapshotTable(spark, dir)
    assert(t.currentVersion.isEmpty)
    val v1 = t.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"))
    val v2 = t.commit(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
    assert(v1 == 1 && v2 == 2 && t.currentVersion.contains(2))
    assert(t.read().count() == 3)
  }

  test("time travel: older versions stay readable") {
    val dir = tmpDir()
    val t = new SnapshotTable(spark, dir)
    t.commit(Seq(1, 2).toDF("x"))
    t.commit(Seq(1, 2, 3, 4).toDF("x"))
    assert(t.read(Some(1)).count() == 2)
    assert(t.read(Some(2)).count() == 4)
  }

  test("crash safety: data dir without a published manifest is invisible") {
    val dir = tmpDir()
    val t = new SnapshotTable(spark, dir)
    t.commit(Seq(1, 2, 3).toDF("x"))
    // simulate a crash mid-commit: orphan data directory, no manifest rename
    Seq(9, 9, 9).toDF("x").write.parquet(s"$dir/data/v000099")
    val t2 = new SnapshotTable(spark, dir)
    assert(t2.currentVersion.contains(1))
    assert(t2.read().count() == 3)
  }

  test("commit counts rows on the write itself: one job, no re-scan") {
    val dir = tmpDir()
    val t = new SnapshotTable(spark, dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      t.commit(Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v"))
      // listener delivery is async: wait until the job count is stable
      var last = jobs.get(); var stable = 0
      while (stable < 4) {
        Thread.sleep(100)
        if (jobs.get() == last) stable += 1 else { last = jobs.get(); stable = 0 }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 1, s"commit must trigger exactly one job over the data, saw ${jobs.get()}")
    // and the manifest row count is the real one (from the Observation)
    val manifest = new String(java.nio.file.Files.readAllBytes(
      Paths.get(dir, "manifests", "v000001.json")))
    assert(manifest.contains("\"rowCount\":3"), manifest)
  }

  test("metrics + lineage travel in the manifest") {
    val dir = tmpDir()
    val t = new SnapshotTable(spark, dir)
    t.commit(Seq(1).toDF("x"), metrics = Map("n_ok" -> "1", "run_id" -> "0"))
    t.commit(Seq(1, 2).toDF("x"), metrics = Map("n_ok" -> "2", "run_id" -> "1"))
    assert(t.metricsOf(1)("n_ok") == "1")
    assert(t.metricsOf(2)("run_id") == "1")
  }

  test("partitioned snapshot supports partition-pruned reads") {
    val dir = tmpDir()
    val t = new SnapshotTable(spark, dir)
    val df = Seq(("aaa", 1, 10), ("aab", 1, 20), ("aaa", 2, 30)).toDF("prefix", "run_id", "v")
    t.commit(df, partitionBy = Seq("prefix", "run_id"))
    val pruned = t.read().filter($"prefix" === "aaa" && $"run_id" === 1)
    assert(pruned.collect().map(_.getAs[Int]("v")).toSeq == Seq(10))
    // partition pruning visible in the scan
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }
}
