package graft.views

import java.sql.Timestamp

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Stall monitor (global_update_monitor.sh:200-211) + extgrep pattern
  * routing (extgrep:38-56). */
class MonitorSpec extends SparkSpec {
  import spark.implicits._

  test("stall monitor: a planted zero-progress window fires the alert, active windows don't") {
    // fetches every minute for 2 hours, then a 3-bucket silence, then resume
    val base = Timestamp.valueOf("2024-03-01 00:00:00").getTime
    def at(min: Long) = new Timestamp(base + min * 60000L)
    val events =
      (0L until 120L).map(m => ("download", at(m))) ++       // buckets 0,1 active
      (300L until 360L).map(m => ("download", at(m)))         // bucket 5 active
    val out = ViewQueries.stallMonitorOver(
      events.toDF("event_type", "ts"), bucketSec = 3600L)
      .collect().map(r => (r.getAs[Long]("bucket"),
        r.getAs[Long]("cum_n"), r.getAs[Boolean]("stalled"))).sortBy(_._1)
    // dense spine: buckets 0..5 all present, including the silent ones
    assert(out.map(_._1).toSeq == (0L to 5L))
    // the alert is lag-equality on the CUMULATIVE count: silent buckets fire
    assert(out.filter(_._3).map(_._1).toSeq == Seq(2L, 3L, 4L),
      s"exactly the zero-progress buckets must alert: $out")
    // cumulative series is monotone and correct
    assert(out.map(_._2).toSeq == Seq(60L, 120L, 120L, 120L, 120L, 180L))
  }

  test("extgrep router: hash-shaped high-entropy patterns route to the hash tier") {
    import graft.text.ExtGrep.looksLikeHash
    assert(looksLikeHash("5f4dcc3b5aa765d61d8327deb882cf99")) // md5 shape
    assert(looksLikeHash("da39a3ee5e6b4b0d3255bfef95601890afd80709")) // sha1 shape
    assert(!looksLikeHash("\"k\": 6[0-9]"), "a regex is not a digest")
    assert(!looksLikeHash("aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"),
      "right shape but degenerate entropy — extgrep:38-56 would scan, not hash-route")
    assert(!looksLikeHash("5f4dcc3b5aa765d61d8327deb882cf9"), "31 hex chars is not a digest")
  }

  test("extgrep: the hash-routed pattern matches via md5 equality, not regex") {
    val out = graft.text.ExtGrep.grep(spark, sf0001).collect()
    assert(out.nonEmpty)
    // BOTH regex patterns fire (a silently-dead pattern — e.g. a regex
    // escaping mishap — would vanish from the grouped output without any
    // other signal); the digest probe targets md5(props) and no props md5
    // equals it in testdata
    assert(out.map(_.getAs[String]("pattern")).toSet == Set("k_sixty", "k_single_digit"))
    assert(out.forall(_.getAs[Long]("n_matches") > 0))
  }

  test("libdet regex tier: provenance split, hash precedence per file") {
    val out = graft.sim.Dedup.libraryDetectRegexTier(spark, sf0001)
    val byMethod = out.groupBy("detect_method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMethod.getOrElse("regex", 0L) > 0, s"regex tier must fire: $byMethod")
    // per-file precedence: no doc appears in both tiers
    val hashDocs = out.filter(col("detect_method") === "md5").select("doc_id")
    val regexDocs = out.filter(col("detect_method") === "regex").select("doc_id")
    assert(hashDocs.join(regexDocs, "doc_id").count() == 0,
      "a hash-detected file must not fall through to the regex tier")
  }
}
