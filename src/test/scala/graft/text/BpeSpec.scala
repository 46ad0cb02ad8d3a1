package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q106 (BPE round-1 pair statistics, oracle-gated) + q107 (the iterative
  * trainer, rows-only). The trainer's exactness is carried here: an
  * independent imperative BPE implementation (plain Scala maps over the
  * collected word dict, Sennrich's get_stats/merge loop) must produce the
  * identical merge table, and training must be a pure function of the
  * corpus (re-run equality). */
class BpeSpec extends SparkSpec {

  private def wordFreqs(): Map[String, Long] =
    graft.core.Tables.documents(spark, sf0001).select("text").collect()
      .flatMap(_.getString(0).trim.split("\\s+"))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }

  test("q106: round-1 pair stats equal a driver-side replay of get_stats") {
    val freqs = wordFreqs()
    val counts = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    freqs.foreach { case (w, f) =>
      w.sliding(2).filter(_.length == 2).foreach(p => counts(p) += f)
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(50)
    val got = Bpe.pairStats(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q107: merge table equals an independent imperative BPE trainer") {
    // independent implementation: Sennrich's loop over the collected dict.
    // ADVICE r5: the replay must not reuse production Bpe.mergeOnce (a bug
    // there would be invisible), and string ties must break in UTF-8 BYTE
    // order — Spark's sort order — not Scala's UTF-16 code-unit order
    // (they diverge for supplementary-plane symbols).
    def utf8Lt(x: String, y: String): Boolean = {
      val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
      var i = 0
      while (i < a.length && i < b.length) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      a.length < b.length
    }
    // leftmost-first non-overlapping merge, written independently of
    // production code
    def replayMerge(syms: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) { out += (a + b); i += 2 }
        else { out += syms(i); i += 1 }
      }
      out.result()
    }
    var dict = wordFreqs().map { case (w, f) => (w.map(_.toString).toVector, f) }
    val expected = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to 8) {
      val stats = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      dict.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p => stats(p) += f)
      }
      if (stats.nonEmpty) {
        val ((a, b), c) = stats.toSeq.reduceLeft { (u, v) =>
          val ((ua, ub), un) = u; val ((va, vb), vn) = v
          val uWins =
            if (un != vn) un > vn
            else if (ua != va) utf8Lt(ua, va)
            else utf8Lt(ub, vb) || ub == vb
          if (uWins) u else v
        }
        expected += ((r, a, b, c))
        dict = dict.map { case (syms, f) => (replayMerge(syms, a, b), f) }
      }
    }
    val got = Bpe.bpeTrain(spark, sf0001, merges = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expected.toSeq)
    // merged symbols really grow: the last learned merge concatenates
    // symbols produced by earlier rounds or base chars, and counts are
    // monotonically non-increasing is NOT guaranteed by BPE — but every
    // count must be positive and every rank present exactly once
    assert(got.map(_._1) === (1 to 8))
    assert(got.forall(_._4 > 0))
  }

  test("q107: training is deterministic across runs") {
    val a = Bpe.bpeTrain(spark, sf0001, merges = 4).collect().map(_.toSeq).toSeq
    val b = Bpe.bpeTrain(spark, sf0001, merges = 4).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("mergeOnce: leftmost-first non-overlapping application") {
    assert(Bpe.mergeOnce(Array("a", "a", "a"), "a", "a").toSeq === Seq("aa", "a"))
    assert(Bpe.mergeOnce(Array("a", "a", "a", "a"), "a", "a").toSeq === Seq("aa", "aa"))
    assert(Bpe.mergeOnce(Array("x", "a", "b", "y"), "a", "b").toSeq === Seq("x", "ab", "y"))
    assert(Bpe.mergeOnce(Array("a", "b"), "b", "a").toSeq === Seq("a", "b"))
  }
}
