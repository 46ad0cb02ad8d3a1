package graft.text

import graft.SparkSpec

/** q100 — duplicated-span coverage. The oracle hash-gates the full
  * computation; this spec carries the semantic ground truth: a driver-side
  * replay (overlapping instances, multiset count, interval union) and the
  * three planted span shapes. */
class DupSpansSpec extends SparkSpec {

  private val N = 8

  test("q100: engine output equals a driver-side replay over sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val planted = docs.map { case (id, text) =>
      id -> (if (id % 21 == 10) PassageDedup.Boilerplate + " " + PassageDedup.Boilerplate + " " + text
             else if (id % 7 == 3) PassageDedup.Boilerplate + " " + text
             else text).split(" ", -1)
    }
    // global multiset count of overlapping n-grams
    val counts = scala.collection.mutable.Map.empty[String, Int]
    planted.values.foreach { ws =>
      if (ws.length >= N) ws.sliding(N).foreach { g =>
        val k = g.mkString(" "); counts(k) = counts.getOrElse(k, 0) + 1
      }
    }
    val expected = planted.map { case (id, ws) =>
      val covered = Array.fill(ws.length)(false)
      if (ws.length >= N) ws.sliding(N).zipWithIndex.foreach { case (g, i) =>
        if (counts(g.mkString(" ")) >= 2) (i until i + N).foreach(covered(_) = true)
      }
      val c = covered.count(identity).toLong
      id -> (ws.length.toLong, c,
        BigDecimal(c.toDouble / ws.length).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = DupSpans.dupSpanCoverage(spark, sf0001, N).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (id, v) => assert(v === expected(id), s"doc $id") }
  }

  test("q100: the three planted span shapes all surface") {
    val rows = DupSpans.dupSpanCoverage(spark, sf0001, N).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // cross-doc boilerplate prefix: covered at least the 16 planted words,
    // but NOT the whole doc — for docs whose BODY is unique (a prefixed doc
    // can also be one of the corpus's planted exact-dup pairs; those are
    // legitimately covered end to end)
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val dupBodies = texts.groupBy(_._2).values.filter(_.length > 1).flatten.map(_._1).toSet
    val prefixed = rows.filter { case (id, _, _, _) =>
      id % 7 == 3 && id % 21 != 10 && !dupBodies.contains(id) }
    assert(prefixed.nonEmpty)
    prefixed.foreach { case (id, n, c, f) =>
      assert(c >= 16, s"doc $id boilerplate prefix uncovered (c=$c)")
    }
    // partial coverage is the common case: a unique body keeps its own
    // n-grams count-1 (full coverage happens only for the corpus's planted
    // dup/near-dup bodies, which share every window with their twin)
    assert(prefixed.exists(_._4 < 1.0), "some prefixed doc must be partially covered")
    // intra-doc doubled prefix: the repeat duplicates even without any
    // other doc — covered at least the 32 doubled words
    rows.filter(_._1 % 21 == 10).foreach { case (id, _, c, _) =>
      assert(c >= 32, s"doc $id doubled prefix (c=$c)")
    }
    // the corpus's planted exact-dup docs: every token covered
    assert(rows.exists(_._4 == 1.0), "exact-dup docs must be fully covered")
    // and untouched docs with zero duplicated spans exist
    assert(rows.exists(_._3 == 0L), "clean docs must report zero coverage")
  }
}
