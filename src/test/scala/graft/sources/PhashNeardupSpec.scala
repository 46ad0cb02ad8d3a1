package graft.sources

import graft.SparkSpec
import graft.fetch.Payload

/** q87 — image near-dup dedup over the decoded-pixel perceptual hash.
  * The oracle gates the planted pair set; this spec carries the pieces the
  * closed form rests on: the renderer's exact-flip property, the decode
  * round-trip, and precision (no unplanted pairs). */
class PhashNeardupSpec extends SparkSpec {

  test("renderNoise: variant phash sits at EXACTLY the planted distance") {
    (0 until 32).foreach { i =>
      val id = s"noisebase$i"
      val base = Payload.phash(Payload.renderNoise(id, 0))
      (1 to 4).foreach { t =>
        val v = Payload.phash(Payload.renderNoise(id, t))
        assert(java.lang.Long.bitCount(base ^ v) === t, s"id=$id flips=$t")
      }
    }
  }

  test("renderNoise: flip counts past the 64-cell grid are rejected, not a hang") {
    // the flip loop draws without replacement from 64 cells — 65 flips can
    // never complete; the guard must throw instead of spinning forever
    intercept[IllegalArgumentException](Payload.renderNoise("guard", 65))
    intercept[IllegalArgumentException](Payload.renderNoise("guard", -1))
    assert(java.lang.Long.bitCount(
      Payload.phash(Payload.renderNoise("guard", 0)) ^
        Payload.phash(Payload.renderNoise("guard", 64))) === 64)
  }

  test("q95 chains: nested flip sets give d(base,v)=f, d(v,w)=f, d(base,w)=2f") {
    (0 until 16).foreach { i =>
      val id = s"chain$i"
      val b = Payload.phash(Payload.renderNoise(id, 0))
      val v = Payload.phash(Payload.renderNoise(id, 3))
      val w = Payload.phash(Payload.renderNoise(id, 6))
      assert(java.lang.Long.bitCount(b ^ v) === 3)
      assert(java.lang.Long.bitCount(v ^ w) === 3, "flip stream must be nested")
      assert(java.lang.Long.bitCount(b ^ w) === 6, "base-w must sit past the radius")
    }
  }

  test("q95 components: w reaches the base's cluster only through v (diameter 2)") {
    val rows = graft.sources.Images.phashNeardupComponents(spark, sf0001, limit = 48)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val clusters = rows.filter(_._3 === 3L)
    assert(clusters.nonEmpty, "planted chains must appear")
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      val ids = members.map(_._1).toSet
      assert(ids === Set(rep, rep + "_v", rep + "_w"), s"cluster at $rep: $ids")
    }
    // the _w member has NO direct edge to the base (d=6 > radius 3): its
    // membership proves the label propagated through v, i.e. the closure
    // did real multi-round work
    assert(rows.filter(_._3 === 1L).nonEmpty, "singletons must pass through")
    assert(rows.length === rows.map(_._1).distinct.length, "labeling is total and unique")
  }

  test("renderNoise: PNG encode/decode round-trips the phash exactly") {
    (0 until 8).foreach { i =>
      val id = s"roundtrip$i"
      val img = Payload.renderNoise(id, 0)
      val decoded = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Payload.encode(img, "png")))
      assert(Payload.phash(decoded) === Payload.phash(img))
    }
  }

  test("q87: pairs == the planted closed form, distances exact, no spurious pairs") {
    val got = Images.phashNeardupPairs(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    // expected: one (base, base_v, 3) pair per doc_id % 3 == 0 in the first 192
    import org.apache.spark.sql.functions._
    val h = translate(md5(col("doc_id").cast("string")), "0123456789abcdef", "abcdefghijklmnop")
    val expected = graft.core.Tables.documents(spark, sf0001)
      .orderBy("doc_id").limit(192)
      .filter(col("doc_id") % 3 === 0)
      .select(concat(h, h).as("b"))
      .collect().map(_.getString(0)).sorted
      .map(b => (b, b + "_v", 3))
    assert(got.sorted.toSeq === expected.toSeq)
    assert(got.length === 64)
  }

  test("q87 determinism: two runs produce identical pair sets") {
    val a = Images.phashNeardupPairs(spark, sf0001, limit = 60).collect().map(_.toString).sorted
    val b = Images.phashNeardupPairs(spark, sf0001, limit = 60).collect().map(_.toString).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
