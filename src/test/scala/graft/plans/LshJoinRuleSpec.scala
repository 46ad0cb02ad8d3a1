package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Hamming-join optimizer rewrite: declarative bit_count theta-join →
  * banded LSH equi-join, result-identical (including duplicate rows). */
class LshJoinRuleSpec extends AnyFunSuite {

  private lazy val session: SparkSession = {
    val base = graft.TestSpark.spark // shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(base)
    SparkSession.setActiveSession(base)
    s
  }

  private def fixtures(s: SparkSession) = {
    import s.implicits._
    val base = 0x0123456789ABCDEFL
    val a = Seq(("a0", base), ("a1", base ^ 1L), ("a2", base ^ 0x1010101010L), ("a3", -42L))
      .toDF("id_a", "fp_a")
    val b = Seq(("b0", base), ("b1", base ^ 0x7L), ("b2", 0x7FFFFFFFFFFFFFFFL), ("b3", -42L))
      .toDF("id_b", "fp_b")
    (a, b)
  }

  test("rewrite fires: theta Hamming join plans as an equi-join, results exact") {
    val s = session
    val (a, b) = fixtures(s)
    val joined = a.join(b, bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 3)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rule must remove the all-pairs join:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected an equi-join:\n$plan")

    // ground truth from the un-extended session (nested-loop semantics)
    val base = graft.TestSpark.spark
    val (a0, b0) = fixtures(base)
    val expected = a0.join(b0, bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 3)
      .collect().map(_.toString).sorted.toSeq
    val got = joined.collect().map(_.toString).sorted.toSeq
    assert(got == expected, s"rewrite changed results: got=$got expected=$expected")
    assert(got.nonEmpty, "fixture must produce matches (incl. the negative-fp pair)")
  }

  test("duplicate input rows keep their multiplicity (no Distinct smuggled in)") {
    val s = session
    import s.implicits._
    val fp = 0x1111222233334444L
    val a = Seq(("x", fp), ("x", fp)).toDF("id_a", "fp_a") // duplicate row
    val b = Seq(("y", fp ^ 3L)).toDF("id_b", "fp_b")
    val out = a.join(b, bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 2).collect()
    assert(out.length == 2, s"both duplicate rows must join: ${out.toSeq}")
  }

  test("randomized parity: seeded corpora with planted near-dups, k in 0..6") {
    val s = session
    val base = graft.TestSpark.spark
    import s.implicits._
    val rng = new scala.util.Random(99L)
    for (trial <- 0 until 8) {
      val k = rng.nextInt(7)
      val seeds = Seq.fill(12)(rng.nextLong())
      // plant near-dups: flip up to k+2 random bits of a seed
      def perturb(x: Long) =
        (0 until rng.nextInt(k + 3)).foldLeft(x)((v, _) => v ^ (1L << rng.nextInt(64)))
      val aRows = seeds.zipWithIndex.map { case (fp, i) => (s"a$i", fp) }
      val bRows = seeds.zipWithIndex.map { case (fp, i) => (s"b$i", perturb(fp)) } ++
        Seq.fill(6)((s"bx${rng.nextInt(1000)}", rng.nextLong()))
      def run(sess: SparkSession) = {
        import sess.implicits._
        val a = aRows.toDF("id_a", "fp_a")
        val b = bRows.toDF("id_b", "fp_b")
        a.join(b, bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= k)
          .collect().map(_.toString).sorted.toSeq
      }
      assert(run(s) == run(base), s"trial $trial (k=$k) diverged")
    }
  }

  test("rule leaves equi-joins alone") {
    val s = session
    import s.implicits._
    val a = Seq((1L, 0x1L)).toDF("k", "fp_a")
    val b = Seq((1L, 0x3L)).toDF("k2", "fp_b")
    val joined = a.join(b, col("k") === col("k2") &&
      bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 3)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("__lsh_band"), s"equi-join must not be rewritten:\n$plan")
    assert(joined.count() == 1)
  }

  test("multiplicity-preserving guard: pairs matching in several bands emit once") {
    val s = session
    import s.implicits._
    // identical fingerprints agree in ALL bands — output must still be 1 row
    val a = Seq(("p", 0x00DEAD00BEEF0000L)).toDF("id_a", "fp_a")
    val b = Seq(("q", 0x00DEAD00BEEF0000L)).toDF("id_b", "fp_b")
    val out = a.join(b, bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 3).collect()
    assert(out.length == 1, s"multi-band agreement must not duplicate: ${out.toSeq}")
  }
}
