package graft.sim

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH band-join + greedy rollup semantics (reference: simhashbucket:77-180,
  * 259-287; fixture plan FIXTURES.md §5). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("lshSelfJoin: planted pairs at Hamming 0/1/3 match, 4 does not") {
    val base = 0x0123456789ABCDEFL
    val rows = Seq(
      ("a0", base), ("a1", base),                  // dist 0
      ("b0", base ^ 1L),                           // dist 1 from a*
      ("c0", base ^ 0x7L),                         // dist 3 from a*
      ("d0", base ^ 0x1010101010L))                // dist ≥4 from everything
      .toDF("doc_id", "fp")
    val pairs = Dedup.lshSelfJoin(rows, "doc_id", "fp")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs.contains(("a0", "a1", 0)))
    assert(pairs.contains(("a0", "b0", 1)) && pairs.contains(("a1", "b0", 1)))
    assert(pairs.exists(p => p._1 == "a0" && p._2 == "c0" && p._3 == 3))
    assert(!pairs.exists(p => p._1.startsWith("d") || p._2 == "d0"),
      "distance-4 pair must NOT match at max_dist 3 (simhashbucket:132-140)")
  }

  test("greedyNewestFirstRollup: newest version wins each query, counted once") {
    // q1 under v2(new)+v1(old) → v2; q2 under v1 only → v1; q3 under v2 → v2
    val m = Seq(
      ("libA", "v2", "2024-02-01", 1L),
      ("libA", "v1", "2024-01-01", 1L),
      ("libA", "v1", "2024-01-01", 2L),
      ("libA", "v2", "2024-02-01", 3L),
      ("libB", "v9", "2023-05-05", 1L)) // independent lib: q1 counts again
      .toDF("lib", "version", "add_date", "query_id")
    val out = Dedup.greedyNewestFirstRollup(m)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(3))).toSet
    assert(out == Set(("libA", "v2", 2L), ("libA", "v1", 1L), ("libB", "v9", 1L)))
    // the window-argmax production plan must equal the literal greedy scan
    val ref = Dedup.greedyNewestFirstRollupReference(m)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    val prod = Dedup.greedyNewestFirstRollup(m)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
    assert(prod == ref)
  }

  test("greedyNewestFirstRollup production plan has no group-buffering (window form)") {
    val m = Seq(("libA", "v1", "2024-01-01", 1L)).toDF("lib", "version", "add_date", "query_id")
    val plan = Dedup.greedyNewestFirstRollup(m).queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("MapGroups"), "production rollup must not buffer groups:\n" + plan)
  }

  test("greedyNewestFirstRollup: same-date tie broken by version desc, deterministically") {
    val m = Seq(
      ("libA", "v1", "2024-01-01", 7L),
      ("libA", "v2", "2024-01-01", 7L)).toDF("lib", "version", "add_date", "query_id")
    val out = Dedup.greedyNewestFirstRollup(m)
      .collect().map(r => (r.getString(1), r.getLong(3))).toSet
    assert(out == Set(("v2", 1L)))
  }
}
