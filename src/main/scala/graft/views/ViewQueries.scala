package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** The reference's SQL view layer re-expressed as Catalyst window plans.
  *
  * The reference computes "most recent crawl per extension" with an argmax
  * self-join (reference: database/views/extension_most_recent.sql:30), the
  * second-most-recent with an extra NOT-IN anti-subquery
  * (extension_second_most_recent.sql:30), as-of variants with a date
  * parameter (extension_most_recent_until_date.sql:33), and version-update
  * intervals with a quadratic theta self-join (extension_update.sql:30).
  *
  * Spark-first design: every one of these is a single window over
  * `partitionBy(entity).orderBy(time)` — one shuffle on the entity key, no
  * self-join, no theta join. At 100 TB the self-join would shuffle the fact
  * table twice and explode intermediate rows; the window shuffles it once.
  * The `events` table (user_id, ts) plays the role of (extid, date).
  */
object ViewQueries {

  /** Deterministic per-entity recency window: ties broken by event_id so the
    * rank-1 row is unique (the reference's `(extid, date)` PK guarantees the
    * same: database/schemas/extension.sql:40). */
  private def recency = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)

  /** W1/J4 — rank-1 per group (extension_most_recent.sql:30). */
  def mostRecent(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(recency))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")

  /** W2/J5 — rank-2 per group (extension_second_most_recent.sql:30). */
  def secondMostRecent(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(recency))
      .filter(col("rn") === 2)
      .select("user_id", "event_id", "event_type", "value")

  /** J6 — as-of ("until date") view: pre-filter on the date param, then the
    * rank-1 window (extension_most_recent_until_date.sql:1-2,33). The filter
    * is pushed to the parquet scan by Catalyst (partition/row-group pruning
    * at scale). */
  def asOfMostRecent(spark: SparkSession, dir: String, until: String = "2024-01-15 00:00:00"): DataFrame =
    Tables.events(spark, dir)
      .filter(col("ts") <= lit(until).cast("timestamp"))
      .withColumn("rn", row_number().over(recency))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")

  /** J7/W3 — change-detection intervals. The reference derives "first date
    * with new etag / last date with previous etag" via a quadratic self-join
    * (extension_update.sql:30); `lag` over the per-entity time order replaces
    * it with one window pass. Emits one row per transition. */
  def updateIntervals(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull && col("prev_type") =!= col("event_type"))
      .select("user_id", "event_id", "prev_type", "event_type")
  }

  /** J8 — "added permissions" analog (database/queries/get_added_permissions.sql:1-16):
    * for each customer's most recent order, the parts that were NOT in the
    * previous order. 3-way equi-join + window ranks + left_anti, exactly the
    * decorrelated form of the reference's NOT-IN subquery. */
  def addedItems(spark: SparkSession, dir: String): DataFrame = {
    // spread (round 6): lineitem is the probe side of BOTH broadcast joins
    // below — unsplit, its 600k-row probes ran serially twice. One keyed
    // exchange (reused by both consumers via ReuseExchange) fans the
    // probes across cores; join results are unchanged (counts/keys only).
    val li = Tables.spread(
      Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey"), col("l_orderkey"))
    val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    // customers with both a latest and a previous order — ONE window pass
    // (round 6): the former latest ⋈ prev self-join evaluated the ranked
    // subtree twice per consumer (Spark has no cross-consumer subplan
    // sharing), and `pairs` feeds BOTH lineitem joins below, so the orders
    // window ran 4×. The rank-1/rank-2 rows pivot out of a single pass
    // (same partitioning as the window — no extra exchange), and the tiny
    // per-customer frame persists for its two consumers.
    val pairs = graft.core.CacheScope.persist(
      Tables.orders(spark, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .groupBy("o_custkey").agg(
          max(when(col("rn") === 1, col("o_orderkey"))).as("o_orderkey"),
          max(when(col("rn") === 2, col("o_orderkey"))).as("prev_orderkey"))
        .filter(col("prev_orderkey").isNotNull))
    val latestParts = pairs.join(li, pairs("o_orderkey") === li("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"), col("prev_orderkey"), col("l_partkey"))
    val prevParts = pairs.join(li, pairs("prev_orderkey") === li("l_orderkey"))
      .select(col("o_custkey").as("pc"), col("l_partkey").as("pp"))
    latestParts.join(
        prevParts,
        latestParts("o_custkey") === prevParts("pc") && latestParts("l_partkey") === prevParts("pp"),
        "left_anti")
      .select("o_custkey", "o_orderkey", "l_partkey")
      .distinct()
  }

  /** W6/O3 — deterministic top-k (order by downloads desc analog,
    * get_added_permissions.sql:16). Unique tiebreak key makes the SET
    * deterministic; at scale Spark executes this as a TakeOrderedAndProject
    * (per-partition top-k + driver merge, no global sort). */
  def topKOrders(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(k)
      .select("o_orderkey", "o_totalprice")

  /** A11 — derivative metric over a cumulative series (the reference computes
    * downloads/8h with a gnuplot first-derivative trick,
    * scripts/monitoring/download-report-one-week.gp:47-71). `lag` + frame
    * arithmetic on the per-user event series. */
  def valueDeltas(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_value", lag("value", 1).over(w))
      .filter(col("prev_value").isNotNull)
      .select(
        col("user_id"), col("event_id"),
        round(col("value") - col("prev_value"), 2).as("value_delta"))
  }

  /** Stall-detection monitor — the reference's main operational alarm
    * (scripts/monitoring/global_update_monitor.sh:200-211: the cumulative
    * download count sampled on a fixed cadence; the SAME count twice in a
    * row → alert). Re-expressed as one plan: a DENSE 8-hour sample spine
    * (zero-activity buckets must appear — they ARE the stall signal, and a
    * groupBy alone would drop them), per-type cumulative counts via a
    * running-sum window, and the alert predicate as lag-equality over the
    * cumulative series. Scale shape: two scans of the fact table (bounds +
    * counts), the spine is O(samples × types) rows, one window shuffle on
    * the type key. */
  def stallMonitor(spark: SparkSession, dir: String, bucketSec: Long = 28800L): DataFrame =
    stallMonitorOver(
      Tables.events(spark, dir).select(col("event_type"), col("ts")), bucketSec)

  /** Core of [[stallMonitor]] over any (event_type, ts) frame. */
  def stallMonitorOver(events: DataFrame, bucketSec: Long = 28800L): DataFrame = {
    val e = events.withColumn("sec", col("ts").cast("timestamp").cast("long"))
    // 1-row bounds; broadcast to index events and to build the spine
    val bounds = e.agg(min("sec").as("lo"), max("sec").as("hi"))
    val counts = e.crossJoin(broadcast(bounds))
      .withColumn("bucket", floor((col("sec") - col("lo")) / bucketSec).cast("long"))
      .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
    val spine = bounds.select(explode(
      sequence(lit(0L), floor((col("hi") - col("lo")) / bucketSec).cast("long"))).as("bucket"))
    val types = e.select("event_type").distinct()
    val w = Window.partitionBy("event_type").orderBy("bucket")
    types.crossJoin(spine)
      .join(counts, Seq("event_type", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("cum_n", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // the monitor's predicate verbatim: current sample == previous sample
      .withColumn("stalled", coalesce(col("cum_n") === lag("cum_n", 1).over(w), lit(false)))
      .select("event_type", "bucket", "cum_n", "stalled")
  }

  /** A1/P1-P2 — single-pass status classification (the reference's 11
    * summary counters over UpdateResults, crawler:81-99). One scan, one
    * partial+final agg, no per-class scans. */
  def statusCounts(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    def cnt(t: String) = count(when(col("event_type") === t, 1)).as(s"n_$t")
    e.agg(
      cnt("view"), cnt("click"), cnt("purchase"), cnt("signup"), cnt("error"),
      count(lit(1)).as("n_total"),
      countDistinct("user_id").as("n_users"))
  }

  /** U1-U3 — frontier set algebra (known ∪ forum, all − forum, failed ∩ forum;
    * crawler:204,215,228-234): registered customers with no event activity
    * (`except` = the reference's `set(...) - set(...)`, archive.py:590). */
  def setAlgebra(spark: SparkSession, dir: String): DataFrame = {
    val known  = Tables.customer(spark, dir).select(col("c_custkey").as("entity_key")).distinct()
    val active = Tables.events(spark, dir).select(col("user_id").as("entity_key")).distinct()
    known.except(active)
  }

  /** J12 — broadcast dimension join (cdnjs md5 point-lookups, db.py:166-249):
    * fact lineitem joined to the small `part` dimension with an explicit
    * broadcast hint, then rollup by brand. At 100 TB the fact side never
    * shuffles for this join. */
  def brandRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(
        count(lit(1)).as("n_items"),
        round(sum("l_extendedprice"), 2).as("revenue"))

  /** A1-style pricing summary — the classic one-pass grouped aggregation
    * (shape of TPC-H Q1; reference analog: per-run metrics rollup
    * crawler:78-106). Partial aggregation map-side, 2-key groupBy. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
}
