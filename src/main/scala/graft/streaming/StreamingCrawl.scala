package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.{EtagState, FetchResult}
import graft.fetch.Fetcher
import graft.scheduler.Politeness

/** Structured-Streaming incremental layer (SURVEY §2.9).
  *
  * The reference is batch-with-state: nightly runs with per-id ETag caches
  * deciding "not modified" (archive.py:194-237, 305-348) and a cron
  * micro-batch cadence (scripts/update/global_update.sh:219-234). The
  * faithful streaming re-expression: frontier deltas arrive as a stream of
  * (id, runId) discovery events; `mapGroupsWithState` keyed by id carries the
  * EtagState so a re-discovered id whose etag is unchanged classifies as
  * not_modified without a payload fetch (T2); windowed counts with a
  * watermark give the per-run metrics view (T5/A1).
  *
  * Designed for `Trigger.AvailableNow` micro-batches over a frontier-delta
  * table: each batch drains what's available and checkpoints, exactly the
  * nightly batch-incremental semantics (T1), but the same query runs
  * continuously against a live source unchanged.
  */
object StreamingCrawl {

  /** One discovery event in the frontier delta stream. */
  final case class Discovery(id: String, runId: Int, ts: java.sql.Timestamp)

  /** Streaming fetch with carried etag state: first sight of an id fetches
    * (status from the deterministic fetcher); re-sights whose etag is
    * unchanged yield 304 not_modified (the If-Modified-Since/ETag skip,
    * archive.py:305-348). State never expires here (the reference keeps
    * etags forever in its archive side-files). */
  def fetchWithState(discoveries: Dataset[Discovery], seed: Long = 42L): Dataset[FetchResult] = {
    import discoveries.sparkSession.implicits._
    discoveries
      .groupByKey(_.id)
      .mapGroupsWithState[EtagState, FetchResult](GroupStateTimeout.NoTimeout()) {
        (id: String, events: Iterator[Discovery], state: GroupState[EtagState]) =>
          // process the newest discovery for this id in the batch; the
          // conditional-fetch decision is the SAME function the batch path
          // uses (Fetcher.conditionalResult) — one semantics, two runtimes
          val latest = events.maxBy(_.runId)
          val slot = graft.core.ScheduledFetch(-1L, id, "", "normal", 0L)
          val res = Fetcher.conditionalResult(slot, latest.runId, state.getOption.map(_.etag))
          if (res.status == 200) state.update(EtagState(id, res.etag, latest.runId))
          res
      }
  }

  /** Windowed per-class metrics with a watermark — the monitoring time-series
    * (scripts/monitoring gnuplot reports) as a streaming aggregation (T5). */
  def windowedMetrics(discoveries: DataFrame, window: String = "1 hour",
                      watermark: String = "2 hours"): DataFrame =
    discoveries
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(count(lit(1)).as("n_discovered"),
        approx_count_distinct(col("id")).as("n_unique_ids"))

  /** One monitoring sample (a progress event for `metric`). */
  final case class MetricSample(metric: String, ts: java.sql.Timestamp)
  final case class MonitorState(cum: Long)
  final case class StallAlert(metric: String, atMs: Long, cum_n: Long, stalled: Boolean)

  /** The stall monitor as a CONTINUOUS query — the streaming form of the
    * batch q61 (global_update_monitor.sh:200-211 samples a cumulative
    * counter on a cron cadence and alerts when it repeats). In streaming,
    * "the counter repeated" = a full bucket with NO samples, which only a
    * TIMEOUT can observe (no row arrives to trigger computation):
    * `flatMapGroupsWithState` with an event-time timeout re-armed
    * `bucketMs` past the watermark — progress rows (stalled=false) flow on
    * data; a key whose source goes silent fires its timeout and emits
    * stalled=true every bucket until data resumes, exactly the cron
    * alert's cadence.
    *
    * SCOPE: this detects PER-METRIC stalls while the pipeline itself is
    * alive (some metric still advances the watermark). A TOTAL outage
    * freezes the watermark, so event-time timers cannot fire — which is
    * why the reference runs its monitor OUT-OF-BAND on cron
    * (global_update_monitor.sh); the batch form (q61,
    * ViewQueries.stallMonitor) scheduled externally is the faithful
    * whole-pipeline alarm, and this operator complements it in-stream. */
  def stallAlerts(samples: Dataset[MetricSample], bucketMs: Long = 8L * 3600 * 1000,
                  watermarkDelay: String = "10 seconds"): Dataset[StallAlert] = {
    import samples.sparkSession.implicits._
    samples
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.metric)
      .flatMapGroupsWithState[MonitorState, StallAlert](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (metric: String, events: Iterator[MetricSample], state: GroupState[MonitorState]) =>
          val st = state.getOption.getOrElse(MonitorState(0L))
          val wm = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            // continued silence: re-alert one bucket past the watermark
            state.setTimeoutTimestamp(wm + bucketMs)
            Iterator.single(StallAlert(metric, wm, st.cum, stalled = true))
          } else {
            var cum = st.cum
            var lastTs = 0L
            events.foreach { e => cum += 1; lastTs = math.max(lastTs, e.ts.getTime) }
            state.update(MonitorState(cum))
            // arm from the LAST SAMPLE's event time, not the watermark: a
            // burst that arrives as one batch must count as progress up to
            // its newest sample, or the stale timer reads it as a stall
            state.setTimeoutTimestamp(math.max(lastTs, wm) + bucketMs)
            Iterator.single(StallAlert(metric, wm, cum, stalled = false))
          }
      }
  }

  /** Production sink: stream → snapshot table via foreachBatch. The memory
    * sink cannot recover from a checkpoint; foreachBatch + the idempotent
    * last-wins MERGE (Etl.mergeUpsert, T6) is the restart-safe path — a
    * replayed micro-batch converges to the same snapshot, mirroring the
    * reference's ON-DUP-KEY upserts (mysql_backend.py:99-104). Each batch
    * commits one snapshot version keyed by (id), newest runId wins. */
  def runToSnapshot(spark: SparkSession, discoveries: Dataset[Discovery],
                    tableDir: String, checkpoint: String): Unit = {
    val q = fetchWithState(discoveries)
      .writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[FetchResult], batchId: Long) =>
        val table = new graft.snapshot.SnapshotTable(batch.sparkSession, tableDir)
        graft.etl.Etl.mergeUpsert(batch.sparkSession, table,
          batch.toDF().withColumn("batch_id", lit(batchId)),
          keyCols = Seq("id"), versionCol = "batch_id")
        ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Wire a discovery stream through the stateful fetch into an in-memory
    * sink (tests) or any `format`; `Trigger.AvailableNow` drains-and-stops =
    * one nightly batch. */
  def runAvailableNow(spark: SparkSession, discoveries: Dataset[Discovery],
                      queryName: String, checkpoint: String): Unit = {
    val q = fetchWithState(discoveries)
      .writeStream
      .outputMode(OutputMode.Update())
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
