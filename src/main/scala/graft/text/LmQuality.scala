package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.etl.TrainPrep

/** Language-model-based corpus selection — the two standard LM-driven
  * data-curation operators between cleaning and training:
  *
  *  - CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020): score every
  *    document under a language model trained on a trusted slice, then
  *    split the corpus into head/middle/tail perplexity tertiles — the
  *    head is the "cleanest" third. Our LM is an add-1-smoothed unigram
  *    model over the q88 train fold (a deterministic stand-in for CCNet's
  *    KenLM — the bucketing dataflow, which is the operator, is identical).
  *  - DSIR-style IMPORTANCE SELECTION (Xie et al. 2023): keep documents
  *    whose hashed-feature distribution looks more like a target domain
  *    than like the raw corpus — per-doc importance weight
  *    log p_target(doc) − log p_raw(doc) under two hashed unigram models,
  *    thresholded at 0. Hashing features into a FIXED bucket count is
  *    DSIR's own scale trick: the model is B rows regardless of corpus
  *    size, so the scoring join broadcasts at any scale.
  *
  * Scale shape (both): token explode → broadcast model join → per-doc
  * aggregate — one doc-keyed exchange, no global sort. q104's tertile cut
  * points are two scalars (an `Aggregate` over per-doc scores folded into
  * a broadcast), so bucket ASSIGNMENT is a scan-side comparison, not an
  * ntile window — splitting 100 TB never single-partitions. The q104
  * vocabulary join is broadcast, which is safe for the driver corpus's
  * bounded vocabulary but NOT for an open-web corpus, where the distinct
  * token set is unbounded: deploying this operator at that scale requires
  * adding a top-K (Zipf) vocabulary cap with OOV falling through to the
  * smoothing floor — a semantic change this oracle-gated form deliberately
  * does not implement (ADVICE r5). q105's model is exactly `buckets` rows
  * by construction, broadcastable at any scale.
  *
  * Both are DuckDB-replayable end to end (md5 hash buckets, ln, exact
  * interpolated quantiles), so the full semantics — LM training counts,
  * smoothing, scoring, thresholds, every per-doc decision — sit inside
  * the q104/q105 hash gates. Scores and cut points are rounded to 6
  * decimals before comparison so the cross-engine ln/summation-order
  * wobble (≤1 ulp) cannot move a bucket edge.
  *
  * No reference analog (the reference stops at archive analytics); these
  * are LLM-pipeline mandate operators like q88-q100.
  */
object LmQuality {

  /** Token explode, carrying only the columns the caller scores with —
    * keeps the parquet scan pruned to exactly what each query reads. */
  private def tokens(df: DataFrame, extra: org.apache.spark.sql.Column*) =
    df.select(col("doc_id") +: extra :+
      explode(split(trim(col("text")), "\\s+")).as("tok"): _*)

  /** q104 — CCNet-style perplexity tertiles. The unigram LM trains on the
    * q88 TRAIN fold only (scoring eval docs under an LM trained on them
    * would leak); every document is scored as mean negative log-likelihood
    * with add-1 smoothing over the train vocabulary V:
    * nll(w) = −ln((c(w)+1) / (N+V)), OOV ⇒ c = 0. Buckets are the exact
    * interpolated 1/3 and 2/3 quantiles of the rounded per-doc scores:
    * head (lowest nll) / middle / tail. */
  def perplexityBuckets(spark: SparkSession, dir: String,
                        trainPct: Int = 80): DataFrame = {
    val docs = Tables.documents(spark, dir)
    // toks feeds the LM counts AND the scoring pass; scored feeds the
    // quantile cut AND the final bucket projection — persist both shared
    // lineages (the Dedup.rareShingles discipline; ADVICE r5 flagged that
    // relying on ReuseExchange here is fragile). Each is one token/doc
    // keyed frame, far cheaper cached than re-tokenizing the corpus per
    // consumer.
    val toks = graft.core.CacheScope.persist(
      tokens(docs)
        .withColumn("train", TrainPrep.hashBucket(col("doc_id"), 100) < trainPct),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // LM: train-fold token counts + (N, V) — both tiny, broadcast.
    val counts = toks.filter(col("train")).groupBy("tok")
      .agg(count(lit(1)).as("c"))
    val stats = counts.agg(
      sum("c").cast("double").as("n"),
      count(lit(1)).cast("double").as("v"))
    val scored = graft.core.CacheScope.persist(
      toks
        .join(broadcast(counts), Seq("tok"), "left")
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          (-log((coalesce(col("c"), lit(0L)) + 1).cast("double") /
            (col("n") + col("v")))).as("nll"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), round(avg("nll"), 6).as("nll_mean")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val cuts = scored.agg(
      round(percentile(col("nll_mean"), lit(1.0 / 3)), 6).as("t1"),
      round(percentile(col("nll_mean"), lit(2.0 / 3)), 6).as("t2"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_tokens"), col("nll_mean"),
        when(col("nll_mean") <= col("t1"), "head")
          .when(col("nll_mean") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  def perplexityBucketsOracleSql(trainPct: Int = 80): String =
    s"""WITH tok AS (SELECT doc_id,
       |    ${TrainPrep.hashBucketSql("doc_id", 100)} < $trainPct AS train,
       |    unnest(string_split(trim(text), ' ')) AS tok FROM documents),
       |cnt AS (SELECT tok, count(*) AS c FROM tok WHERE train GROUP BY tok),
       |st AS (SELECT CAST(sum(c) AS DOUBLE) AS n, CAST(count(*) AS DOUBLE) AS v FROM cnt),
       |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    round(avg(-ln(CAST(COALESCE(c, 0) + 1 AS DOUBLE) / (n + v))), 6) AS nll_mean
       |  FROM tok t LEFT JOIN cnt USING (tok) CROSS JOIN st GROUP BY doc_id),
       |th AS (SELECT round(quantile_cont(nll_mean, 1.0/3), 6) AS t1,
       |    round(quantile_cont(nll_mean, 2.0/3), 6) AS t2 FROM sc)
       |SELECT doc_id, n_tokens, nll_mean,
       |  CASE WHEN nll_mean <= t1 THEN 'head'
       |       WHEN nll_mean <= t2 THEN 'middle' ELSE 'tail' END AS bucket
       |FROM sc CROSS JOIN th""".stripMargin

  /** q105 — DSIR-style hashed importance selection. Target domain = the
    * `lang = target` slice; features are unigrams hashed into `buckets`
    * md5 buckets (DSIR's fixed-width feature space — the model stays B
    * rows at any corpus size). Per doc:
    * weight = mean over tokens of ln p̂_target(b(w)) − ln p̂_raw(b(w)),
    * both add-1-smoothed over the B buckets; selected ⇔ weight above the
    * corpus MEDIAN weight — the deterministic analog of DSIR's
    * importance-proportional resampling (an absolute 0 cutoff degenerates
    * on a corpus whose target slice is near the raw mixture: every weight
    * is then a small negative). The median is one scalar (exact
    * interpolated quantile folded into a broadcast), so the keep decision
    * stays a scan-side comparison. */
  def dsirSelection(spark: SparkSession, dir: String,
                    target: String = "en", buckets: Int = 4096): DataFrame = {
    // toks feeds the model AND the scoring pass; scored feeds the median
    // cut AND the final selection — persist both shared lineages (see
    // perplexityBuckets; the md5 hash bucket per token is the expensive
    // projection here).
    val toks = graft.core.CacheScope.persist(
      tokens(Tables.documents(spark, dir), col("lang"))
        .withColumn("b", TrainPrep.hashBucket(col("tok"), buckets)),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    // One fixed-width model table: raw + target counts per hash bucket.
    val model = toks.groupBy("b").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("lang") === target, 1L).otherwise(0L)).as("c_t"))
    val stats = model.agg(
      sum("c_r").cast("double").as("n_r"),
      sum("c_t").cast("double").as("n_t"))
    val bl = lit(buckets.toDouble)
    val scored = graft.core.CacheScope.persist(
      toks
        .join(broadcast(model), Seq("b"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"),
          (log((col("c_t") + 1).cast("double") / (col("n_t") + bl)) -
            log((col("c_r") + 1).cast("double") / (col("n_r") + bl))).as("lr"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), round(avg("lr"), 6).as("logratio")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val cut = scored.agg(
      round(percentile(col("logratio"), lit(0.5)), 6).as("t"))
    scored.crossJoin(broadcast(cut))
      .select(col("doc_id"), col("n_tokens"), col("logratio"),
        (col("logratio") > col("t")).cast("int").as("selected"))
  }

  def dsirSelectionOracleSql(target: String = "en", buckets: Int = 4096): String =
    s"""WITH tok AS (SELECT doc_id, lang,
       |    ${TrainPrep.hashBucketSql("tok", buckets)} AS b
       |  FROM (SELECT doc_id, lang,
       |    unnest(string_split(trim(text), ' ')) AS tok FROM documents)),
       |m AS (SELECT b, count(*) AS c_r,
       |    sum(CASE WHEN lang = '$target' THEN 1 ELSE 0 END) AS c_t
       |  FROM tok GROUP BY b),
       |st AS (SELECT CAST(sum(c_r) AS DOUBLE) AS n_r, CAST(sum(c_t) AS DOUBLE) AS n_t FROM m),
       |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       |    round(avg(ln(CAST(c_t + 1 AS DOUBLE) / (n_t + $buckets)) -
       |              ln(CAST(c_r + 1 AS DOUBLE) / (n_r + $buckets))), 6) AS logratio
       |  FROM tok JOIN m USING (b) CROSS JOIN st GROUP BY doc_id),
       |th AS (SELECT round(quantile_cont(logratio, 0.5), 6) AS t FROM sc)
       |SELECT doc_id, n_tokens, logratio,
       |  CAST(logratio > t AS INT) AS selected FROM sc CROSS JOIN th""".stripMargin
}
