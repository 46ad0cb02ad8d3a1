package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Distributed BPE tokenizer training (Sennrich et al. 2016) — the
  * tokenizer-construction step of an LLM data pipeline, expressed in the
  * algorithm's own scale shape: ONE corpus-wide pass aggregates the
  * word-frequency dictionary (the only stage that touches all 100 TB);
  * every merge round then runs over the DISTINCT-word dict, which is
  * vocabulary-bounded regardless of corpus size. Pair statistics count
  * overlapping adjacent occurrences weighted by word frequency, exactly
  * Sennrich's `get_stats` over `zip(word, word[1:])`; ties break
  * deterministically on (count desc, pair asc) so training is a pure
  * function of the corpus.
  *
  * q106 gates round-1 pair statistics end to end in DuckDB (explode →
  * dict → char pairs → weighted count → top-k). The multi-round trainer
  * (q107) is rows-only by declared design — each round's segmentation
  * depends on the previous round's argmax, which a static SQL oracle
  * cannot replay — and BpeSpec replays the full merge table against an
  * independent imperative implementation instead.
  *
  * Simplification vs Sennrich: no end-of-word marker symbol (</w>); merges
  * therefore never distinguish word-final pairs. The dataflow — dict
  * aggregation, weighted overlapping pair counts, argmax-merge rounds —
  * is the published algorithm.
  */
object Bpe {

  /** The (word, freq) dictionary — the one corpus-scale aggregation. The
    * corpus scan is SPREAD before the explode (Tables.spread doc): the
    * single-row-group input would otherwise tokenize + partial-aggregate
    * the whole corpus on one task. */
  private def wordDict(spark: SparkSession, dir: String): DataFrame =
    // persists (CacheScope): the dict is the shared corpus-scale stage of
    // q106 (pair stats) and q107 (trainer round 1) — identical plan, one
    // materialization; exact long counts, so sharing cannot move a result
    graft.core.CacheScope.persist(
      Tables.spread(Tables.documents(spark, dir).select(col("doc_id"), col("text")), col("doc_id"))
        .select(explode(split(trim(col("text")), "\\s+")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("freq")),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** q106 — round-1 BPE pair statistics: adjacent CHARACTER pairs per
    * distinct word, counted with overlap multiplicity × word frequency,
    * top-k by (count desc, pair asc). This is the argmax input of the
    * first merge round, fully SQL-replayable. */
  def pairStats(spark: SparkSession, dir: String, k: Int = 50): DataFrame =
    wordDict(spark, dir)
      .filter(length(col("word")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum("freq").cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)

  def pairStatsOracleSql(k: Int = 50): String =
    s"""WITH w AS (SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split(trim(text), ' ')) AS word FROM documents) GROUP BY word),
       |p AS (SELECT freq,
       |    unnest(list_transform(range(1, length(word)), i -> substr(word, i, 2))) AS pair
       |  FROM w WHERE length(word) >= 2)
       |SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM p GROUP BY pair
       |ORDER BY cnt DESC, pair ASC LIMIT $k""".stripMargin

  /** Dict row during training (public: Spark's encoder codegen cannot
    * instantiate a private case class from generated code). */
  final case class Seg(syms: Array[String], freq: Long)

  /** q107 — the iterative trainer: `merges` rounds of (distributed pair
    * count over the dict) → (driver argmax, one tiny row) → (broadcast
    * merge applied by a typed map). Returns the learned merge table
    * (rank, sym_a, sym_b, cnt-at-merge-time) — the artifact a tokenizer
    * ships. Each round's shuffle is over the dict's pair set (vocabulary-
    * bounded); the corpus is scanned exactly once, in [[wordDict]].
    *
    * MERGES BOUND (ADVICE r5): each round's `dict.map(...).persist()`
    * truncates recomputation but not the logical plan, which nests one map
    * per round — fine at the default 8 merges, but a production-vocabulary
    * run (~30k merges) would need the per-round dict localCheckpoint'd
    * (the componentLabels pattern) to keep plan depth O(1). Keep `merges`
    * ≲ 100 with this implementation. */
  def bpeTrain(spark: SparkSession, dir: String, merges: Int = 8): DataFrame = {
    import spark.implicits._
    var dict = wordDict(spark, dir).as[(String, Long)]
      .map { case (w, f) => Seg(w.map(_.toString).toArray, f) }
      .persist()
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var prev: Option[org.apache.spark.sql.Dataset[Seg]] = None
    for (r <- 1 to merges) {
      // round-6 pair count: declarative explode + groupBy instead of the
      // typed groupByKey/reduceGroups — partial (map-side) aggregation
      // collapses the per-word pair stream to distinct pairs before the
      // exchange, and the rows stay Tungsten-encoded (the typed form
      // shipped every (pair, freq) object through an encoder round-trip).
      // Same multiset of (pair, freq) contributions, same tie-break sort.
      val best = dict
        .filter(size(col("syms")) >= 2)
        .select(col("freq"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> named_struct('a', syms[i], 'b', syms[i+1]))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      // this action also materialized `dict`'s persist — the previous
      // round's cache is released only now, so nothing recomputed and no
      // per-round count() materialization job is needed
      prev.foreach(_.unpersist())
      prev = Some(dict)
      if (best.nonEmpty) {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r, a, b, c))
        dict = dict.map(s => Seg(mergeOnce(s.syms, a, b), s.freq)).persist()
      }
    }
    dict.unpersist()
    prev.foreach(_.unpersist())
    learned.toSeq.toDF("merge_rank", "sym_a", "sym_b", "cnt")
  }

  /** One left-to-right greedy merge pass of the pair (a, b) — the standard
    * BPE application rule (overlapping occurrences merge non-overlapping,
    * leftmost first: "aaa" + merge(a,a) → ["aa", "a"]). */
  def mergeOnce(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }
}
