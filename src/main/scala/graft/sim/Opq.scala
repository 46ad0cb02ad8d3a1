package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** OPQ-style space decomposition for PQ — the dimension-allocation
  * component of Optimized Product Quantization (Ge/He/Ke/Sun, CVPR 2013 —
  * public algorithm; "eigenvalue allocation", §4.2 of the paper, restricted
  * here to the axis-aligned case: the orthogonal transform is a
  * PERMUTATION matrix).
  *
  * Why it matters: vanilla PQ slices vectors into CONTIGUOUS sub-spaces.
  * When variance concentrates in a few adjacent dimensions (the common
  * case for learned embeddings, whose energy is front-loaded by training
  * dynamics or a prior PCA), one codebook drowns trying to quantize all
  * the high-variance dims with k cells while the rest encode noise —
  * recall collapses. Balancing the per-sub-space variance product spreads
  * the information evenly, and a permutation is free at scan time: the
  * encode/score expressions just read the vector in permuted order
  * (element_at with literal indices — still codegen, no extra pass).
  *
  * The allocation is DATA-ADAPTIVE but needs only per-dimension variances:
  * one distributed aggregation over the corpus, then a greedy driver-side
  * assignment (sort dims by variance, place each into the non-full
  * sub-space with the smallest log-variance sum — the paper's balanced
  * partition heuristic). Deterministic: ties break by dimension index.
  */
object Opq {

  /** Variance-balancing dimension permutation: `perm(p)` = the original
    * dimension read at permuted position `p`; positions [s·subDim,
    * (s+1)·subDim) form sub-space s. */
  def balancedPerm(emb: DataFrame, m: Int, dim: Int = 64): Array[Int] = {
    val subDim = dim / m
    val vars = emb
      .select(posexplode(col("embedding")).as(Seq("p", "v")))
      .groupBy("p").agg(variance(col("v").cast("double")).as("vr"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val order = (0 until dim).sortBy(i => (-vars.getOrElse(i, 0.0), i))
    val buckets = Array.fill(m)(scala.collection.mutable.ArrayBuffer.empty[Int])
    val logSum = Array.fill(m)(0.0)
    order.foreach { i =>
      val open = (0 until m).filter(buckets(_).size < subDim)
      val s = open.minBy(logSum(_))
      buckets(s) += i
      logSum(s) += math.log(math.max(vars.getOrElse(i, 0.0), 1e-12))
    }
    buckets.flatMap(_.toSeq).toArray
  }

  /** The permuted view of an embedding column — literal-index gather, one
    * codegen'd array construction, no shuffle. */
  def permuteExpr(emb: Column, perm: Array[Int]): Column =
    array(perm.map(i => element_at(emb, i + 1)): _*)

  private def permutedCorpus(spark: SparkSession, dir: String,
                             perm: Array[Int]): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), permuteExpr(col("embedding"), perm).as("embedding"))

  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int, Int),
      (Array[Int], Pq.PqModel)]()

  /** Train the OPQ model: allocation pass + the standard deterministic PQ
    * training on the permuted corpus. Cached per (corpus, m, k, iters)
    * like [[Pq.model]] — omitting iters from the key would silently serve
    * a differently-trained model to an explicit-iters caller. */
  def model(spark: SparkSession, dir: String, m: Int = 8,
            k: Int = 16, iters: Int = 2): (Array[Int], Pq.PqModel) =
    modelCache.computeIfAbsent((dir, m, k, iters), _ => {
      val perm = balancedPerm(Tables.embeddings(spark, dir), m)
      (perm, Pq.train(permutedCorpus(spark, dir, perm), m, k, iters))
    })

  /** ADC top-k over OPQ codes: identical scan shape to [[Pq.adcTopK]] —
    * the permutation is applied to the query on the driver and to the
    * corpus inside the (cached) encode expression; the code scan itself is
    * byte-for-byte the same 8 B/vector ADC walk. */
  def adcTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
              kTop: Int = 10, m: Int = 8, k: Int = 16): DataFrame = {
    val (perm, mod) = model(spark, dir, m, k)
    val q = Pq.queryVec(spark, dir, queryId)
    val qPerm = perm.map(q)
    permutedCorpus(spark, dir, perm)
      .select(col("vec_id"), Pq.encodeExpr(col("embedding"), mod).as("code"))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(Pq.adcScore(qPerm, mod), 6).as("adc_score"))
      .orderBy(col("adc_score").desc, col("vec_id").asc)
      .limit(kTop)
  }
}
