package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Approximate-nearest-neighbor search over an embedding column
  * (Array[Float], 64-dim in the test corpus).
  *
  * Baseline: brute-force cosine top-k — `zip_with` dot product + norms, all
  * inside whole-stage codegen (higher-order functions, no UDF). The query
  * vector rides in as a 1-row broadcast cross join, so the scan side never
  * shuffles; top-k executes as TakeOrderedAndProject.
  *
  * Scale path: LSH bucketing by random-hyperplane sign bits — each vector
  * maps to a small integer bucket (Hamming space of sign bits); probe only
  * the query's bucket (+ neighbors at Hamming 1 if recall requires). The
  * hyperplanes are a deterministic seeded matrix broadcast to executors; the
  * bucket id is a plain integer groupBy/join key, so a 100 TB corpus prunes
  * to ~1/2^bits of itself per probe. Analog of the reference's simhash band
  * tables (simhashbucket:95-116) transplanted to dense vectors.
  */
object Ann {

  /** dot(a, b) via zip_with + aggregate — codegen'd, elements widened to
    * double before multiply so results are engine-portable. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against the embedding of `queryId`. */
  def bruteForceTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("embedding"), col("q_embedding")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a pure function both of this engine and any oracle could compute —
    * derived from md5, mapped to {-1, +1}. Using sign-only (Rademacher)
    * hyperplanes keeps the arithmetic exact (sums of float-widened doubles,
    * no irrational constants). */
  private def planeSign(p: Int, i: Column): Column =
    when(conv(substring(md5(concat(lit(s"plane$p|"), i.cast("string"))), 1, 4), 16, 10)
      .cast("long") % 2 === 0, lit(1.0)).otherwise(lit(-1.0))

  /** Sign-bit bucket id for a vector under `nPlanes` seeded hyperplanes. */
  def lshBucket(emb: Column, nPlanes: Int = 8): Column = {
    val bits = (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(63)), (x, i) => x.cast("double") * planeSign(p, i)),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF/LSH-bucketed ANN: assign every vector a sign-bit bucket, then search
    * only within the query vector's bucket. Returns top-k of the probed
    * bucket — the approximate answer whose recall/probe tradeoff is set by
    * nPlanes (and multi-probe at Hamming 1 if extended). */
  def lshTopK(spark: SparkSession, dir: String, queryId: Long = 0L, k: Int = 10, nPlanes: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_embedding"), col("bucket").as("q_bucket"))
    emb.join(broadcast(q), col("bucket") === col("q_bucket"))
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine(col("embedding"), col("q_embedding")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Top-k most-similar in-bucket pairs: the embedding near-dup join shaped
    * as a similarity top-k (always non-empty, robust to corpora with no pairs
    * above a fixed threshold). Executes as TakeOrderedAndProject over the
    * bucket join output. */
  def topPairs(spark: SparkSession, dir: String, k: Int = 50, nPlanes: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("id_a").asc, col("id_b").asc)
      .limit(k)
  }

  /** Embedding-cosine near-duplicate pairs: all pairs in the same LSH bucket
    * with cosine ≥ threshold — the embedding analog of simhash near-dup
    * dedup. Bucket equi-join keeps the pair space ~|corpus|²/2^planes. */
  def cosineNearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.9, nPlanes: Int = 4): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .withColumn("bucket", lshBucket(col("embedding"), nPlanes))
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"), col("bucket"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"), col("bucket"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("emb_a"), col("emb_b")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
