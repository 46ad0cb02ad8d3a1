package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (see TESTDATA.md).
  *
  * All engine queries take `(spark, sfDir)` and read from these tables only —
  * mirroring how the reference's analytics read from its relational store
  * (reference: database/README.md:63-69, the archive/DB is the golden source).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Cached row count per (dir, table) — the stand-in for catalog table
    * statistics (on a real deployment this is `spark.table(...).stats`).
    * Repeated ANN queries size their geometry from it without paying a
    * count() job per invocation; driver testdata is immutable, so the
    * cache never invalidates. */
  private val countCache = new java.util.concurrent.ConcurrentHashMap[(String, String), java.lang.Long]()

  def cachedCount(spark: SparkSession, dir: String, name: String): Long =
    countCache.computeIfAbsent((dir, name), _ => apply(spark, dir, name).count()).longValue()
}
