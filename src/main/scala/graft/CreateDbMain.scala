package graft

import org.apache.spark.sql.SparkSession

import graft.etl.CreateDb
import graft.snapshot.SnapshotTable

/** The `create-db` entry point: rebuild the relational store from the
  * committed golden archive in one job (create-db:57-87,147-152).
  *
  * Usage: runMain graft.CreateDbMain <sfDir> <workDir> [fromDate] [untilDate]
  *
  * Commits the synthetic archive as a crawl_date-partitioned snapshot table
  * (so the date window prunes partitions), reads it BACK through the
  * snapshot layer (the rebuild must start from the committed archive, not
  * the in-memory frame — the whole point of the invariant), rebuilds the
  * four child tables in one pass, and MERGE-commits each under
  * `<workDir>/db`. Prints one summary line per table. */
object CreateDbMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val workDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_createdb").toString
    val from = if (args.length > 2) args(2) else "2024-01-05"
    val until = if (args.length > 3) args(3) else "2024-01-20"

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft-create-db")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val archive = new SnapshotTable(spark, s"$workDir/archive")
      archive.commit(CreateDb.archiveRows(spark, sfDir), partitionBy = Seq("crawl_date"))
      val tables = CreateDb.rebuild(
        CreateDb.slice(archive.read(), from, until))
      val versions = CreateDb.commitAll(spark, s"$workDir/db", tables)
      Seq("overview" -> tables.overview, "tokens" -> tables.tokens,
        "annotations" -> tables.annotations, "comments" -> tables.comments)
        .foreach { case (name, df) =>
          // scalastyle:off println
          println(s"[create-db] $name: rows=${df.count()} v=${versions(name)}")
          // scalastyle:on println
        }
    } finally spark.stop()
  }
}
