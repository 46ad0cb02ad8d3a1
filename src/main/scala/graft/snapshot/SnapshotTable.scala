package graft.snapshot

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Iceberg-shaped snapshot table layer (SURVEY.md §7.0/§7.1 step 3).
  *
  * No Iceberg runtime resolves offline, so snapshot semantics are built by
  * hand on Parquet + a versioned JSON manifest with an atomic rename commit:
  *  - every commit writes data files under `data/v{N}/` then publishes
  *    `manifests/v{N}.json` (tmp + ATOMIC_MOVE) naming its data directory,
  *    parent version, row count, and a metrics map (per-partition lineage);
  *  - readers resolve HEAD = max published manifest → uncommitted/partial
  *    data directories are invisible (crash safety);
  *  - time travel = read any older manifest; resume-from-checkpoint = open
  *    latest (north rule resumability).
  *
  * This mirrors the reference's append-only archive discipline: the tar
  * append is atomic per id (archive.py:532-538) and the DB re-derivable from
  * the archive (database/README.md:63-69); here the manifest commit is the
  * atomicity point and every snapshot is re-derivable from its lineage.
  */
final class SnapshotTable(spark: SparkSession, baseDir: String) {
  private val base = Paths.get(baseDir)
  private val manifests = base.resolve("manifests")
  Files.createDirectories(manifests)

  private def manifestPath(v: Int): Path = manifests.resolve(f"v$v%06d.json")

  def versions: Seq[Int] =
    if (!Files.isDirectory(manifests)) Nil
    else Files.list(manifests).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{6}\\.json") => s.substring(1, 7).toInt }
      .toSeq.sorted

  def currentVersion: Option[Int] = versions.lastOption

  /** Append a new snapshot; returns the committed version. Partition columns
    * (e.g. prefix shard + run date, config.py:117-119) flow into the parquet
    * layout so partition pruning works on read. */
  def commit(df: DataFrame, partitionBy: Seq[String] = Nil,
             metrics: Map[String, String] = Map.empty): Int = {
    val v = currentVersion.getOrElse(0) + 1
    val dataDir = base.resolve(f"data/v$v%06d")
    // row count rides on the write itself via an Observation — a second full
    // scan of freshly committed data would double the commit path's I/O
    // (at archive scale, 2× the write volume read back per commit)
    val obs = org.apache.spark.sql.Observation(s"graft_commit_${System.nanoTime()}")
    val observed = df.observe(obs,
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("rows"))
    val writer = observed.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataDir.toString)
    val rowCount = obs.get("rows").asInstanceOf[Long]
    val json = {
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      val m = metrics.map { case (k, w) => s""""${esc(k)}":"${esc(w)}"""" }.mkString(",")
      s"""{"version":$v,"parent":${currentVersion.getOrElse(0)},"dataDir":"${esc(dataDir.toString)}",
         |"rowCount":$rowCount,"partitionBy":[${partitionBy.map(p => s""""${esc(p)}"""").mkString(",")}],
         |"metrics":{$m}}""".stripMargin
    }
    // atomic publish: tmp file + ATOMIC_MOVE rename
    val tmp = manifests.resolve(s".tmp-$v-${System.nanoTime()}")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, manifestPath(v), StandardCopyOption.ATOMIC_MOVE)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new IllegalStateException(s"concurrent commit for v$v")
    }
    v
  }

  private def dataDirOf(v: Int): String = {
    val json = new String(Files.readAllBytes(manifestPath(v)), StandardCharsets.UTF_8)
    val m = """"dataDir":"(.*?)"""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalStateException(s"bad manifest v$v"))
    m.group(1).replace("\\\\", "\\").replace("\\\"", "\"")
  }

  /** Read a snapshot (latest by default; any version for time travel). */
  def read(version: Option[Int] = None): DataFrame = {
    val v = version.orElse(currentVersion)
      .getOrElse(throw new IllegalStateException(s"no snapshots in $baseDir"))
    spark.read.parquet(dataDirOf(v))
  }

  def metricsOf(v: Int): Map[String, String] = {
    val json = new String(Files.readAllBytes(manifestPath(v)), StandardCharsets.UTF_8)
    """"metrics":\{(.*?)\}""".r.findFirstMatchIn(json).map(_.group(1)) match {
      case Some(body) if body.nonEmpty =>
        """"(.*?)":"(.*?)"""".r.findAllMatchIn(body).map(m => m.group(1) -> m.group(2)).toMap
      case _ => Map.empty
    }
  }
}
