package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}

import graft.core.Tables

/** The reference's `grep-unused-permissions` evidence map
  * (PermissionAnalysis/grep-unused-permissions:68-150) as one composed
  * query: per (extension, crawl date),
  *
  *  1. the crx's JS members are MINCED into blocks (the reference pipes
  *     every member through `mince_js` and greps each block's content
  *     lines, :108-116 — comment blocks included, faithfully: the mince
  *     splits the file into line-respecting blocks, it does not exclude
  *     comments there);
  *  2. each permission's evidence literals are substring-matched against
  *     those block lines (`if evidence in line`, :114) → FOUND per
  *     (date, permission);
  *  3. `manifest.json`'s `permissions` array marks the permission
  *     REQUESTED (:119-133);
  *  4. the (requested × found) contingency folds to the reference's four
  *     class labels per (extid, date, permission) (:137-147):
  *     REQ_AND_FOUND / REQ_AND_NOT_FOUND / NOT_REQ_AND_FOUND /
  *     NOT_REQ_AND_NOT_FOUND.
  *
  * Members are synthesized deterministically from `documents` (the
  * overviewHtml/reviewPayload convention): two crawl dates per extension
  * (the grepArchive date scheme), JS bodies that place each evidence
  * string in code, in a comment, or nowhere by residue, and a manifest
  * whose permission list follows its own residue — so the DuckDB oracle
  * replays the embedded closed form while the Spark side runs the REAL
  * mince + substring-grep + JSON-parse pipeline. */
object PermissionGrep {

  /** permission → evidence literals, sorted by permission like the
    * reference's `sorted(permission_map.keys())` (:136). The reference
    * loads this from its MAP_FILE argument; a representative Chrome-API
    * map is inlined here. */
  val PermissionMap: Seq[(String, Seq[String])] = Seq(
    "cookies" -> Seq("chrome.cookies"),
    "storage" -> Seq("chrome.storage", "localStorage"),
    "tabs" -> Seq("chrome.tabs"))

  private val ClassLabels =
    Seq("REQ_AND_FOUND", "REQ_AND_NOT_FOUND", "NOT_REQ_AND_FOUND", "NOT_REQ_AND_NOT_FOUND")

  /** The two-crawl archive spine: (doc_id, crawl_date, rev) — the
    * grepArchive date scheme (first crawl on day doc_id%14+1, second on
    * +15). */
  private def crawlSpine(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"))
      .withColumn("rev", explode(array(lit(0), lit(1))))
      .withColumn("crawl_date",
        concat(lit("2024-01-"),
          lpad(((col("doc_id") % 14) + 1 + col("rev") * 14).cast("string"), 2, "0")))

  /** Synthesized JS member per (doc, rev): for permission index p with
    * residue r = (doc_id + 7p + rev) % 3 the evidence appears in CODE
    * (r=0), in a COMMENT (r=1 — still found, the reference greps comment
    * blocks too), or NOWHERE (r=2). A decoy literal carries a quoted
    * non-evidence string so the mince has every block kind to chew on. */
  private def jsMember: org.apache.spark.sql.Column = {
    val parts = PermissionMap.zipWithIndex.flatMap { case ((_, evidences), p) =>
      val ev = evidences.head
      // the rev coefficient must NOT be ≡ 0 (mod 3), or placement never
      // varies between the two crawl dates and the cross-crawl dimension of
      // the evidence map goes dead
      val r = (col("doc_id") + lit(7 * p) + col("rev")) % 3
      Seq(
        when(r === 0, concat(lit(s"var u$p = $ev.get;\n"))).otherwise(lit("")),
        when(r === 1, concat(lit(s"// note: $ev used below\n"))).otherwise(lit("")))
    }
    concat(
      lit("// generated module\n"),
      concat(parts: _*),
      lit("var s = 'decoy literal';\n/* trailer */\n"))
  }

  /** Synthesized manifest per doc: permission p requested iff
    * (doc_id + p) % 2 == 0 — rendered as real JSON and parsed back with
    * from_json (the reference's json.loads(jsmin(manifest)), :130). */
  private def manifestMember: org.apache.spark.sql.Column = {
    val perms = PermissionMap.zipWithIndex.map { case ((name, _), p) =>
      when((col("doc_id") + lit(p)) % 2 === 0, lit("\"" + name + "\"")).otherwise(lit(null))
    }
    concat(lit("{\"name\": \"ext \", \"permissions\": ["),
      concat_ws(",", perms: _*), lit("]}"))
  }

  /** The composed evidence-map query (q81): one row per (extid,
    * crawl_date, permission) carrying the reference's class label. */
  def unusedPermissions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spine = crawlSpine(spark, dir)

    // FOUND: mince the JS member, grep every block's lines for each
    // permission's evidence literals (reference :108-116)
    val evMap = PermissionMap
    val found = spine.select(col("doc_id"), col("crawl_date"), jsMember.as("js"))
      .as[(Long, String, String)]
      .flatMap { case (docId, date, js) =>
        val lines = Mincer.split(js).flatMap(_.content.split("\n", -1))
        evMap.map { case (perm, evidences) =>
          (docId, date, perm,
            evidences.exists(ev => lines.exists(_.contains(ev))))
        }
      }
      .toDF("extid", "crawl_date", "permission", "found")

    // REQUESTED: parse the manifest member's permissions array
    val manifestSchema = StructType(Seq(
      StructField("name", StringType),
      StructField("permissions", ArrayType(StringType))))
    val requested = spine.filter(col("rev") === 0)
      .select(col("doc_id").as("extid"),
        from_json(manifestMember, manifestSchema).getField("permissions").as("perms"))
      .select(col("extid"), explode(lit(PermissionMap.map(_._1).toArray)).as("permission"),
        col("perms"))
      .select(col("extid"), col("permission"),
        array_contains(col("perms"), col("permission")).as("req"))

    found.join(requested, Seq("extid", "permission"))
      .select(col("extid"), col("crawl_date"), col("permission"),
        when(col("req") && col("found"), ClassLabels(0))
          .when(col("req") && !col("found"), ClassLabels(1))
          .when(!col("req") && col("found"), ClassLabels(2))
          .otherwise(ClassLabels(3)).as("cls"))
  }

  /** DuckDB replay — the closed form the synthesis embeds: found ⟺
    * residue ≤ 1 (code or comment placement, both greppable), requested ⟺
    * the manifest residue. */
  def unusedPermissionsOracleSql: String =
    """WITH spine AS (
      |  SELECT doc_id, 0 AS rev,
      |    '2024-01-' || lpad(CAST(doc_id % 14 + 1 AS VARCHAR), 2, '0') AS crawl_date
      |  FROM documents
      |  UNION ALL
      |  SELECT doc_id, 1,
      |    '2024-01-' || lpad(CAST(doc_id % 14 + 15 AS VARCHAR), 2, '0')
      |  FROM documents),
      |p(permission, pidx) AS (VALUES ('cookies', 0), ('storage', 1), ('tabs', 2)),
      |m AS (SELECT doc_id AS extid, crawl_date, permission,
      |  (doc_id + pidx) % 2 = 0 AS req,
      |  (doc_id + 7 * pidx + rev) % 3 <= 1 AS found
      |  FROM spine, p)
      |SELECT extid, crawl_date, permission,
      |  CASE WHEN req AND found THEN 'REQ_AND_FOUND'
      |       WHEN req AND NOT found THEN 'REQ_AND_NOT_FOUND'
      |       WHEN NOT req AND found THEN 'NOT_REQ_AND_FOUND'
      |       ELSE 'NOT_REQ_AND_NOT_FOUND' END AS cls
      |FROM m""".stripMargin
}
