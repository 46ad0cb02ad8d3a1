package graft.fetch

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Ids, ScheduledFetch}
import graft.scheduler.Politeness

/** S6 — reviews/support paged fetch + reply-author batch
  * (archive.py:372-465, payload templates config.py:76-114).
  *
  * The reference fetches each extension's review and support forums as two
  * paged POSTs (ranges 0-100 and 100-200, archive.py:381-385,417-421), then
  * extracts the authors whose entries carry `replyExists` and fetches all
  * their replies in ONE batched search request (archive.py:372-379,446-465).
  * Responses are Google anti-XSSI padded JSON — a junk prefix before the
  * first `{"`, stripped with a find-then-slice (`content[find('{"'):]`,
  * db.py:300-304's raw_decode idiom).
  *
  * Spark shape: the page fan-out is a typed flatMap (each id → 2 rows per
  * forum kind), the reply batch is a groupBy over the exploded annotations
  * (authors-with-reply per id) → one batch row per id — no driver loops, no
  * per-item state. Payloads are deterministic functions of (id, runId) like
  * every other synthetic fetch in this sandbox.
  */
object Reviews {

  /** One fetched page payload. `kind` ∈ review | support | reply. */
  final case class PagePayload(id: String, kind: String, page: Int, payload: String)

  val PageSize = 100 // the reference's range step (archive.py:381-385)
  val Pages = 2      // ranges 0-100 and 100-200

  private val languages = Array("en", "de", "es", "fr")

  private[fetch] def reviewCount(id: String, runId: Int, kind: String, page: Int): Int = {
    val h = Ids.mix64(Politeness.strHash64(id, 31L * runId + page) ^ kind.hashCode.toLong)
    // page 0 has 0-3 entries, page 1 is sparser (0-1) — long-tail forums
    if (page == 0) Math.floorMod(h, 4L).toInt else Math.floorMod(h, 2L).toInt
  }

  private def annotationJson(id: String, runId: Int, kind: String, page: Int, j: Int): String = {
    val h = Ids.mix64(Politeness.strHash64(id, 17L * runId + j) ^ kind.hashCode.toLong ^ page.toLong)
    val author = "author-" + Math.floorMod(h, 50L)
    val lang = languages(Math.floorMod(h >>> 8, languages.length.toLong).toInt)
    val rating = 1 + Math.floorMod(h >>> 16, 5L).toInt
    val replyExists = Math.floorMod(h >>> 24, 5L) == 0L
    val comment = f"$kind comment ${Math.floorMod(h >>> 32, 4096L)}%04d"
    s"""{"author":"$author","displayName":"User ${Math.floorMod(h, 50L)}","language":"$lang",""" +
      s""""rating":$rating,"replyExists":$replyExists,"comment":"$comment"}"""
  }

  /** The padded two-page POST response for (id, kind, page) — anti-XSSI junk
    * prefix + JSON body (db.py:300-304 strips it with find('{"')). */
  def pagePayload(id: String, runId: Int, kind: String, page: Int): String = {
    val n = reviewCount(id, runId, kind, page)
    val anns = (0 until n).map(j => annotationJson(id, runId, kind, page, j))
    ")]}'\n" + s"""{"annotations":[${anns.mkString(",")}],"numAnnotations":$n}"""
  }

  /** Paged fetch stage: every scheduled id fans out into 2 review + 2
    * support page rows (the four sub-fetches of a nightly crawl item,
    * archive.py:498-507, minus overview/crx handled by [[Fetcher]]). */
  def fetchPages(spark: SparkSession, schedule: Dataset[ScheduledFetch], runId: Int): Dataset[PagePayload] = {
    import spark.implicits._
    schedule.flatMap { s =>
      for {
        kind <- Seq("review", "support")
        page <- 0 until Pages
      } yield PagePayload(s.id, kind, page, pagePayload(s.id, runId, kind, page))
    }
  }

  /** Annotation schema inside a page payload (db.py:306-329's fields). */
  val annotationSchema = "STRUCT<annotations: ARRAY<STRUCT<author: STRING, displayName: STRING, " +
    "language: STRING, rating: INT, replyExists: BOOLEAN, comment: STRING>>, numAnnotations: INT>"

  /** Strip the anti-XSSI padding and explode annotations into child rows —
    * the review/support table ETL (db.py:300-329): one row per (id, kind,
    * author, comment), commentmd5 content hash, deduped like the reference's
    * md5-PK comment tables (review.sql:23-35, review_comment.sql:23-28). */
  def explodeAnnotations(pages: Dataset[PagePayload]): DataFrame = {
    val body = expr("substring(payload, instr(payload, '{\"'))")
    pages.toDF()
      .withColumn("ann", explode(from_json(body, lit(annotationSchema)).getField("annotations")))
      .select(col("id"), col("kind"), col("page"),
        col("ann.author").as("author"),
        col("ann.displayName").as("displayname"),
        col("ann.language").as("language"),
        col("ann.rating").as("rating"),
        col("ann.replyExists").as("reply_exists"),
        col("ann.comment").as("comment"))
      .withColumn("commentmd5", md5(col("comment")))
      .dropDuplicates("id", "kind", "author", "commentmd5")
  }

  /** Reply-search batch: per id, ALL annotation authors with `replyExists`
    * ride in one batched request (archive.py:372-379 extraction +
    * 446-465 batch POST). Returns one batch row per id that has any. */
  def replyBatches(spark: SparkSession, annotations: DataFrame, runId: Int): Dataset[PagePayload] = {
    import spark.implicits._
    annotations
      .filter(col("reply_exists"))
      .groupBy("id").agg(sort_array(collect_set(col("author"))).as("authors"))
      .select(col("id"), col("authors"))
      .as[(String, Seq[String])]
      .map { case (id, authors) =>
        val replies = authors.zipWithIndex.map { case (a, i) =>
          val h = Ids.mix64(Politeness.strHash64(id, 71L * runId + i))
          s"""{"author":"$a","replyto":"$a","comment":"reply ${Math.floorMod(h, 4096L)}","language":"en"}"""
        }
        PagePayload(id, "reply", 0, ")]}'\n" + s"""{"annotations":[${replies.mkString(",")}]}""")
      }
  }

  /** Reply child-table explode (reply.sql:23-35 shape). */
  def explodeReplies(batches: Dataset[PagePayload]): DataFrame = {
    val schema = "STRUCT<annotations: ARRAY<STRUCT<author: STRING, replyto: STRING, " +
      "comment: STRING, language: STRING>>>"
    val body = expr("substring(payload, instr(payload, '{\"'))")
    batches.toDF()
      .withColumn("ann", explode(from_json(body, lit(schema)).getField("annotations")))
      .select(col("id"), col("ann.author").as("author"), col("ann.replyto").as("replyto"),
        col("ann.comment").as("comment"), col("ann.language").as("language"))
      .withColumn("commentmd5", md5(col("comment")))
  }
}
