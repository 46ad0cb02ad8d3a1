package graft.text

import graft.SparkSpec

/** Golden-block tests for the mincer state machine (reference semantics:
  * ExtensionCrawler/js_mincer.py:131-226; fixture spec FIXTURES.md §6). */
class MincerSpec extends SparkSpec {

  test("mincer splits code / line comments / block comments / strings") {
    val src = "var a = 1; // trailing note\n" +
      "/* block\n comment */ var b = 'str with \\' escape';\n" +
      "var c = \"double \\\" quoted\";"
    val blocks = Mincer.split(src)
    assert(blocks.map(_.kind) === Seq(
      "code", "line_comment", "code", "block_comment", "code", "string",
      "code", "string", "code"))
    assert(blocks(1).content === " trailing note")
    assert(blocks(3).content === " block\n comment ")
    assert(blocks(5).content === "str with \\' escape")
    assert(blocks(7).content === "double \\\" quoted")
  }

  test("mincer handles unterminated regions at EOF") {
    assert(Mincer.split("code // open comment").map(_.kind) === Seq("code", "line_comment"))
    assert(Mincer.split("x /* never closed").map(_.kind) === Seq("code", "block_comment"))
    assert(Mincer.split("y = 'open").map(_.kind) === Seq("code", "string"))
    assert(Mincer.split("") === Seq.empty)
  }

  test("normalize keeps only code lines, stripped, and counts LoC") {
    val src = "  var a = 1;  \n// gone\n\n  var b = 2;\n/* also\ngone */ var c = 3;"
    val (norm, loc) = Mincer.normalize(src)
    assert(norm === "var a = 1;\nvar b = 2;\nvar c = 3;")
    assert(loc === 3)
  }

  test("minceProfile + blocks run distributed over the documents table") {
    val prof = Mincer.minceProfile(spark, sf0001).collect()
    assert(prof.nonEmpty)
    assert(prof.forall(r => r.getLong(1) >= 1)) // every doc ≥1 block
    val blk = Mincer.blocks(spark, sf0001)
    assert(blk.count() >= prof.length)
  }

  test("gate source: hand-traced block trace matches the documented closed form") {
    // the exact layout gateSource synthesizes for doc_id=42 (len(D)=2,
    // M=42 => len(M)=2), with known literal slices
    val l1 = "hello world"
    val l2 = "tail part"
    val src = s"// doc 42 header\nvar a = '\\'$l1';\n/* meta 42 */\n" +
      s"var b = \"x$l2\";\ncall(a, b); // trailer\n/* tail"
    val bs = Mincer.split(src)
    assert(bs.map(_.kind) === Seq(
      "line_comment", "code", "string", "code", "block_comment",
      "code", "string", "code", "line_comment", "code", "block_comment"))
    assert(bs.map(_.content.length) === Seq(
      12 + 2, 9, 2 + l1.length, 2, 7 + 2, 9, 1 + l2.length, 14, 8, 1, 5))
    // the escaped quote stays INSIDE the literal — mishandling it would
    // close the string early and shift every later block
    assert(bs(2).content === "\\'" + l1)
    assert(Mincer.normalize(src)._2 === 5)
  }

  test("mince gates match the closed form computed independently per doc") {
    import org.apache.spark.sql.functions._
    // closed-form inputs straight off the documents table (no Mincer code)
    val lens = graft.core.Tables.documents(spark, sf0001)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("t"))
      .collect()
      .map { r =>
        val cl = r.getString(1).toLowerCase.replaceAll("[^a-z ]", "")
        def slice(from: Int, len: Int) =
          cl.slice(from - 1, from - 1 + len).trim.length
        (r.getLong(0), (r.getLong(0).toString.length,
          (r.getLong(0) % 97).toString.length, slice(1, 24), slice(25, 16)))
      }.toMap
    val prof = Mincer.minceGate(spark, sf0001).collect()
    assert(prof.length === lens.size)
    prof.foreach { r =>
      val (ld, lm, l1, l2) = lens(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)) === ((11L, 5L, 2L, 4L, 5L)))
      assert(r.getLong(6) === 35L)
      assert(r.getLong(7) === 3L + l1 + l2)
      assert(r.getLong(8) === 32L + ld + lm)
    }
    val blk = Mincer.minceBlocksGate(spark, sf0001)
    assert(blk.count() === lens.size * 11L)
    // spot-check the trace rows of one doc
    val one = blk.filter(col("doc_id") === prof.head.getLong(0))
      .orderBy("block_idx").collect()
    assert(one.map(_.getString(2)).toSeq === Seq(
      "line_comment", "code", "string", "code", "block_comment",
      "code", "string", "code", "line_comment", "code", "block_comment"))
  }
}
