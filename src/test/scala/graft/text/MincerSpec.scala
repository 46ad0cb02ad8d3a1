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
}
