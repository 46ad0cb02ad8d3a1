package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.JsStrings.{CodeUnit, Literal}

/** crx-jsstrings semantics: hand-traced goldens for the literal scanner,
  * fnmatch translation, joined-vs-verbatim modes, and the literal evidence
  * tier routing (crx-jsstrings:38-63, 200-232; js_mincer.py:131-226). */
class JsStringsSpec extends SparkSpec {

  test("scanner golden: units, positions, literals (hand-traced)") {
    val src = "x = 'ab';\n// c\ny = \"cd\" + 'ef';\n/* z */ w = 'gh';"
    val got = JsStrings.codeUnits(src)
    // endLine = last line with content, not the line the closing comment
    // delimiter sits on (ADVICE r4: the scanner had already advanced past
    // the unit's trailing newline when the comment closed it)
    assert(got === Seq(
      CodeUnit(1, 1, Seq(Literal(1, 5, "ab"))),
      CodeUnit(3, 3, Seq(Literal(3, 5, "cd"), Literal(3, 12, "ef"))),
      CodeUnit(4, 4, Seq(Literal(4, 13, "gh")))))
  }

  test("endLine at EOF after a trailing newline is the last content line (ADVICE r4)") {
    assert(JsStrings.codeUnits("call(a);\n") === Seq(CodeUnit(1, 1, Nil)))
    assert(JsStrings.codeUnits("call(a);\nmore(b);\n\n") === Seq(CodeUnit(1, 2, Nil)))
    // a literal on the last line extends the range to it
    assert(JsStrings.codeUnits("f();\ns = 'x';\n") ===
      Seq(CodeUnit(1, 2, Seq(Literal(2, 5, "x")))))
  }

  test("scanner: backslash escapes stay inside the literal; EOF closes open regions") {
    val esc = JsStrings.codeUnits("s = 'a\\'b';")
    assert(esc === Seq(CodeUnit(1, 1, Seq(Literal(1, 5, "a\\'b")))))
    val open = JsStrings.codeUnits("q = 'open")
    assert(open === Seq(CodeUnit(1, 1, Seq(Literal(1, 5, "open")))))
    // layout-only units between comments are dropped
    assert(JsStrings.codeUnits("/* x */\n\n// y\n").isEmpty)
  }

  test("joined mode concatenates a block's literals IN ORDER (crx-jsstrings:202-206)") {
    val src = "a('pre', 'fix'); // split literal evidence\nb('unrelated');"
    val units = JsStrings.codeUnits(src)
    assert(units.head.literals.map(_.text) === Seq("pre", "fix"))
    assert(units.head.literals.map(_.text).mkString === "prefix")
    // the match only exists on the JOIN — neither literal alone matches
    assert(!units.head.literals.exists(_.text.matches(".*prefix.*")))
  }

  test("fnmatch translation: *, ?, [seq], literal dots") {
    def m(glob: String, s: String) = s.matches("^" + JsStrings.fnmatchToRegex(glob) + "$")
    assert(m("*.js", "file12.js"))
    assert(!m("*.js", "file12.json"))
    assert(m("file?.js", "file1.js"))
    assert(!m("file?.js", "file12.js"))
    assert(m("[fg]ile*.js", "file2.js"))
    assert(!m("[!f]ile*.js", "file2.js"))
  }

  test("fnmatch degenerate classes: ']' in first position is a literal member (ADVICE r4)") {
    def m(glob: String, s: String) = s.matches("^" + JsStrings.fnmatchToRegex(glob) + "$")
    assert(m("[]a]", "]") && m("[]a]", "a") && !m("[]a]", "b")) // was an invalid empty class
    assert(m("[!]a]", "b") && !m("[!]a]", "]") && !m("[!]a]", "a"))
    assert(m("[]", "[]")) // unterminated → both chars literal, like fnmatch
    // none of these may throw PatternSyntaxException at compile time
    Seq("[]a]", "[!]a]", "[]", "[", "[a-z]x").foreach(g =>
      java.util.regex.Pattern.compile(JsStrings.fnmatchToRegex(g)))
  }

  test("joined lines over the corpus: *.js filter excludes css/json docs; ranges are sane") {
    val df = JsStrings.joinedStringLines(spark, sf0001, regex = ".*")
    val paths = df.select("path").distinct().collect().map(_.getString(0))
    assert(paths.nonEmpty && paths.forall(_.endsWith(".js")))
    // synthetic source: the quoted literals sit on lines 2 and 4
    val ranges = df.select("start_line", "end_line").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(ranges.forall { case (s, e) => s >= 2 && e >= s && e <= 5 })
    // every doc contributes exactly 2 literal-bearing units (lines 2 and 4)
    val perDoc = df.groupBy("doc_id").count().select("count").distinct().collect()
    assert(perDoc.map(_.getLong(0)).toSeq === Seq(2L))
  }

  test("verbatim mode positions individual literals; joined mode is per block") {
    val v = JsStrings.verbatimStringLines(spark, sf0001, regex = ".*")
    val j = JsStrings.joinedStringLines(spark, sf0001, regex = ".*")
    assert(v.count() === j.count()) // synthetic blocks hold one literal each
    // `var a = '…` / `var b = "…` — the opening quote sits at column 9
    assert(v.select("col_pos").distinct().collect().map(_.getInt(0)).toSet === Set(9))
  }

  test("literal evidence routes behind hash/regex tiers with per-file precedence") {
    val all = JsStrings.libdetWithLiteralTier(spark, sf0001)
    val byMethod = all.groupBy("detect_method").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMethod.contains("md5") || byMethod.contains("regex"))
    // a doc detected by a stronger tier never re-appears as string_literal
    val litDocs = all.filter(col("detect_method") === "string_literal")
      .select("doc_id").distinct()
    val priorDocs = all.filter(col("detect_method") =!= "string_literal")
      .select("doc_id").distinct()
    assert(litDocs.join(priorDocs, Seq("doc_id")).count() === 0)
  }
}
