package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** String-literal line extraction — the `crx-jsstrings` tool.
  *
  * The reference walks dated archive entries through fnmatch file filters
  * (crx-jsstrings:57-63), minces each file into code/comment blocks whose
  * code blocks carry their string literals with (line, col) positions
  * (js_mincer.py:140-226), and emits literal lines in two modes
  * (crx-jsstrings:200-232, print :122-140):
  *  - verbatim: one line per matching literal, positioned `(line/col)`;
  *  - joined: ALL literals of a code block concatenated in order into one
  *    string, the regexes searched against the JOIN (evidence that survives
  *    string-splitting obfuscation), one line per matching block positioned
  *    `(start - end)`.
  * The joined-string lines feed library detection as literal evidence.
  *
  * Spark-first: the scanner is a pure function `String => Seq[CodeUnit]`
  * applied as a typed flatMap (no shuffle; documents are independent), the
  * fnmatch filter is a codegen'd rlike over the translated glob, and the
  * regex match runs on the exploded literal rows. */
object JsStrings {

  final case class Literal(line: Int, colPos: Int, text: String)
  final case class CodeUnit(startLine: Int, endLine: Int, literals: Seq[Literal])

  /** Scan source into code units — maximal runs of non-comment content —
    * each carrying its string literals. Mirrors the js_mincer state machine
    * (js_mincer.py:131-226): slash-slash to EOL, slash-star to star-slash,
    * quotes with backslash escapes, unterminated regions close at EOF. A literal's
    * (line, colPos) is the 1-based position of its OPENING quote; a unit's
    * (startLine, endLine) range brackets its CONTENT: startLine is the
    * line of the first content or literal character (leading whitespace
    * opens nothing) and endLine the last line that contributed content or
    * literals (a trailing newline before the close does not extend the
    * range). Units
    * that contain only whitespace and no literals are dropped (the
    * reference prints only matching blocks, so pure-layout units never
    * surface). */
  def codeUnits(src: String): Seq[CodeUnit] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[CodeUnit]
    val lits = scala.collection.mutable.ArrayBuffer.empty[Literal]
    val buf = new java.lang.StringBuilder
    var unitStart = -1 // -1 = no unit open
    var sawContent = false
    var line = 1; var colPos = 1
    var contentLine = 1 // last line that contributed content or literal chars
    var litLine = 0; var litCol = 0
    var i = 0
    val n = src.length
    val Code = 0; val LineC = 1; val BlockC = 2; val SQ = 3; val DQ = 4
    var state = Code

    def advance(c: Char): Unit =
      if (c == '\n') { line += 1; colPos = 1 } else colPos += 1

    def openUnit(): Unit = if (unitStart < 0) { unitStart = line; sawContent = false }

    // endLine = the last line that contributed content or literals, NOT the
    // line the scanner is on at close: a unit closed at EOF after a trailing
    // newline would otherwise report endLine one past its last content line
    // (ADVICE r4)
    def closeUnit(): Unit = {
      if (unitStart >= 0 && (sawContent || lits.nonEmpty))
        out += CodeUnit(unitStart, math.max(unitStart, contentLine), lits.toSeq)
      unitStart = -1
      lits.clear()
    }

    while (i < n) {
      val c = src.charAt(i)
      val c1 = if (i + 1 < n) src.charAt(i + 1) else ' '
      state match {
        case Code =>
          if (c == '/' && c1 == '/') { closeUnit(); state = LineC; advance(c); advance(c1); i += 2 }
          else if (c == '/' && c1 == '*') { closeUnit(); state = BlockC; advance(c); advance(c1); i += 2 }
          else if (c == '\'' || c == '"') {
            openUnit(); litLine = line; litCol = colPos; contentLine = line
            state = if (c == '\'') SQ else DQ; advance(c); i += 1
          } else {
            // whitespace between units does not OPEN one: a unit's
            // startLine is the line of its first content or literal
            // character (symmetric with the endLine rule above), so the
            // (start - end) range brackets what a grep actually reports —
            // the newline left behind by a same-line `*/` must not pin the
            // next unit to the comment's line
            if (!c.isWhitespace) { openUnit(); sawContent = true; contentLine = line }
            advance(c); i += 1
          }
        case LineC =>
          if (c == '\n') state = Code
          advance(c); i += 1
        case BlockC =>
          if (c == '*' && c1 == '/') { state = Code; advance(c); advance(c1); i += 2 }
          else { advance(c); i += 1 }
        case SQ | DQ =>
          contentLine = line
          if (c == '\\' && i + 1 < n) { buf.append(c).append(c1); advance(c); advance(c1); i += 2 }
          else if ((state == SQ && c == '\'') || (state == DQ && c == '"')) {
            lits += Literal(litLine, litCol, buf.toString); buf.setLength(0)
            state = Code; advance(c); i += 1
          } else { buf.append(c); advance(c); i += 1 }
      }
    }
    if (state == SQ || state == DQ) { lits += Literal(litLine, litCol, buf.toString) }
    closeUnit()
    out.toSeq
  }

  /** fnmatch glob → anchored Java regex (`*` any run, `?` one char,
    * `[seq]` kept as a class; everything else literal) — the reference's
    * `fnmatch.fnmatch(path, pattern)` file filter (crx-jsstrings:57-63). */
  def fnmatchToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) {
      glob.charAt(i) match {
        case '*' => sb.append(".*")
        case '?' => sb.append(".")
        case '[' =>
          // fnmatch semantics: a ']' in first position (after an optional
          // '!') is a literal member, so the class scan starts PAST it —
          // '[]a]' is the class {']','a'}, not an empty class (which would
          // be an invalid Java regex throwing inside rlike at run time)
          var scanFrom = i + 1
          if (scanFrom < glob.length && glob.charAt(scanFrom) == '!') scanFrom += 1
          if (scanFrom < glob.length && glob.charAt(scanFrom) == ']') scanFrom += 1
          val j = glob.indexOf(']', scanFrom)
          if (j < 0) { sb.append("\\["); }
          else {
            val body = glob.substring(i + 1, j)
            val negated = body.startsWith("!")
            // escape regex-special members so a literal ']' (first-position
            // member) or '\' survives inside the Java character class
            val members = (if (negated) body.drop(1) else body)
              .flatMap(c => if (c == ']' || c == '\\' || c == '[' || c == '^') s"\\$c" else c.toString)
            sb.append("[").append(if (negated) "^" + members else members).append("]")
            i = j
          }
        case ch if "\\.^$+{}()|".indexOf(ch.toInt) >= 0 => sb.append("\\").append(ch)
        case ch => sb.append(ch)
      }
      i += 1
    }
    sb.toString
  }

  /** Deterministic JS-ish source per document (built only from `documents`
    * columns, the overviewHtml/reviewPayload synthesis convention): header
    * line comment, a single-quoted literal, a block comment, a double-
    * quoted literal, a trailer comment — so every state of the scanner and
    * both literal kinds have real work. */
  private def jsSource: Column = {
    val cleaned = regexp_replace(lower(col("text")), "[^a-z ]", "")
    concat(
      lit("// doc "), col("doc_id").cast("string"), lit(" header\n"),
      lit("var a = '"), trim(substring(cleaned, 1, 24)), lit("';\n"),
      lit("/* meta "), col("source"), lit(" */\n"),
      lit("var b = \""), trim(substring(cleaned, 25, 16)), lit("\";\n"),
      lit("call(a, b); // trailer\n"))
  }

  /** Per-document file path: mostly `.js`, every 9th `.css`, every 13th
    * `.json` — the fnmatch filter must have something to exclude. */
  private def docPath: Column =
    when(col("doc_id") % 13 === 0, concat(lit("data"), col("doc_id"), lit(".json")))
      .when(col("doc_id") % 9 === 0, concat(lit("style"), col("doc_id"), lit(".css")))
      .otherwise(concat(lit("file"), col("doc_id"), lit(".js")))

  private def sources(spark: SparkSession, dir: String,
                      filePattern: Option[String]): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), docPath.as("path"), jsSource.as("src"))
    filePattern.fold(base)(g => base.filter(col("path").rlike("^" + fnmatchToRegex(g) + "$")))
  }

  /** Joined-string lines (crx-jsstrings:202-214, print :131-135): one row
    * per code unit whose JOINED literals match `regex`, with the block's
    * (start - end) line range. */
  def joinedStringLines(spark: SparkSession, dir: String,
                        regex: String = "(spark|table|merge)",
                        filePattern: Option[String] = Some("*.js")): DataFrame = {
    import spark.implicits._
    val rx = regex
    sources(spark, dir, filePattern)
      .as[(Long, String, String)]
      .flatMap { case (id, path, src) =>
        codeUnits(src).map(u => (id, path, u.startLine, u.endLine,
          u.literals.map(_.text).mkString))
      }
      .toDF("doc_id", "path", "start_line", "end_line", "joined")
      .filter(col("joined").rlike(rx))
  }

  /** DuckDB replay of [[joinedStringLines]] with the default regex and
    * `*.js` filter — the closed form the synthesized sources embed: the
    * scanner must emit exactly two literal-bearing units per `.js` doc,
    * the single-quoted literal on line 2 (unit range 2-2: the unit closes
    * at the line-3 block comment, and endLine is the last CONTENT line)
    * and the double-quoted literal whose unit spans lines 4-5 (the
    * `call(a, b); ` code on line 5 extends the unit; the trailing `//`
    * comment closes it). The literal texts replay as the same
    * clean/substr/trim pipeline the synthesis applied, so the CORRECTNESS
    * row gates scanner positions AND extraction end to end. */
  def joinedStringLinesOracleSql(regex: String = "(spark|table|merge)"): String =
    s"""WITH c AS (SELECT doc_id,
       |  CASE WHEN doc_id % 13 = 0 THEN 'data' || CAST(doc_id AS VARCHAR) || '.json'
       |       WHEN doc_id % 9 = 0 THEN 'style' || CAST(doc_id AS VARCHAR) || '.css'
       |       ELSE 'file' || CAST(doc_id AS VARCHAR) || '.js' END AS path,
       |  regexp_replace(lower(text), '[^a-z ]', '', 'g') AS cl
       |  FROM documents),
       |u AS (
       |  SELECT doc_id, path, 2 AS start_line, 2 AS end_line,
       |    trim(substr(cl, 1, 24)) AS joined FROM c
       |  UNION ALL
       |  SELECT doc_id, path, 4, 5, trim(substr(cl, 25, 16)) FROM c)
       |SELECT doc_id, path, start_line, end_line, joined
       |FROM u WHERE path LIKE '%.js' AND regexp_matches(joined, '$regex')""".stripMargin

  /** Verbatim literal lines (crx-jsstrings:216-230, print :136-140): one
    * row per individual literal matching `regex`, with its (line, col). */
  def verbatimStringLines(spark: SparkSession, dir: String,
                          regex: String = "(spark|table|merge)",
                          filePattern: Option[String] = Some("*.js")): DataFrame = {
    import spark.implicits._
    val rx = regex
    sources(spark, dir, filePattern)
      .as[(Long, String, String)]
      .flatMap { case (id, path, src) =>
        for {
          u <- codeUnits(src)
          l <- u.literals
        } yield (id, path, l.line, l.colPos, l.text)
      }
      .toDF("doc_id", "path", "line", "col_pos", "literal")
      .filter(col("literal").rlike(rx))
  }

  /** Literal-evidence tier for library detection: joined-string matches of
    * the q63 rule set, graded `detect_method='string_literal'`, anti-joined
    * behind the hash and regex tiers (per-file precedence exactly as in
    * libraryDetectRegexTier — a stronger tier ends detection). */
  def libdetWithLiteralTier(spark: SparkSession, dir: String): DataFrame = {
    val prior = graft.sim.Dedup.libraryDetectRegexTier(spark, dir)
    val rules = Seq("sparkkit" -> "\\bspark\\b", "windowlib" -> "\\bwindow\\b")
    val joined = joinedStringLines(spark, dir, regex = ".*", filePattern = Some("*.js"))
    val ruleStructs = rules.map { case (lib, rx) =>
      struct(lit(lib).as("lib"), col("joined").rlike(rx).as("hit"))
    }
    val litHits = joined
      .select(col("doc_id"), explode(array(ruleStructs: _*)).as("r"))
      .filter(col("r.hit"))
      .select(col("doc_id"), col("r.lib").as("lib"),
        lit("string_literal").as("detect_method"))
      .distinct()
    prior.unionByName(
      litHits.join(prior.select("doc_id").distinct(), Seq("doc_id"), "left_anti"))
  }
}
