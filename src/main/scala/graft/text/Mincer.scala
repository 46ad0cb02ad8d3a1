package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Code/comment/string-literal block splitter — the reference's "mincer"
  * (reference: ExtensionCrawler/js_mincer.py:131-226), a character state
  * machine that partitions source text into CODE / LINE-COMMENT /
  * BLOCK-COMMENT / STRING-LITERAL blocks; plus the normalizer that keeps only
  * code blocks, strips whitespace per line and counts LoC
  * (file_identifiers.py:41-51 normalize-then-hash discipline).
  *
  * Spark-first shape: the splitter is a pure function String => Seq[Block]
  * used as a typed `flatMap` (SURVEY §2.10 "Generator or typed flatMap") —
  * it is inherently sequential per document, but documents are independent,
  * so it parallelizes perfectly across the corpus with no shuffle at all.
  */
object Mincer {

  final case class Block(kind: String, content: String)

  // state machine states
  private final val Code = 0
  private final val LineComment = 1
  private final val BlockComment = 2
  private final val SingleQuote = 3
  private final val DoubleQuote = 4

  /** Split source text into typed blocks. Semantics mirrored from
    * js_mincer.py:131-226: slash-slash opens a line comment (to EOL),
    * slash-star a block comment (to the matching star-slash), quotes open
    * string literals with backslash escapes; everything else is code.
    * Unterminated regions close at EOF. */
  def split(src: String): Seq[Block] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Block]
    val buf = new java.lang.StringBuilder
    var state = Code
    var i = 0
    val n = src.length

    def flush(kind: String): Unit = {
      if (buf.length() > 0) { out += Block(kind, buf.toString); buf.setLength(0) }
    }

    while (i < n) {
      val c = src.charAt(i)
      val c1 = if (i + 1 < n) src.charAt(i + 1) else '\u0000'
      state match {
        case Code =>
          if (c == '/' && c1 == '/') { flush("code"); state = LineComment; i += 2 }
          else if (c == '/' && c1 == '*') { flush("code"); state = BlockComment; i += 2 }
          else if (c == '\'') { flush("code"); state = SingleQuote; i += 1 }
          else if (c == '"') { flush("code"); state = DoubleQuote; i += 1 }
          else { buf.append(c); i += 1 }
        case LineComment =>
          if (c == '\n') { flush("line_comment"); state = Code; buf.append(c); i += 1 }
          else { buf.append(c); i += 1 }
        case BlockComment =>
          if (c == '*' && c1 == '/') { flush("block_comment"); state = Code; i += 2 }
          else { buf.append(c); i += 1 }
        case SingleQuote =>
          if (c == '\\' && i + 1 < n) { buf.append(c).append(c1); i += 2 }
          else if (c == '\'') { flush("string"); state = Code; i += 1 }
          else { buf.append(c); i += 1 }
        case DoubleQuote =>
          if (c == '\\' && i + 1 < n) { buf.append(c).append(c1); i += 2 }
          else if (c == '"') { flush("string"); state = Code; i += 1 }
          else { buf.append(c); i += 1 }
      }
    }
    state match {
      case Code         => flush("code")
      case LineComment  => flush("line_comment")
      case BlockComment => flush("block_comment")
      case _            => flush("string")
    }
    out.toSeq
  }

  /** Normalized code view: code blocks only, lines stripped, blank lines
    * dropped; returns (normalized text, loc) — the reference's
    * normalize_jsdata (file_identifiers.py:41-51). */
  def normalize(src: String): (String, Int) = {
    val lines = split(src).iterator
      .filter(_.kind == "code")
      .flatMap(_.content.split("\n", -1))
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq
    (lines.mkString("\n"), lines.size)
  }

  /** Per-document mince profile over the corpus: block counts by kind + code
    * LoC — a typed flatMap-free map (one row per doc, no shuffle). */
  def minceProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val blocks = split(if (text == null) "" else text)
        val (_, loc) = normalize(if (text == null) "" else text)
        (id, blocks.size.toLong, blocks.count(_.kind == "code").toLong,
          blocks.count(_.kind == "string").toLong,
          blocks.count(b => b.kind == "line_comment" || b.kind == "block_comment").toLong,
          loc.toLong)
      }
      .toDF("doc_id", "n_blocks", "n_code", "n_strings", "n_comments", "code_loc")
  }

  /** Exploded block table (the Generator/UDTF shape): one row per block. */
  def blocks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        split(if (text == null) "" else text).zipWithIndex.map { case (b, i) =>
          (id, i, b.kind, b.content.length.toLong)
        }
      }
      .toDF("doc_id", "block_idx", "kind", "content_len")
  }

  // ---------------------------------------------------------------------
  // Oracle gate for the state machine (the q67 closed-form-synthesis
  // convention, JsStrings.scala): a deterministic JS-ish source per
  // document whose FULL block trace — kinds, order, and content lengths —
  // is a closed form of the `documents` columns, so DuckDB can replay it
  // and the CORRECTNESS gate hashes the scanner end to end. The synthesis
  // drives every state transition the reference mincer has
  // (js_mincer.py:131-226): line comment → code → single-quoted literal
  // WITH an escaped quote (the branch that, if mishandled, shifts every
  // later block), block comment, double-quoted literal, a second line
  // comment, and a block comment left unterminated at EOF.
  // ---------------------------------------------------------------------

  /** The synthesized gate source. Layout (D = doc_id, M = doc_id % 97,
    * L1/L2 = cleaned text slices; `\'` is a real backslash-quote escape):
    * {{{
    * // doc D header
    * var a = '\'L1';
    * &#47;* meta M *&#47;
    * var b = "xL2";
    * call(a, b); // trailer
    * &#47;* tail
    * }}}
    * The scanner emits exactly 11 blocks:
    * idx 0 line_comment  " doc D header"   len 12+len(D)
    * idx 1 code          "\nvar a = "      len 9
    * idx 2 string        "\\'" + L1        len 2+len(L1)
    * idx 3 code          ";\n"             len 2
    * idx 4 block_comment " meta M "        len 7+len(M)
    * idx 5 code          "\nvar b = "      len 9
    * idx 6 string        "x" + L2          len 1+len(L2)
    * idx 7 code          ";\ncall(a, b); " len 14
    * idx 8 line_comment  " trailer"        len 8
    * idx 9 code          "\n"              len 1
    * idx 10 block_comment " tail"          len 5 (EOF-closed)
    * and normalize() keeps 5 code LoC ("var a =", ";", "var b =", ";",
    * "call(a, b);"). The constant "x" prefix on L2 keeps the literal
    * non-empty (an empty buffer is never flushed as a block). */
  private def gateSource: Column = {
    val cleaned = regexp_replace(lower(coalesce(col("text"), lit(""))), "[^a-z ]", "")
    concat(
      lit("// doc "), col("doc_id").cast("string"), lit(" header\n"),
      lit("var a = '\\'"), trim(substring(cleaned, 1, 24)), lit("';\n"),
      lit("/* meta "), (col("doc_id") % 97).cast("string"), lit(" */\n"),
      lit("var b = \"x"), trim(substring(cleaned, 25, 16)), lit("\";\n"),
      lit("call(a, b); // trailer\n"),
      lit("/* tail"))
  }

  private def gateSources(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"), gateSource.as("src"))

  /** Per-doc mince profile over the synthesized sources — counts per kind,
    * normalized code LoC, and per-kind character sums. Every column is a
    * closed form the oracle replays. */
  def minceGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gateSources(spark, dir)
      .as[(Long, String)]
      .map { case (id, src) =>
        val bs = split(src)
        def chars(p: Block => Boolean) = bs.filter(p).map(_.content.length.toLong).sum
        (id, bs.size.toLong,
          bs.count(_.kind == "code").toLong,
          bs.count(_.kind == "string").toLong,
          bs.count(b => b.kind == "line_comment" || b.kind == "block_comment").toLong,
          normalize(src)._2.toLong,
          chars(_.kind == "code"),
          chars(_.kind == "string"),
          chars(b => b.kind == "line_comment" || b.kind == "block_comment"))
      }
      .toDF("doc_id", "n_blocks", "n_code", "n_strings", "n_comments",
        "code_loc", "code_chars", "string_chars", "comment_chars")
  }

  /** Exploded block trace over the synthesized sources — position, kind,
    * and length of every block, all closed-form. */
  def minceBlocksGate(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gateSources(spark, dir)
      .as[(Long, String)]
      .flatMap { case (id, src) =>
        split(src).zipWithIndex.map { case (b, i) =>
          (id, i.toLong, b.kind, b.content.length.toLong)
        }
      }
      .toDF("doc_id", "block_idx", "kind", "content_len")
  }

  private val gateLensCte: String =
    """c AS (
      |  SELECT doc_id,
      |    length(CAST(doc_id AS VARCHAR)) AS ld,
      |    length(CAST(doc_id % 97 AS VARCHAR)) AS lm,
      |    length(trim(substr(regexp_replace(lower(coalesce(text,'')), '[^a-z ]', '', 'g'), 1, 24))) AS l1,
      |    length(trim(substr(regexp_replace(lower(coalesce(text,'')), '[^a-z ]', '', 'g'), 25, 16))) AS l2
      |  FROM documents)""".stripMargin

  /** DuckDB replay of [[minceGate]] — the closed forms in the
    * [[gateSource]] doc comment. */
  def minceGateOracleSql: String =
    s"""WITH $gateLensCte
       |SELECT doc_id, 11 AS n_blocks, 5 AS n_code, 2 AS n_strings,
       |  4 AS n_comments, 5 AS code_loc, 35 AS code_chars,
       |  3 + l1 + l2 AS string_chars, 32 + ld + lm AS comment_chars
       |FROM c""".stripMargin

  /** DuckDB replay of [[minceBlocksGate]] — one UNION ALL branch per block
    * of the synthesized trace. */
  def minceBlocksGateOracleSql: String =
    s"""WITH $gateLensCte
       |SELECT doc_id, 0 AS block_idx, 'line_comment' AS kind, 12 + ld AS content_len FROM c
       |UNION ALL SELECT doc_id, 1, 'code', 9 FROM c
       |UNION ALL SELECT doc_id, 2, 'string', 2 + l1 FROM c
       |UNION ALL SELECT doc_id, 3, 'code', 2 FROM c
       |UNION ALL SELECT doc_id, 4, 'block_comment', 7 + lm FROM c
       |UNION ALL SELECT doc_id, 5, 'code', 9 FROM c
       |UNION ALL SELECT doc_id, 6, 'string', 1 + l2 FROM c
       |UNION ALL SELECT doc_id, 7, 'code', 14 FROM c
       |UNION ALL SELECT doc_id, 8, 'line_comment', 8 FROM c
       |UNION ALL SELECT doc_id, 9, 'code', 1 FROM c
       |UNION ALL SELECT doc_id, 10, 'block_comment', 5 FROM c""".stripMargin
}
