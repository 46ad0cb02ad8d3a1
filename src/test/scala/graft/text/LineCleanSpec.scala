package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q103 line cleaning — the oracle hash-gates the full per-doc report;
  * this spec carries what the gate can't state: that each planted line
  * class triggers exactly the intended rule, and the per-doc kept counts
  * follow the planting arithmetic. */
class LineCleanSpec extends SparkSpec {

  test("q103: per-line keep rule fires exactly the intended clause per class") {
    import spark.implicits._
    val cases = Seq(
      ("intro line for document 7 with plenty of words here.", true),   // well-formed
      ("the fast key order sort table scan merge", false),              // no terminal punct
      ("please enable javascript to continue reading this page.", false), // boilerplate marker
      ("too short.", false),                                            // < 5 words
      ("this site uses cookies to improve your browsing session.", false), // cookie marker
      ("function f() { return the page template verbatim here; }", false), // curly brace
      ("closing summary line number 40 ends properly.", true),
      ("did it really end with a question mark?", true),
      ("it certainly ended with a bang!", true),
      ("Lorem Ipsum dolor sit amet consectetur adipiscing elit.", false)) // case-folded marker
    val got = cases.map(_._1).toDF("l")
      .select(col("l"), LineClean.keepLine(col("l")).as("keep"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    cases.foreach { case (l, want) => assert(got(l) === want, s"line: $l") }
  }

  test("q103: kept counts and keep_doc follow the doc_id planting arithmetic") {
    val rows = LineClean.lineClean(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(6)))
    assert(rows.length === 500)
    rows.foreach { case (id, nLines, nKept, keepDoc) =>
      // planted line census: intro + raw words, + one rotating bad line
      // (id%4 != 0), + code line (id%9==0), + good lines on id%5 / id%10
      val expLines = 2L + (if (id % 4 != 0) 1 else 0) +
        (if (id % 9 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0) +
        (if (id % 10 == 0) 1 else 0)
      val expKept = 1L + (if (id % 5 == 0) 1 else 0) + (if (id % 10 == 0) 1 else 0)
      assert(nLines === expLines, s"doc $id n_lines")
      assert(nKept === expKept, s"doc $id n_kept")
      assert(keepDoc === (expKept >= LineClean.MinKeptLines), s"doc $id keep_doc")
    }
    // the planting exercises all three outcomes of the page rule inputs
    assert(rows.count(_._4) === 50)          // id%10==0: three kept lines
    assert(rows.exists(r => r._3 === 2L))    // id%5==0 && id%10!=0
    assert(rows.exists(r => r._3 === 1L))
  }

  test("q103: cleaned text reassembles only kept lines, in order") {
    import spark.implicits._
    val body = "keep me one two three four five.\ndrop me\nand keep this one too!"
    val r = Seq(body).toDF("text")
      .select(
        md5(concat_ws("\n",
          filter(split(col("text"), "\n"), LineClean.keepLine _))).as("m"))
      .collect().head.getString(0)
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("keep me one two three four five.\nand keep this one too!".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r === want)
  }
}
