package graft.text

import graft.SparkSpec

/** grep-unused-permissions semantics (PermissionAnalysis/
  * grep-unused-permissions:68-150): the minced-grep × manifest contingency
  * must land every (extid, date, permission) in exactly the class its
  * residues dictate, and all four reference labels must be exercised. */
class PermissionGrepSpec extends SparkSpec {

  test("evidence-map classes match the closed form; all four labels occur") {
    val rows = PermissionGrep.unusedPermissions(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    assert(rows.nonEmpty)
    val perms = PermissionGrep.PermissionMap.map(_._1)
    rows.foreach { case ((extid, date, perm), cls) =>
      val p = perms.indexOf(perm)
      val rev = if (date.drop(8).toInt > 14) 1 else 0
      val req = (extid + p) % 2 == 0
      val found = (extid + 7 * p + rev) % 3 <= 1
      val expect =
        if (req && found) "REQ_AND_FOUND"
        else if (req) "REQ_AND_NOT_FOUND"
        else if (found) "NOT_REQ_AND_FOUND"
        else "NOT_REQ_AND_NOT_FOUND"
      assert(cls === expect, s"extid=$extid date=$date perm=$perm")
    }
    assert(rows.values.toSet.size === 4, "all four contingency classes must occur")
    // row count: 2 crawl dates x |permissions| per document
    val nDocs = graft.core.Tables.documents(spark, sf0001).count()
    assert(rows.size === (nDocs * 2 * perms.size))
  }

  test("comment-block evidence counts as FOUND (the reference greps every minced block)") {
    // residue r=1 places the evidence ONLY in a '//' comment; the class for
    // such rows must still be *_FOUND — mince_js splits blocks, it does not
    // exclude comments from the grep (grep-unused-permissions:108-116)
    val rows = PermissionGrep.unusedPermissions(spark, sf0001).collect()
    val perms = PermissionGrep.PermissionMap.map(_._1)
    val commentOnly = rows.filter { r =>
      val p = perms.indexOf(r.getString(2))
      val rev = if (r.getString(1).drop(8).toInt > 14) 1 else 0
      (r.getLong(0) + 7 * p + rev) % 3 == 1
    }
    assert(commentOnly.nonEmpty)
    assert(commentOnly.forall(_.getString(3).endsWith("_FOUND")))
    assert(commentOnly.forall(!_.getString(3).contains("NOT_FOUND")))
  }

  test("evidence placement VARIES between the two crawl dates (live cross-crawl dimension)") {
    // the rev coefficient in the placement residue must not be ≡ 0 (mod 3),
    // or no (extid, permission) ever changes FOUND status between crawls —
    // the exact transition an unused-permissions evidence map exists to
    // surface
    val rows = PermissionGrep.unusedPermissions(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getString(1)) -> r.getString(3))
      .groupBy { case ((extid, perm, _), _) => (extid, perm) }
    val flips = rows.count { case (_, revs) =>
      revs.map(_._2.endsWith("NOT_FOUND")).toSet.size == 2
    }
    assert(flips > 0, "some (extid, permission) must flip FOUND status across crawls")
  }
}
