package graft.sources

import graft.SparkSpec

/** crx signed-container semantics (crx.py:59-79): header decode, RSA
  * verify, tamper detection. */
class CrxSpec extends SparkSpec {

  test("pack/unpack round-trip preserves payload, pubkey, signature") {
    val payload = "hello container".getBytes("UTF-8")
    val c = Crx.pack(payload)
    val p = Crx.unpack(c).get
    assert(p.version == 2L)
    assert(p.payload.sameElements(payload))
    assert(p.pubkey.sameElements(Crx.keyPair.getPublic.getEncoded))
  }

  test("verify: authentic container passes, tampered payload/sig/magic fail") {
    val payload = "signed bytes".getBytes("UTF-8")
    val good = Crx.pack(payload)
    assert(Crx.verify(good))
    val tamperedPayload = good.clone()
    tamperedPayload(tamperedPayload.length - 1) = (tamperedPayload(tamperedPayload.length - 1) ^ 1).toByte
    assert(!Crx.verify(tamperedPayload))
    val tamperedSig = good.clone()
    tamperedSig(20 + Crx.keyPair.getPublic.getEncoded.length) =
      (tamperedSig(20 + Crx.keyPair.getPublic.getEncoded.length) ^ 1).toByte
    assert(!Crx.verify(tamperedSig))
    val badMagic = good.clone()
    badMagic(0) = 'X'.toByte
    assert(!Crx.verify(badMagic))
    assert(Crx.unpack(badMagic).isEmpty)
    // truncated/garbage input never throws
    assert(!Crx.verify(Array[Byte](1, 2, 3)))
  }

  test("signatureAudit: tampered containers (and only those) fail the verify") {
    val out = Crx.signatureAudit(spark, sf0001, limit = 32).collect()
    assert(out.length == 32)
    out.foreach { r =>
      assert(r.getAs[Long]("magic_u32") == Crx.Magic)
      assert(r.getAs[Boolean]("sig_valid") == !r.getAs[Boolean]("tampered"),
        s"doc ${r.getAs[Long]("doc_id")}: valid must equal !tampered")
    }
    assert(out.exists(_.getAs[Boolean]("tampered")), "fixture must include tampered rows")
  }
}
