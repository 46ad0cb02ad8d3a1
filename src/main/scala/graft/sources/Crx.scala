package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.security.{KeyFactory, KeyPair, KeyPairGenerator, SecureRandom, Signature}
import java.security.spec.X509EncodedKeySpec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S14/F10 — the crx signed-container reader, COMPLETE with the RSA
  * signature check the reference performs (crx.py:59-63: PKCS#1 v1.5,
  * SHA-1, public key embedded in the header).
  *
  * Container layout = crx2 (crx.py:66-79): magic "Cr24", little-endian u32
  * version, u32 pubkey length, u32 signature length, pubkey (X.509 DER),
  * signature over the payload, then the payload. Header words parse with
  * the same le_u32 arithmetic as the `le_u32` Catalyst expression; the RSA
  * verify is a COLD-PATH UDF (SURVEY §2.10's explicit placement: integrity
  * checks run in the validation stage, never the hot path).
  */
object Crx {

  val Magic = 0x34327243L // "Cr24" little-endian

  /** Deterministic RSA keypair: SHA1PRNG with a fixed seed generates the
    * same pair on every OpenJDK JVM, so executors and tests agree without
    * shipping key material. */
  lazy val keyPair: KeyPair = {
    val gen = KeyPairGenerator.getInstance("RSA")
    val rnd = SecureRandom.getInstance("SHA1PRNG")
    rnd.setSeed("graft-crx-signing".getBytes("UTF-8"))
    gen.initialize(2048, rnd)
    gen.generateKeyPair()
  }

  private def leU32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()

  def sign(payload: Array[Byte]): Array[Byte] = {
    val s = Signature.getInstance("SHA1withRSA")
    s.initSign(keyPair.getPrivate)
    s.update(payload)
    s.sign()
  }

  /** Build a signed crx2-layout container around a payload. */
  def pack(payload: Array[Byte]): Array[Byte] = {
    val pk = keyPair.getPublic.getEncoded // X.509 DER, like the crx header's key
    val sig = sign(payload)
    val out = ByteBuffer.allocate(16 + pk.length + sig.length + payload.length)
    out.put("Cr24".getBytes("UTF-8")).put(leU32(2L))
      .put(leU32(pk.length.toLong)).put(leU32(sig.length.toLong))
      .put(pk).put(sig).put(payload)
    out.array()
  }

  final case class Parsed(version: Long, pubkey: Array[Byte], sig: Array[Byte], payload: Array[Byte])

  private def readLe(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) | ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Header decode (crx.py:66-79): magic check + le_u32 lengths + slices. */
  def unpack(container: Array[Byte]): Option[Parsed] = {
    if (container.length < 16 || readLe(container, 0) != Magic) return None
    val version = readLe(container, 4)
    val pkLen = readLe(container, 8).toInt
    val sigLen = readLe(container, 12).toInt
    if (pkLen < 0 || sigLen < 0 || 16L + pkLen + sigLen > container.length) return None
    Some(Parsed(version,
      java.util.Arrays.copyOfRange(container, 16, 16 + pkLen),
      java.util.Arrays.copyOfRange(container, 16 + pkLen, 16 + pkLen + sigLen),
      java.util.Arrays.copyOfRange(container, 16 + pkLen + sigLen, container.length)))
  }

  /** The reference's integrity check (crx.py:59-63): RSA-PKCS#1-SHA1 verify
    * of the payload against the EMBEDDED public key. */
  def verify(container: Array[Byte]): Boolean =
    unpack(container).exists { p =>
      try {
        val key = KeyFactory.getInstance("RSA").generatePublic(new X509EncodedKeySpec(p.pubkey))
        val s = Signature.getInstance("SHA1withRSA")
        s.initVerify(key)
        s.update(p.payload)
        s.verify(p.sig)
      } catch { case scala.util.control.NonFatal(_) => false }
    }

  /** Rows-only signature audit: doc-derived payloads packed into signed
    * containers, every 7th tampered post-signing (one payload byte flipped —
    * the corrupt-archive case the reference's forensics catch,
    * archive.py:140-144); header words surfaced via the codegen'd `le_u32`
    * expression, verdict via the cold-path verify UDF. */
  def signatureAudit(spark: SparkSession, dir: String, limit: Int = 64): DataFrame = {
    import spark.implicits._
    import graft.functions.GraftFunctions
    val verifyUdf = udf((b: Array[Byte]) => verify(b))
    val rows = graft.core.Tables.spread(
      graft.core.Tables.documents(spark, dir)
        .orderBy("doc_id").limit(limit)
        .select(col("doc_id"), col("text")),
      col("doc_id")) // limit → 1 partition; pack+sign below is the heavy stage
      .as[(Long, String)]
      .map { case (id, text) =>
        val container = pack(s"payload|$id|$text".getBytes("UTF-8"))
        val tampered = id % 7 == 0
        if (tampered) container(container.length - 1) = (container(container.length - 1) ^ 0x1).toByte
        (id, container, tampered)
      }
      .toDF("doc_id", "container", "tampered")
    rows.select(
      col("doc_id"),
      GraftFunctions.leU32(col("container"), lit(0)).as("magic_u32"),
      GraftFunctions.leU32(col("container"), lit(8)).as("pubkey_len"),
      GraftFunctions.leU32(col("container"), lit(12)).as("sig_len"),
      col("tampered"),
      verifyUdf(col("container")).as("sig_valid"))
  }
}
