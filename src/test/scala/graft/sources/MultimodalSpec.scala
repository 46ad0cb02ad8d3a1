package graft.sources

import graft.SparkSpec
import graft.fetch.Payload

/** The two round-5 multimodal stages: RESIZE (aspect-preserving bilinear
  * thumbnails) and FRAME-SAMPLE (multi-frame GIF containers decoded
  * frame-addressably). Both are rows-only queries (q82/q83); this spec
  * carries their exactness. */
class MultimodalSpec extends SparkSpec {

  // ---- resize kernel ----

  test("thumbDims preserves aspect, caps the long edge, never upscales") {
    assert(Payload.thumbDims(128, 64, 32) === ((32, 16)))
    assert(Payload.thumbDims(64, 128, 32) === ((16, 32)))
    assert(Payload.thumbDims(16, 16, 32) === ((16, 16))) // no upscale
    assert(Payload.thumbDims(128, 1, 32) === ((32, 1)))  // floor at 1
    assert(Payload.thumbDims(100, 30, 32) === ((32, 10)))
  }

  test("resize of a constant-color image is exact at every scale") {
    val img = new java.awt.image.BufferedImage(64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 48).foreach(y => (0 until 64).foreach(x => img.setRGB(x, y, 0x336699)))
    val t = Payload.resize(img, 16, 12)
    assert(t.getWidth === 16 && t.getHeight === 12)
    (0 until 12).foreach(y => (0 until 16).foreach(x =>
      assert((t.getRGB(x, y) & 0xFFFFFF) === 0x336699)))
  }

  test("q82 thumbnails: geometry, fidelity, determinism") {
    val a = Images.thumbnails(spark, sf0001, limit = 48).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val (w, h) = (r.getInt(2), r.getInt(3))
      val (tw, th) = (r.getInt(4), r.getInt(5))
      assert((tw, th) === Payload.thumbDims(w, h, 32), s"geometry for ${r.getString(0)}")
      assert(r.getInt(6) > 0, "thumb encodes to a non-empty PNG")
    }
    // smooth-gradient fidelity: downsampling a bilinear gradient preserves
    // the coarse 8x8 luma structure the phash measures — drift stays well
    // under the 32-bit expectation of two UNRELATED hashes
    val drifts = a.map(_.getInt(8))
    assert(drifts.sum.toDouble / drifts.length < 16.0,
      s"mean phash drift ${drifts.sum.toDouble / drifts.length}")
    val b = Images.thumbnails(spark, sf0001, limit = 48).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
  }

  // ---- frame container ----

  test("encodeVideo emits a real multi-frame GIF; frames round-trip exactly") {
    val id = "abcdefghijklmnopabcdefghijklmnop"
    val (bytes, n, w, h) = Video.encodeVideo(id)
    assert(n === Video.framesFor(id) && n >= 4 && n <= 12)
    assert(new String(bytes.take(4), "US-ASCII").startsWith("GIF8"), "container magic")
    val frames = Video.sampleFrames(bytes, 1)
    assert(frames.map(_._1) === (0 until n))
    // 16-level-gray frames are palette-exact: decoded pixels == rendered
    frames.foreach { case (t, img) =>
      val ref = Video.renderFrame(id, t, w, h)
      assert(img.getWidth === w && img.getHeight === h)
      (0 until h by math.max(1, h / 8)).foreach(y =>
        (0 until w by math.max(1, w / 8)).foreach(x =>
          assert((img.getRGB(x, y) & 0xFFFFFF) === (ref.getRGB(x, y) & 0xFFFFFF),
            s"frame $t pixel ($x,$y)")))
      assert(Payload.phash(img) === Payload.phash(ref), s"frame $t phash")
    }
    // deterministic container bytes
    assert(java.util.Arrays.equals(bytes, Video.encodeVideo(id)._1))
  }

  test("sampleFrames strides without decoding skipped frames' indices") {
    val id = "ponmlkjihgfedcbaponmlkjihgfedcba"
    val (bytes, n, _, _) = Video.encodeVideo(id)
    val sampled = Video.sampleFrames(bytes, 3)
    assert(sampled.map(_._1) === (0 until n by 3))
  }

  test("q83 frame_sample: per-video stride coverage and phash == direct render") {
    val df = Video.frameSample(spark, sf0001, limit = 12, stride = 3).collect()
    assert(df.nonEmpty)
    val byVideo = df.groupBy(_.getString(0))
    byVideo.foreach { case (id, rows) =>
      val n = rows.head.getInt(1)
      assert(n === Video.framesFor(id))
      assert(rows.map(_.getInt(5)).sorted.toSeq === (0 until n by 3).toSeq,
        s"sampled indices for $id")
      val (w, h) = (rows.head.getInt(3), rows.head.getInt(4))
      rows.foreach { r =>
        assert(r.getLong(6) === Payload.phash(Video.renderFrame(id, r.getInt(5), w, h)),
          s"phash of $id frame ${r.getInt(5)}")
      }
    }
  }
}
