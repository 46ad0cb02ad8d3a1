package graft.sources

import graft.SparkSpec

/** Audio modality (q96/q97): real RIFF/WAVE PCM16 round-trips over the
  * planted square-wave corpus — container geometry, decode fidelity,
  * windowed features, stereo downmix + decimation, and determinism. */
class AudioSpec extends SparkSpec {

  test("WAV round-trip is lossless and the header carries the real geometry") {
    val s = Audio.squareWave(192, 8, 2500)
    val wav = Audio.encodeWav(s, channels = 1)
    val d = Audio.decodeWav(wav)
    assert(d.sampleRate == Audio.SampleRate)
    assert(d.channels == 1)
    assert(d.samples.toSeq == s.toSeq)
    // canonical RIFF header + 2 bytes/sample — the closed form q96 gates
    assert(wav.length == Audio.WavHeaderBytes + 2 * s.length)
  }

  test("WAV encode is byte-deterministic") {
    val s = Audio.squareWave(128, 4, 1500)
    assert(Audio.encodeWav(s, 1).toSeq == Audio.encodeWav(s, 1).toSeq)
  }

  test("window features match the hand computation on a tiny wave") {
    // h=2, a=1000, two windows of 64: samples +1000,+1000,-1000,-1000,...
    val s = Audio.squareWave(128, 2, 1000)
    val (rms0, peak0, zc0) = Audio.windowFeatures(s, 0)
    val (rms1, peak1, zc1) = Audio.windowFeatures(s, 64)
    assert(rms0 == 1000.0 && rms1 == 1000.0)
    assert(peak0 == 1000 && peak1 == 1000)
    // flips at every multiple of h=2; window 0 lacks the i=0 predecessor
    assert(zc0 == 31)
    assert(zc1 == 32)
  }

  test("stereo interleave + downmix + decimate match the hand computation") {
    // 8 frames, h=2: L=±2000, R=±1000 (same phase) → mono=±1500
    val n = 8
    val left = Audio.squareWave(n, 2, 2000)
    val right = Audio.squareWave(n, 2, 1000)
    val inter = new Array[Short](2 * n)
    (0 until n).foreach { j => inter(2 * j) = left(j); inter(2 * j + 1) = right(j) }
    val d = Audio.decodeWav(Audio.encodeWav(inter, channels = 2))
    assert(d.channels == 2)
    assert(d.samples.toSeq == inter.toSeq) // interleaved layout survives the container
    val mono = (0 until n).map(k => (d.samples(2 * k) + d.samples(2 * k + 1)) / 2)
    assert(mono == Seq(1500, 1500, -1500, -1500, 1500, 1500, -1500, -1500))
    // decimate by 2 → 1500,-1500,1500,-1500: 3 crossings == n/h − 1
    val dec = mono.grouped(2).map(_.head).toSeq
    assert(dec == Seq(1500, -1500, 1500, -1500))
  }

  test("q96 audio features equal the closed form on sf0.001") {
    val rows = Audio.audioFeatures(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val h = Audio.halfPeriodFor(id); val a = Audio.amplitudeFor(id)
      val nWin = Audio.nWindowsFor(id)
      assert(r.getInt(2) == Audio.SampleRate)
      assert(r.getInt(3) == 1)
      assert(r.getLong(4) == nWin.toLong * Audio.WindowSize)
      assert(r.getLong(5) == Audio.WavHeaderBytes + 2L * nWin * Audio.WindowSize)
      val k = r.getLong(6)
      assert(r.getDouble(7) == a.toDouble)
      assert(r.getLong(8) == a.toLong)
      val expectZc = Audio.WindowSize / h - (if (k == 0) 1 else 0)
      assert(r.getLong(9) == expectZc, s"doc $id win $k")
    }
    // every doc contributes exactly nWindowsFor(id) windows
    val perDoc = rows.groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.length }
    perDoc.foreach { case (id, c) => assert(c == Audio.nWindowsFor(id)) }
  }

  test("q97 downmix equals the closed form on sf0.001") {
    val rows = Audio.audioDownmix(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val h = Audio.halfPeriodFor(id)
      val m = (Audio.amplitudeFor(id) + Audio.rightAmplitudeFor(id)) / 2
      val n = Audio.nWindowsFor(id) * Audio.WindowSize
      assert(r.getLong(2) == n.toLong)
      assert(r.getLong(3) == n.toLong / 2)
      assert(r.getDouble(4) == m.toDouble)
      assert(r.getLong(5) == m.toLong)
      assert(r.getLong(6) == n.toLong / h - 1, s"doc $id")
    }
  }
}
