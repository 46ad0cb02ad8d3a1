package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.core.Tables

/** Audio-modality operators (q96/q97) — the third opaque-binary payload
  * axis of the multimodal mandate (image: [[Images]], video: [[Video]],
  * audio: here). As with the other two, the container/codec plumbing is
  * REAL — RIFF/WAVE PCM16 encode and decode through `javax.sound.sampled`
  * (header parse, frame geometry, channel interleaving all exercised by the
  * platform codec, not a stub) — and only the CONTENT is the engine's
  * deterministic synthesizer, because this sandbox ships no media corpus
  * (same stance as `Payload.renderPixels`; reference analog: the crawler
  * archives media bytes opaquely and validates them on read,
  * archive.py:288-302).
  *
  * Closed-form synthesis (the q87/q91 oracle pattern): each document plants
  * a square wave whose half-period, amplitude, and length are pure functions
  * of `doc_id`, chosen so every extracted feature has an exact integer
  * closed form the DuckDB oracle replays from id arithmetic alone:
  *   - half-period `h ∈ {2,4,8,16,32}` divides the window size 64, so the
  *     per-window zero-crossing count is exactly `64/h` (window 0: one less
  *     — sample 0 has no predecessor);
  *   - samples are exactly `±a` with `a ≤ 4000`, so windowed RMS == `a`
  *     bit-exactly in double (`a²·64` is exact, `sqrt(a²) == a`);
  *   - the WAV container is the 44-byte canonical RIFF header + 2 bytes per
  *     mono sample (4 per stereo frame), gating the encoder's framing.
  * The gate therefore covers synth → WAV encode → WAV decode → window →
  * feature end to end: a single wrong sample, header field, or window
  * boundary moves a hash-gated column.
  *
  * Scale shape: both queries are one typed flatMap/map over the documents
  * scan — per-row imperative codec work in the cold tier, no shuffle,
  * embarrassingly parallel; feature rows are constant-width regardless of
  * payload length, so at 100 TB this is a pure scan whose output is the
  * feature table, exactly how the image validate/thumbnail stages behave.
  */
object Audio {

  /** Samples per analysis window. All planted half-periods divide it. */
  val WindowSize = 64

  /** Sample rate (Hz) stamped into the container and read back from it. */
  val SampleRate = 8000

  /** Canonical RIFF/WAVE PCM header length `javax.sound.sampled` writes. */
  val WavHeaderBytes = 44

  // ---- deterministic per-doc wave parameters (pure functions of doc_id) --

  /** Half-period in samples: 2, 4, 8, 16 or 32 — each divides WindowSize,
    * and each half of a window holds whole half-periods (2h | 64). */
  def halfPeriodFor(docId: Long): Int = 1 << (1 + Math.floorMod(docId, 5L).toInt)

  /** Left/mono amplitude: 1000..4000 step 500 (≤ Short.MaxValue, and a²·64
    * stays far inside double's exact-integer range). */
  def amplitudeFor(docId: Long): Int = 1000 + Math.floorMod(docId, 7L).toInt * 500

  /** Right-channel amplitude: 500..1500 step 250. `amplitudeFor + this` is
    * always even, so the stereo downmix `(l+r)/2` is exact in integer
    * division on both engines. */
  def rightAmplitudeFor(docId: Long): Int = 500 + Math.floorMod(docId, 5L).toInt * 250

  /** Windows per clip: 2..5 → 128..320 samples. */
  def nWindowsFor(docId: Long): Int = 2 + Math.floorMod(docId, 4L).toInt

  /** The planted signal: sample i is `+a` when `⌊i/h⌋` is even, `-a` odd. */
  def squareWave(n: Int, halfPeriod: Int, amp: Int): Array[Short] =
    Array.tabulate(n)(i => (if ((i / halfPeriod) % 2 == 0) amp else -amp).toShort)

  // ---- real container plumbing (RIFF/WAVE PCM16 via javax.sound) ---------

  /** Encode interleaved PCM16 samples as a WAV container. `samples.length`
    * must be a multiple of `channels`. */
  def encodeWav(samples: Array[Short], channels: Int): Array[Byte] = {
    require(samples.length % channels == 0, "partial final frame")
    val fmt = new AudioFormat(SampleRate.toFloat, 16, channels, true, false) // PCM signed, little-endian
    val pcm = new Array[Byte](samples.length * 2)
    ByteBuffer.wrap(pcm).order(ByteOrder.LITTLE_ENDIAN).asShortBuffer().put(samples)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, samples.length.toLong / channels)
    val out = new ByteArrayOutputStream()
    try AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out) finally ais.close()
    out.toByteArray
  }

  /** A decoded clip: header geometry + interleaved samples. */
  final case class Decoded(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Decode a WAV container back to PCM16 samples; the header fields are
    * READ from the container (they are what q96 reports), not assumed. */
  def decodeWav(bytes: Array[Byte]): Decoded = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val f = ais.getFormat
      require(f.getEncoding == AudioFormat.Encoding.PCM_SIGNED && f.getSampleSizeInBits == 16,
        s"unsupported format $f")
      val raw = ais.readAllBytes()
      val shorts = new Array[Short](raw.length / 2)
      ByteBuffer.wrap(raw)
        .order(if (f.isBigEndian) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
        .asShortBuffer().get(shorts)
      Decoded(f.getSampleRate.toInt, f.getChannels, shorts)
    } finally ais.close()
  }

  // ---- q96: mono decode → windowed feature extraction ---------------------

  /** One analysis window's features over decoded samples `s[from, from+W)`:
    * (rms rounded to 6, peak |sample|, zero crossings vs the previous
    * sample — the crossing between windows lands in the later window). */
  private[sources] def windowFeatures(s: Array[Short], from: Int): (Double, Int, Int) = {
    var sumSq = 0.0; var peak = 0; var zc = 0
    var i = from
    while (i < from + WindowSize) {
      val v = s(i).toInt
      sumSq += v.toDouble * v
      if (math.abs(v) > peak) peak = math.abs(v)
      if (i > 0 && ((s(i) < 0) != (s(i - 1) < 0))) zc += 1 // planted samples are never 0
      i += 1
    }
    (BigDecimal(math.sqrt(sumSq / WindowSize)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
      peak, zc)
  }

  /** q96 — per-(doc, window) audio features over REAL WAV round-trips:
    * container geometry read back from the decoded header, windowed RMS,
    * peak, and zero-crossing count. Oracle-gated via the closed forms in
    * the object doc. */
  def audioFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Deliberately NOT Tables.spread here (round 6, measured): javax.sound's
    // AudioSystem entry points run a synchronized SPI provider lookup on
    // EVERY write/getAudioInputStream call, so fanning the codec map across
    // 32 cores convoyed on that lock and ran 3× SLOWER than the single
    // stream (0.67 s → 2.15 s noop at sf0.1). The image tier has no such
    // global lock and does spread.
    Tables.documents(spark, dir).select(col("doc_id"), col("source")).as[(Long, String)]
      .flatMap { case (id, source) =>
        val h = halfPeriodFor(id); val a = amplitudeFor(id)
        val nWin = nWindowsFor(id); val n = nWin * WindowSize
        val wav = encodeWav(squareWave(n, h, a), channels = 1)
        val d = decodeWav(wav)
        (0 until nWin).map { k =>
          val (rms, peak, zc) = windowFeatures(d.samples, k * WindowSize)
          (id, source, d.sampleRate, d.channels, d.samples.length.toLong,
            wav.length.toLong, k.toLong, rms, peak.toLong, zc.toLong)
        }
      }
      .toDF("doc_id", "source", "sample_rate", "channels", "n_samples",
        "wav_bytes", "win_idx", "rms", "peak", "zero_crossings")
  }

  /** DuckDB replay of q96 from doc_id arithmetic (see object doc for why
    * each closed form is exact). */
  def audioFeaturesOracleSql(): String =
    s"""WITH p AS (SELECT doc_id, source,
       |  (1 << (1 + CAST(doc_id % 5 AS INTEGER))) AS hp,
       |  1000 + (doc_id % 7) * 500 AS amp,
       |  2 + (doc_id % 4) AS nwin
       |  FROM documents),
       |w AS (SELECT doc_id, source, hp, amp, nwin,
       |  unnest(range(0, nwin)) AS win_idx FROM p)
       |SELECT doc_id, source,
       |  $SampleRate AS sample_rate, 1 AS channels,
       |  CAST(nwin * $WindowSize AS BIGINT) AS n_samples,
       |  CAST($WavHeaderBytes + 2 * nwin * $WindowSize AS BIGINT) AS wav_bytes,
       |  CAST(win_idx AS BIGINT) AS win_idx,
       |  round(CAST(amp AS DOUBLE), 6) AS rms,
       |  CAST(amp AS BIGINT) AS peak,
       |  CAST($WindowSize // hp - CASE WHEN win_idx = 0 THEN 1 ELSE 0 END AS BIGINT) AS zero_crossings
       |FROM w""".stripMargin

  // ---- q97: stereo decode → downmix → decimate ----------------------------

  /** q97 — the stereo DOWNMIX + DECIMATE stage: interleaved 2-channel WAV
    * (left/right planted at different amplitudes, same phase), decoded,
    * channel-averaged to mono, then decimated by `decim`. Gates the
    * interleaved frame layout (a swapped or misaligned channel moves the
    * downmix), the integer downmix arithmetic, and the decimated signal's
    * structure (total zero crossings `n/h − 1` for decim=2 — the decimated
    * wave is the same square at half the half-period).
    */
  def audioDownmix(spark: SparkSession, dir: String, decim: Int = 2): DataFrame = {
    require(decim == 2, "closed-form oracle is derived for decim=2")
    import spark.implicits._
    // no spread — see audioFeatures: the javax.sound SPI lock convoys
    Tables.documents(spark, dir).select(col("doc_id"), col("source")).as[(Long, String)]
      .map { case (id, source) =>
        val h = halfPeriodFor(id); val a = amplitudeFor(id); val b = rightAmplitudeFor(id)
        val n = nWindowsFor(id) * WindowSize
        val left = squareWave(n, h, a); val right = squareWave(n, h, b)
        val inter = new Array[Short](2 * n)
        var j = 0
        while (j < n) { inter(2 * j) = left(j); inter(2 * j + 1) = right(j); j += 1 }
        val d = decodeWav(encodeWav(inter, channels = 2))
        require(d.channels == 2, "stereo container lost a channel")
        val frames = d.samples.length / 2
        val mono = Array.tabulate(frames)(k => (d.samples(2 * k) + d.samples(2 * k + 1)) / 2)
        val dec = Array.range(0, frames, decim).map(mono)
        var sumSq = 0.0; var peak = 0; var zc = 0
        var i = 0
        while (i < dec.length) {
          val v = dec(i)
          sumSq += v.toDouble * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((v < 0) != (dec(i - 1) < 0))) zc += 1
          i += 1
        }
        val rms = BigDecimal(math.sqrt(sumSq / dec.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, source, frames.toLong, dec.length.toLong, rms, peak.toLong, zc.toLong)
      }
      .toDF("doc_id", "source", "n_frames", "n_out", "rms", "peak", "total_zero_crossings")
  }

  /** DuckDB replay of q97: downmix `(a+b)//2` is exact (the sum is always
    * even by construction), decimation by 2 halves the half-period, so the
    * decimated stream's total crossing count is `n/h − 1`. */
  def audioDownmixOracleSql(): String =
    s"""WITH p AS (SELECT doc_id, source,
       |  (1 << (1 + CAST(doc_id % 5 AS INTEGER))) AS hp,
       |  1000 + (doc_id % 7) * 500 AS amp,
       |  500 + (doc_id % 5) * 250 AS bmp,
       |  (2 + (doc_id % 4)) * $WindowSize AS n
       |  FROM documents)
       |SELECT doc_id, source,
       |  CAST(n AS BIGINT) AS n_frames,
       |  CAST(n // 2 AS BIGINT) AS n_out,
       |  round(CAST((amp + bmp) // 2 AS DOUBLE), 6) AS rms,
       |  CAST((amp + bmp) // 2 AS BIGINT) AS peak,
       |  CAST(n // hp - 1 AS BIGINT) AS total_zero_crossings
       |FROM p""".stripMargin
}
