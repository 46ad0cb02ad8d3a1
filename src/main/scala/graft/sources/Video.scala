package graft.sources

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.Ids
import graft.fetch.Payload
import graft.scheduler.Politeness

/** Multimodal FRAME-SAMPLE stage over synthetic "video" payloads.
  *
  * A video here is a REAL multi-frame container: 4-12 deterministic frames
  * written into one animated GIF through ImageIO's sequence writer and read
  * back frame-addressable through its reader — the container/codec plumbing
  * is genuine, only the content is the engine's seeded renderer (this
  * sandbox has no media corpus; same stance as the image payloads,
  * [[graft.fetch.Payload]]). Frames render on the 16-level grayscale ramp
  * (≤16 palette entries), so the GIF round-trip is exactly lossless and a
  * decoded frame's phash equals the phash of the directly-rendered frame —
  * the invariant MultimodalSpec pins.
  *
  * Scale shape: one typed flatMap — each task opens ONE reader per
  * container, decodes only every `stride`-th frame (the sample), and emits
  * a row per sampled frame. No shuffle, embarrassingly parallel; at corpus
  * scale the stride divides decode cost and the emitted features
  * (64-bit phash + geometry) are constant-width regardless of frame size.
  */
object Video {

  /** Frames per video: deterministic 4..12. */
  def framesFor(id: String): Int =
    4 + Math.floorMod(Ids.mix64(Politeness.strHash64(id, 23L)), 9L).toInt

  /** The seeded per-frame render id — frame t of video `id`. */
  def frameId(id: String, t: Int): String = s"$id#f$t"

  def renderFrame(id: String, t: Int, w: Int, h: Int): BufferedImage =
    Payload.renderPixels(frameId(id, t), w, h, "gif")

  /** Encode video `id`: (container bytes, nFrames, w, h). One full-size
    * image descriptor per frame (no inter-frame deltas), so frames decode
    * independently. */
  def encodeVideo(id: String): (Array[Byte], Int, Int, Int) = {
    val n = framesFor(id)
    val w = Payload.sizeFor(id)
    val h = Payload.sizeFor(id + "h")
    val out = new ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until n).foreach { t =>
        writer.writeToSequence(
          new javax.imageio.IIOImage(renderFrame(id, t, w, h), null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    (out.toByteArray, n, w, h)
  }

  /** Decode every `stride`-th frame of a container: (frameIdx, pixels).
    * One reader per container; only sampled frames are decoded. */
  def sampleFrames(bytes: Array[Byte], stride: Int): Seq[(Int, BufferedImage)] = {
    require(stride >= 1, "stride must be >= 1")
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      (0 until n by stride).map(t => t -> reader.read(t))
    } finally { reader.dispose(); iis.close() }
  }

  /** The frame-sample query: per sampled frame — container geometry, frame
    * index, and the frame's 64-bit phash (the per-frame feature a training
    * pipeline would embed). Deterministic; video ids derive from the
    * documents table like the image payloads do. */
  def frameSample(spark: SparkSession, dir: String,
                  limit: Int = 64, stride: Int = 3): DataFrame = {
    import spark.implicits._
    Images.idsFromDocs(spark, dir, limit).mapPartitions { it =>
      it.flatMap { id =>
        val (bytes, n, w, h) = encodeVideo(id)
        sampleFrames(bytes, stride).map { case (t, img) =>
          (id, n, bytes.length, w, h, t, Payload.phash(img))
        }
      }
    }.toDF("video_id", "n_frames", "container_bytes", "w", "h", "frame_idx", "frame_phash")
  }
}
