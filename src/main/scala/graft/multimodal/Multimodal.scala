package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * Image decode/resize is REAL — JDK-built-in `javax.imageio` (headless
  * JPEG/PNG/GIF/BMP, zero external jars), mirroring the reference's
  * PIL-decode-feeding-the-model contract with `None` -> row-skip on
  * undecodable bytes (`Nomic MultiModal Retrieval.py:202-213, 239`).
  * Only video frame-sampling remains a deterministic stub ([[MediaCodec
  * .sampleFrames]]) — the JDK has no video codec; a real one slots in
  * behind the same signature and changes no plan shape.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("format", StringType)))

  /** Codec boundary. Image paths are real (`javax.imageio`); video is a
    * deterministic stub. Stateless and Serializable so one instance ships
    * to every executor. */
  object MediaCodec extends Serializable {

    /** Decode to a BufferedImage + normalized format name ("jpeg", "png",
      * ...); None for bytes no installed reader accepts (corrupt/truncated/
      * not an image — the reference's drop-row signal, `NB:211-213`). */
    private[graft] def decodeBuffered(bytes: Array[Byte]): Option[(BufferedImage, String)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
        try {
          val readers = ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val fmt = reader.getFormatName.toLowerCase
            Option(reader.read(0)).map(img => (img, fmt))
          } finally reader.dispose()
        } finally iis.close()
      } catch { case _: Exception => None }
    }

    /** Header + pixel decode: (width, height, channels, format). */
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, String)] =
      decodeBuffered(bytes).map { case (img, fmt) =>
        (img.getWidth, img.getHeight, img.getRaster.getNumBands, fmt)
      }

    /** Decode + resample to `w x h` RGB and return the raw interleaved
      * pixel bytes (3 per pixel) — the model-input contract (decode ->
      * resize -> normalize, `NB:202-209`): embedders consume PIXELS, never
      * the container bytes. */
    def decodePixels(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeBuffered(bytes).map { case (img, _) =>
        val scaled = scaleRgb(img, w, h)
        val px = new Array[Byte](w * h * 3)
        var y = 0
        var o = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = scaled.getRGB(x, y)
            px(o) = ((rgb >> 16) & 0xff).toByte
            px(o + 1) = ((rgb >> 8) & 0xff).toByte
            px(o + 2) = (rgb & 0xff).toByte
            x += 1; o += 3
          }
          y += 1
        }
        px
      }

    /** Resample to `(w, h)` and re-encode as PNG; None on undecodable
      * input (row dropped by [[resized]], reference semantics). */
    def resize(bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      decodeBuffered(bytes).map { case (img, _) =>
        val out = new ByteArrayOutputStream()
        ImageIO.write(scaleRgb(img, w, h), "png", out)
        out.toByteArray
      }

    private def scaleRgb(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val dst = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      dst
    }

    /** STUB — video frame sampling at `everyNth`; the JDK ships no video
      * codec, so the fake slices fixed-size byte windows. A real decoder
      * (e.g. an FFI wrapper) replaces only this body. */
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.isEmpty) Seq.empty
      else bytes.grouped(256).zipWithIndex
        .collect { case (g, i) if i % everyNth == 0 => g }.toSeq

    /** REAL audio header decode — JDK-built-in `javax.sound.sampled`
      * (WAV/AIFF/AU): (sampleRate, channels, bitsPerSample, frames);
      * None for bytes no installed reader accepts. */
    def decodeAudioMeta(bytes: Array[Byte]): Option[(Int, Int, Int, Long)] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          Some((f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, ais.getFrameLength))
        } finally ais.close()
      } catch { case _: Exception => None }
    }

    /** REAL PCM decode to mono float samples in [-1, 1]: channels averaged,
      * 16-bit little-endian signed (the WAV default this engine writes and
      * the overwhelmingly common interchange form); None for undecodable
      * bytes or non-PCM16 encodings. */
    def decodeSamplesMono(bytes: Array[Byte]): Option[Array[Float]] = {
      if (bytes == null || bytes.length == 0) return None
      try {
        val ais = javax.sound.sampled.AudioSystem
          .getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val f = ais.getFormat
          if (f.getSampleSizeInBits != 16 || f.isBigEndian) return None
          val ch = f.getChannels
          val raw = ais.readAllBytes()
          val frames = raw.length / (2 * ch)
          val out = new Array[Float](frames)
          var n = 0
          while (n < frames) {
            var acc = 0.0f
            var c = 0
            while (c < ch) {
              val o = (n * ch + c) * 2
              acc += (((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort / 32768.0f)
              c += 1
            }
            out(n) = acc / ch
            n += 1
          }
          Some(out)
        } finally ais.close()
      } catch { case _: Exception => None }
    }
  }

  /** Decode metadata for a binary image column; undecodable rows dropped
    * (reference semantics). Batch shape: one partition at a time, codec
    * state amortized per partition. */
  def withImageMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = df.schema.add(StructField("image_meta", imageMetaSchema))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.decodeImage(r.getAs[Array[Byte]](idx)).map { case (w, h, c, f) =>
          Row.fromSeq(r.toSeq :+ Row(w, h, c, f))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Resize a binary image column to fixed dims (thumbnailing / model-input
    * prep). Map-only, no shuffle; undecodable rows dropped. */
  def resized(df: DataFrame, w: Int, h: Int,
      contentCol: String = "content"): DataFrame = {
    val schema = df.schema.add(StructField("resized", BinaryType))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.resize(r.getAs[Array[Byte]](idx), w, h)
          .map(b => Row.fromSeq(r.toSeq :+ b))
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType), StructField("channels", IntegerType),
    StructField("bits", IntegerType), StructField("frames", LongType),
    StructField("duration_sec", DoubleType)))

  /** Decode metadata for a binary audio column (REAL `javax.sound.sampled`
    * WAV/AIFF/AU header decode); undecodable rows dropped, same drop-on-
    * failure contract as [[withImageMeta]]. Map-only, no shuffle. */
  def withAudioMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = df.schema.add(StructField("audio_meta", audioMetaSchema))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.decodeAudioMeta(r.getAs[Array[Byte]](idx)).map {
          case (sr, ch, bits, frames) =>
            Row.fromSeq(r.toSeq :+ Row(sr, ch, bits, frames,
              frames.toDouble / sr))
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Signal-level audio features over the decoded mono PCM — RMS energy,
    * peak amplitude, zero-crossing rate — the audio analog of the image
    * featurizer's pixel contract: features consume SAMPLES, never container
    * bytes. Undecodable / non-PCM16 rows dropped. */
  def withAudioFeatures(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = df.schema
      .add(StructField("rms", DoubleType))
      .add(StructField("peak", DoubleType))
      .add(StructField("zcr", DoubleType))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.decodeSamplesMono(r.getAs[Array[Byte]](idx))
          .filter(_.nonEmpty).map { s =>
            var sq = 0.0; var peak = 0.0; var zc = 0L
            var i = 0
            while (i < s.length) {
              val v = s(i).toDouble
              sq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              if (i > 0 && (s(i) >= 0) != (s(i - 1) >= 0)) zc += 1
              i += 1
            }
            Row.fromSeq(r.toSeq :+ math.sqrt(sq / s.length) :+ peak :+
              zc.toDouble / s.length)
          }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Explode sampled video frames into one row per frame. Frame explosion
    * multiplies rows — repartition after if frames feed a heavy stage. */
  def sampledFrames(df: DataFrame, everyNth: Int,
      contentCol: String = "content"): DataFrame = {
    val base = df.schema.add(StructField("frame_idx", IntegerType))
      .add(StructField("frame", BinaryType))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        MediaCodec.sampleFrames(r.getAs[Array[Byte]](idx), everyNth)
          .zipWithIndex.map { case (f, i) => Row.fromSeq(r.toSeq :+ i :+ f) }
      }
    }(org.apache.spark.sql.Encoders.row(base))
  }
}
