package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by per-partition batch operators.
  *
  * The Spark-side plumbing (schemas, mapPartitions batching, null-safe
  * decode-drop semantics mirroring the reference's `None` -> row-skip,
  * `Nomic MultiModal Retrieval.py:211-213, 239`) is real and tested; the
  * codec calls themselves are STUBBED behind [[MediaCodec]] with
  * deterministic fakes — image/audio libraries are not present in this
  * environment. Swapping in a real codec changes no plan shape.
  */
object Multimodal {

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("channels", IntegerType), StructField("format", StringType)))

  /** STUB decode boundary. Deterministic fakes derive pseudo-metadata and
    * pseudo-pixels from the bytes so plumbing is testable end-to-end. */
  object MediaCodec extends Serializable {
    /** Real impl: JPEG/PNG header parse + pixel decode. */
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Int, String)] = {
      if (bytes == null || bytes.length < 4) None // undecodable -> drop row
      else {
        val h = java.util.Arrays.hashCode(bytes)
        Some((64 + math.abs(h % 1920), 64 + math.abs((h / 7) % 1080), 3,
          if ((h & 1) == 0) "jpeg" else "png"))
      }
    }

    /** Real impl: resample to (w, h); fake returns a content hash so tests
      * can assert the call happened per-row with the right target size. */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](math.min(64, bytes.length))
      var i = 0
      while (i < out.length) { out(i) = (bytes(i) ^ (w + h)).toByte; i += 1 }
      out
    }

    /** Real impl: video frame sampling at `everyNth`; fake slices bytes. */
    def sampleFrames(bytes: Array[Byte], everyNth: Int): Seq[Array[Byte]] =
      if (bytes == null || bytes.isEmpty) Seq.empty
      else bytes.grouped(256).zipWithIndex
        .collect { case (g, i) if i % everyNth == 0 => g }.toSeq
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
    * prep). Map-only, no shuffle. */
  def resized(df: DataFrame, w: Int, h: Int,
      contentCol: String = "content"): DataFrame = {
    val schema = df.schema.add(StructField("resized", BinaryType))
    val idx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map(r => Row.fromSeq(r.toSeq :+ MediaCodec.resize(r.getAs[Array[Byte]](idx), w, h)))
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
