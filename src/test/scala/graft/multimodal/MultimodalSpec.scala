package graft.multimodal

import graft.SparkSpec
import graft.ingest.BinaryIngest
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

class MultimodalSpec extends SparkSpec {

  private def encode(w: Int, h: Int, fmt: String, seed: Int = 0): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y * 7 + seed * 101) & 0xffffff)
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def binDf = {
    import spark.implicits._
    Seq(
      ("/img/a.png", encode(40, 30, "png")),
      ("/img/b.jpg", encode(64, 48, "jpg", seed = 1)),
      ("/img/broken.jpg", Array[Byte](1, 2, 3, 4, 5)) // not an image
    ).toDF("path", "content")
  }

  test("withImageMeta: real decode gives exact dims/format; undecodable dropped") {
    val out = Multimodal.withImageMeta(binDf)
    out.count() shouldBe 2 // broken row dropped (reference None semantics)
    val rows = out.collect().map { r =>
      val m = r.getStruct(r.fieldIndex("image_meta"))
      r.getString(0) -> ((m.getInt(0), m.getInt(1), m.getInt(2), m.getString(3)))
    }.toMap
    rows("/img/a.png") shouldBe ((40, 30, 3, "png"))
    rows("/img/b.jpg") shouldBe ((64, 48, 3, "jpeg"))
  }

  test("resized: output re-decodes at the exact target size; undecodable dropped") {
    val out = Multimodal.resized(binDf, 12, 9)
    out.count() shouldBe 2 // broken row dropped
    val a = out.filter(out("path") === "/img/a.png")
      .head().getAs[Array[Byte]]("resized")
    Multimodal.MediaCodec.decodeImage(a) shouldBe Some((12, 9, 3, "png"))
    // deterministic
    val again = Multimodal.resized(binDf, 12, 9)
    again.filter(again("path") === "/img/a.png")
      .head().getAs[Array[Byte]]("resized").toSeq shouldBe a.toSeq
  }

  test("decodePixels: w*h*3 RGB bytes from decoded pixels, None on junk") {
    val px = Multimodal.MediaCodec.decodePixels(encode(10, 8, "png"), 6, 4)
    px.isDefined shouldBe true
    px.get.length shouldBe 6 * 4 * 3
    Multimodal.MediaCodec.decodePixels("junk".getBytes, 6, 4) shouldBe None
  }

  test("image fixtures: every fixture decodes at its declared dims; corrupt drops") {
    val dir = ImageFixtures.ensure()
    val out = Multimodal.withImageMeta(
      BinaryIngest.scan(spark, dir, "*.{png,jpg}"))
    // the corrupt fixture is scanned but dropped by decode
    out.count() shouldBe ImageFixtures.images.size
    val got = out.collect().map { r =>
      val m = r.getStruct(r.fieldIndex("image_meta"))
      new java.io.File(r.getString(0)).getName ->
        ((m.getInt(0), m.getInt(1), m.getString(3)))
    }.toMap
    ImageFixtures.images.foreach { case (name, w, h, fmt) =>
      got(name) shouldBe ((w, h, fmt))
    }
  }

  test("sampledFrames: explodes every-nth frame with indexes (video stub)") {
    import spark.implicits._
    val df = Seq(
      ("/v/a.bin", Array.tabulate[Byte](600)(_.toByte)),
      ("/v/b.bin", Array.tabulate[Byte](1200)(i => (i * 3).toByte))
    ).toDF("path", "content")
    val out = Multimodal.sampledFrames(df, everyNth = 2)
    // a: 600B -> 3 chunks -> frames 0,2 kept = 2; b: 1200B -> 5 chunks -> 3
    out.count() shouldBe 5
    out.select("frame_idx").collect().map(_.getInt(0)).max should be >= 1
  }

  test("binary ingest scan: schema parity with binaryFile + scheme strip") {
    val df = BinaryIngest.scan(spark, "/root/testdata/sf0.001", "*.parquet")
    df.columns.toSet shouldBe Set("path", "modificationTime", "length", "content")
    df.count() shouldBe 10
    all(df.select("path").collect().map(_.getString(0))) should startWith("/root/")
  }

  test("dense ids: 0..n-1 in path order (NB:236-237 enumerate parity)") {
    val df = BinaryIngest.withDenseIds(
      BinaryIngest.scan(spark, "/root/testdata/sf0.001", "*.parquet"))
    val ids = df.orderBy("path").select("image_id")
      .collect().map(_.getLong(0)).toSeq
    ids shouldBe (0L until 10L)
  }

  test("audio: real WAV decode recovers the fixture spec; corrupt dropped") {
    val dir = AudioFixtures.ensure()
    val out = Multimodal.withAudioMeta(BinaryIngest.scan(spark, dir, "*.wav"))
    val rows = out.select("path", "audio_meta.sample_rate",
        "audio_meta.channels", "audio_meta.bits", "audio_meta.frames")
      .collect()
      .map(r => (new java.io.File(r.getString(0)).getName,
        r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))).toSet
    rows shouldBe AudioFixtures.clips
      .map { case (n, sr, ch, f) => (n, sr, ch, 16, f) }.toSet
    // 7 files on disk, corrupt one dropped by decode
    BinaryIngest.scan(spark, dir, "*.wav").count() shouldBe 7
    out.count() shouldBe 6
  }

  test("audio features: sine-wave RMS ~ A/sqrt(2), zcr ~ 2f/sr") {
    val dir = AudioFixtures.ensure()
    val feats = Multimodal.withAudioFeatures(
        BinaryIngest.scan(spark, dir, "*.wav"))
      .select("path", "rms", "peak", "zcr").collect()
      .map(r => new java.io.File(r.getString(0)).getName ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    feats.size shouldBe 6
    AudioFixtures.clips.zipWithIndex.foreach { case ((name, sr, _, _), idx) =>
      val (rms, peak, zcr) = feats(name)
      val a = AudioFixtures.amplitude / 32768.0
      // full periods per clip -> analytic sine stats (quantization ~1e-4)
      rms shouldBe (a / math.sqrt(2.0)) +- 0.01
      peak shouldBe a +- 0.01
      zcr shouldBe (2.0 * AudioFixtures.freqOf(idx) / sr) +- 0.01
    }
  }

  test("embedImages: distributed embed keeps schema and drops failures") {
    import spark.implicits._
    val embedder = new graft.embed.DeterministicEmbedder(16)
    val df = BinaryIngest.withDenseIds(
      Seq(("/x/a.png", encode(24, 18, "png")),
        ("/x/bad.bin", Array.tabulate[Byte](100)(_.toByte)))
        .toDF("path", "content"))
    val out = BinaryIngest.embedImages(df, embedder, version = 5L)
    out.columns.toSeq shouldBe Seq("image_id", "filepath", "embedding", "version")
    out.count() shouldBe 1 // undecodable content embeds to None -> dropped
    out.head().getSeq[Float](2).length shouldBe 16
  }
}
