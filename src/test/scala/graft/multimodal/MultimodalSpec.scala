package graft.multimodal

import graft.SparkSpec
import graft.ingest.BinaryIngest

class MultimodalSpec extends SparkSpec {

  private def binDf = {
    import spark.implicits._
    Seq(
      ("/img/a.jpg", Array.tabulate[Byte](600)(_.toByte)),
      ("/img/b.jpg", Array.tabulate[Byte](1200)(i => (i * 3).toByte)),
      ("/img/broken.jpg", Array[Byte](1, 2)) // undecodable: < 4 bytes
    ).toDF("path", "content")
  }

  test("withImageMeta: typed metadata struct; undecodable rows dropped") {
    val out = Multimodal.withImageMeta(binDf)
    out.count() shouldBe 2 // broken row dropped (reference None semantics)
    val r = out.filter(out("path") === "/img/a.jpg").head()
    val meta = r.getStruct(r.fieldIndex("image_meta"))
    meta.getInt(0) should be > 0 // width
    meta.getInt(1) should be > 0 // height
    Seq("jpeg", "png") should contain(meta.getString(3))
  }

  test("resized: map-only, one row per input, deterministic") {
    val out = Multimodal.resized(binDf, 128, 128)
    out.count() shouldBe 3
    val a1 = out.filter(out("path") === "/img/a.jpg")
      .head().getAs[Array[Byte]]("resized")
    val again = Multimodal.resized(binDf, 128, 128)
    val a2 = again.filter(again("path") === "/img/a.jpg")
      .head().getAs[Array[Byte]]("resized")
    a1.toSeq shouldBe a2.toSeq
  }

  test("sampledFrames: explodes every-nth frame with indexes") {
    val out = Multimodal.sampledFrames(binDf, everyNth = 2)
    // a: 600B -> 3 chunks -> frames 0,2 kept = 2; b: 1200B -> 5 chunks -> 3
    // broken: 2B -> 1 chunk -> 1
    out.count() shouldBe 6
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

  test("embedImages: distributed embed keeps schema and drops failures") {
    import spark.implicits._
    val embedder = new graft.embed.DeterministicEmbedder(16)
    val df = BinaryIngest.withDenseIds(
      Seq(("/x/a.bin", Array.tabulate[Byte](100)(_.toByte)),
        ("/x/bad.bin", Array.empty[Byte])).toDF("path", "content"))
    val out = BinaryIngest.embedImages(df, embedder, version = 5L)
    out.columns.toSeq shouldBe Seq("image_id", "filepath", "embedding", "version")
    out.count() shouldBe 1 // empty content embeds to None -> dropped
    out.head().getSeq[Float](2).length shouldBe 16
  }
}
