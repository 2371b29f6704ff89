package graft.embed

import graft.SparkSpec
import graft.functions.VectorFunctions

class EmbedderSpec extends SparkSpec {

  val e = new DeterministicEmbedder(64)

  test("text embedding: deterministic, unit-norm, right dim") {
    val v1 = e.embedText("spark vector search")
    val v2 = e.embedText("spark vector search")
    v1.toSeq shouldBe v2.toSeq
    v1.length shouldBe 64
    VectorFunctions.norm(v1) shouldBe 1.0 +- 1e-5
  }

  test("different text gives different vectors; empty text is safe") {
    val a = e.embedText("cats on the beach")
    val b = e.embedText("database query planner")
    VectorFunctions.cosine(a, b) should be < 0.9
    e.embedText("").length shouldBe 64 // zero vector, no crash
  }

  test("query prefix convention (NB:399): forQuery != embedText") {
    val q = e.forQuery("something foresty")
    val t = e.embedText("something foresty")
    q.toSeq should not be t.toSeq
    q.toSeq shouldBe e.embedText("search_query: something foresty").toSeq
  }

  test("image embedding: real decode -> unit vector; undecodable -> None (NB:211-213)") {
    // a real in-memory PNG: decode must succeed and embed deterministically
    val img = new java.awt.image.BufferedImage(20, 14,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 20; y <- 0 until 14) img.setRGB(x, y, x * 31 + y * 7)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val bytes = out.toByteArray
    val v = e.embedImage(bytes)
    v.isDefined shouldBe true
    VectorFunctions.norm(v.get) shouldBe 1.0 +- 1e-5
    e.embedImage(bytes).get.toSeq shouldBe v.get.toSeq // deterministic
    // non-image bytes, empty, null: decode failure -> None, row dropped
    e.embedImage(Array.tabulate[Byte](300)(i => (i * 7).toByte)) shouldBe None
    e.embedImage(Array.empty[Byte]) shouldBe None
    e.embedImage(null) shouldBe None
  }

  test("tokenization is order-sensitive but bag-similar texts correlate") {
    val a = e.embedText("red widget small bolt")
    val b = e.embedText("small bolt red widget")
    // mean-pool over tokens: permutation-invariant by construction
    VectorFunctions.cosine(a, b) shouldBe 1.0 +- 1e-5
  }
}
