package graft.functions

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}
import org.apache.spark.sql.functions._

class VectorFunctionsSpec extends SparkSpec {

  val eps = 1e-9

  private def randUnit(rng: scala.util.Random, dim: Int): Array[Float] =
    V.l2Normalize(Array.fill(dim)(rng.nextFloat() * 2 - 1))

  test("dot / norm / cosine hand-computed") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(4.0f, -5.0f, 6.0f)
    V.dot(a, b) shouldBe (4.0 - 10.0 + 18.0) +- eps
    V.norm(a) shouldBe math.sqrt(14.0) +- eps
    V.cosine(a, a) shouldBe 1.0 +- eps
    V.l2Dist(a, b) shouldBe math.sqrt(9.0 + 49.0 + 9.0) +- eps
  }

  test("l2Normalize yields unit norm; layerNorm yields mean 0 / var 1") {
    val v = Array(3.0f, -1.0f, 2.0f, 8.0f)
    V.norm(V.l2Normalize(v)) shouldBe 1.0 +- 1e-6
    val ln = V.layerNorm(v)
    val mean = ln.map(_.toDouble).sum / ln.length
    val variance = ln.map(x => (x - mean) * (x - mean)).sum / ln.length
    mean shouldBe 0.0 +- 1e-6
    variance shouldBe 1.0 +- 1e-3 // eps in denominator skews slightly
  }

  test("maskedMeanPool weights by attention mask and clamps denominator") {
    val toks = Array(Array(2.0f, 4.0f), Array(10.0f, 20.0f), Array(6.0f, 8.0f))
    val pooled = V.maskedMeanPool(toks, Array(1, 0, 1))
    pooled(0) shouldBe 4.0f +- 1e-6f
    pooled(1) shouldBe 6.0f +- 1e-6f
    // all-masked: denominator clamped, no NaN (reference clamp, NB:367)
    val zero = V.maskedMeanPool(toks, Array(0, 0, 0))
    zero.foreach(x => assert(!x.isNaN))
  }

  test("property: unit-norm invariant, cosine self/symmetry (200 seeds)") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val dim = 2 + rng.nextInt(31)
      val a = randUnit(rng, dim)
      val b = randUnit(rng, dim)
      V.norm(a) shouldBe 1.0 +- 1e-4
      V.cosine(a, a) shouldBe 1.0 +- 1e-4
      V.cosine(a, b) shouldBe V.cosine(b, a) +- 1e-9
    }
  }

  test("property: cosine and L2 rank-equivalent on unit vectors") {
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val q = randUnit(rng, 8); val a = randUnit(rng, 8); val b = randUnit(rng, 8)
      val cosOrder = V.cosine(q, a) > V.cosine(q, b)
      val l2Order = V.l2Dist(q, a) < V.l2Dist(q, b)
      cosOrder shouldBe l2Order
    }
  }

  test("property: top-k prefix — topK(k) is a prefix of topK(k+1)") {
    val rng = new scala.util.Random(11)
    val corpus = (0 until 100).map(i => i -> randUnit(rng, 16))
    val q = randUnit(rng, 16)
    val ranked = corpus.sortBy { case (i, v) => (-V.cosine(q, v), i) }.map(_._1)
    (1 until 10).foreach { k =>
      ranked.take(k) shouldBe ranked.take(k + 1).take(k)
    }
  }

  test("Column implementations agree with Scala mirrors") {
    import spark.implicits._
    val data = Seq(
      (Array(1.0f, 2.0f, 2.0f), Array(0.5f, -0.5f, 1.0f)),
      (Array(-3.0f, 0.0f, 4.0f), Array(1.0f, 1.0f, 1.0f)))
    val got = data.toDF("a", "b").select(
      V.vecDot($"a", $"b").as("dot"),
      V.vecNorm($"a").as("norm"),
      V.cosine($"a", $"b").as("cos"),
      V.l2Dist($"a", $"b").as("dist"),
      V.l2Normalize($"a").as("unit"),
      V.layerNorm($"a").as("ln")).collect()
    got.zip(data).foreach { case (r, (a, b)) =>
      r.getDouble(0) shouldBe V.dot(a, b) +- eps
      r.getDouble(1) shouldBe V.norm(a) +- eps
      r.getDouble(2) shouldBe V.cosine(a, b) +- eps
      r.getDouble(3) shouldBe V.l2Dist(a, b) +- eps
      r.getSeq[Double](4).zip(V.l2Normalize(a)).foreach { case (c, s) =>
        c shouldBe s.toDouble +- 1e-6 }
      r.getSeq[Double](5).zip(V.layerNorm(a)).foreach { case (c, s) =>
        c shouldBe s.toDouble +- 1e-6 }
    }
  }

  test("meanPool column: element-wise mean of array-of-vectors") {
    import spark.implicits._
    val df = Seq(Seq(Array(1.0f, 3.0f), Array(3.0f, 5.0f))).toDF("vs")
    val out = df.select(V.meanPool($"vs")).head().getSeq[Double](0)
    out(0) shouldBe 2.0 +- eps
    out(1) shouldBe 4.0 +- eps
  }
}
