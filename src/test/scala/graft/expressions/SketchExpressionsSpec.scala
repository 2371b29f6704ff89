package graft.expressions

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class SketchExpressionsSpec extends SparkSpec {

  test("minhash signature: deterministic, right length, identical sets match") {
    import spark.implicits._
    val df = Seq(
      Seq("a", "b", "c"), Seq("a", "b", "c"), Seq("x", "y", "z"), Seq.empty[String])
      .toDF("sh")
    val sigs = df.select(SketchExpressions.minhashSignature($"sh", 16))
      .collect().map(_.getSeq[Long](0))
    sigs.foreach(_.length shouldBe 16)
    sigs(0) shouldBe sigs(1) // identical input -> identical signature
    sigs(0) should not be sigs(2)
    sigs(3).forall(_ == Long.MaxValue) shouldBe true // empty set
  }

  test("minhash collision probability tracks jaccard (agreement fraction)") {
    import spark.implicits._
    // sets with jaccard 0.8 (8 common of 10) should agree on ~80% of slots
    val a = (1 to 8).map(i => s"w$i") ++ Seq("onlyA1", "onlyA2")
    val b = (1 to 8).map(i => s"w$i") ++ Seq("onlyB1", "onlyB2")
    val Seq(sa, sb) = Seq(a, b).map { s =>
      Seq(s).toDF("sh").select(SketchExpressions.minhashSignature($"sh", 256))
        .head().getSeq[Long](0)
    }
    val agree = sa.zip(sb).count { case (x, y) => x == y } / 256.0
    agree shouldBe (8.0 / 12.0) +- 0.15 // jaccard = 8/12
  }

  test("simhash64: identical token sets equal; eval and codegen agree") {
    import spark.implicits._
    val df = Seq("alpha beta gamma", "alpha beta gamma", "zzz qqq xxx")
      .toDF("t").select(SketchExpressions.simhash64(
        TextFunctions.tokens($"t")).as("sig"))
    val sigs = df.collect().map(_.getLong(0))
    sigs(0) shouldBe sigs(1)
    sigs(0) should not be sigs(2)
    // interpreted eval mirror agrees with the codegen'd column result
    val arr = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("alpha", "beta", "gamma").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    SimHash64(org.apache.spark.sql.catalyst.expressions.Literal(arr,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType))).eval(null) shouldBe sigs(0)
  }

  test("similar texts have small simhash hamming distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (3L, "completely unrelated words about database query optimization engines"))
      .toDF("id", "t")
      .select($"id", SketchExpressions.simhash64(TextFunctions.tokens($"t")).as("sig"))
    val sigs = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    ham(sigs(1L), sigs(2L)) should be < ham(sigs(1L), sigs(3L))
  }
}
