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

  test("sorted_count_common on array<long>: codegen result, eval mirror, " +
      "and hashed-shingle count all agree with the string count") {
    import spark.implicits._
    import graft.expressions.VectorExpressions.sortedCountCommon
    // sorted long arrays straight through the codegen'd column path
    val longDf = Seq(
      (Seq(1L, 3L, 7L, 9L), Seq(3L, 7L, 11L)),
      (Seq(-5L, 0L, 2L), Seq(-5L, 0L, 2L)),
      (Seq(1L, 2L), Seq(3L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L))).toDF("a", "b")
    longDf.select(sortedCountCommon($"a", $"b")).collect().map(_.getInt(0))
      .toSeq shouldBe Seq(2, 3, 0, 0)
    // interpreted eval agrees with codegen
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val lit = (xs: Seq[Long]) =>
      Literal(ArrayData.toArrayData(xs.toArray), ArrayType(LongType))
    SortedCountCommon(lit(Seq(1L, 3L, 7L, 9L)), lit(Seq(3L, 7L, 11L)))
      .eval(null) shouldBe 2
    // the Dedup verify path's invariant: counting common sorted xxhash64
    // values equals counting common sorted strings (injective modulo
    // ~2^-65-probability collisions)
    val strDf = Seq(
      (Seq("alpha", "beta", "gamma", "delta"), Seq("beta", "delta", "zeta")))
      .toDF("a", "b")
    val hashed = strDf.select(
      sortedCountCommon(
        sort_array(transform($"a", t => xxhash64(t))),
        sort_array(transform($"b", t => xxhash64(t)))).as("h"),
      sortedCountCommon(sort_array($"a"), sort_array($"b")).as("s")).head()
    hashed.getInt(0) shouldBe hashed.getInt(1)
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
