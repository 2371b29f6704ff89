package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

class BloomExpressionsSpec extends SparkSpec {

  private def filterOf(items: Seq[Long], fpp: Double): Array[Byte] = {
    val bf = BloomFilter.create(items.size.toLong.max(1), fpp)
    items.foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos); bos.toByteArray
  }

  test("no false negatives, and fpp is roughly honored (codegen + " +
      "interpreted eval agree)") {
    import spark.implicits._
    val members = (0L until 2000L).map(_ * 7919L)
    val bytes = filterOf(members, fpp = 0.03)
    val nonMembers = (0L until 20000L).map(_ * 7919L + 3L)
    val df = (members ++ nonMembers).toDF("h")
    for (flag <- Seq("true", "false")) {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", flag)
        val hits = df.filter(
          BloomExpressions.bloomMightContainLong(col("h"), bytes))
          .collect().map(_.getLong(0)).toSet
        // sketch guarantee: every member passes
        members.foreach(m => assert(hits.contains(m)))
        // false positives bounded loosely (3% nominal; allow 3x slack)
        val fp = hits.size - members.size
        assert(fp <= nonMembers.size * 0.09,
          s"$fp false positives of ${nonMembers.size}")
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("null probe yields null, non-bigint probe is rejected") {
    import spark.implicits._
    val bytes = filterOf(Seq(1L, 2L), fpp = 0.01)
    val out = Seq(Some(1L), None).toDF("h")
      .select(BloomExpressions.bloomMightContainLong(col("h"), bytes).as("m"))
      .collect()
    out(0).getBoolean(0) shouldBe true
    out(1).isNullAt(0) shouldBe true
    an[Exception] should be thrownBy {
      Seq("a").toDF("s")
        .select(BloomExpressions.bloomMightContainLong(col("s"), bytes))
        .collect()
    }
  }
}
