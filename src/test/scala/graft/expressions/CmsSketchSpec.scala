package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CmsSketchSpec extends SparkSpec {

  private val depth = 4
  private val width = 256

  private def sketchOf(df: org.apache.spark.sql.DataFrame): Array[Long] =
    df.agg(SketchExpressions.cmsSketch(col("term"), depth, width).as("sk"))
      .head().getSeq[Long](0).toArray

  private def estOf(df: org.apache.spark.sql.DataFrame,
      probes: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    val sk = df.agg(
      SketchExpressions.cmsSketch(col("term"), depth, width).as("sk"))
    probes.toDF("term").crossJoin(broadcast(sk))
      .select(col("term"), SketchExpressions.cmsEstimate(col("sk"),
        col("term"), depth, width).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  // Zipf-ish stream: term i appears 2^(10-i) times, i in 0..9 (N = 2046)
  private lazy val zipf = {
    import spark.implicits._
    (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"t$i"))
      .toDF("term")
  }

  test("counters are partitioning-invariant (sums, unlike MG evictions)") {
    val a = sketchOf(zipf.repartition(1))
    val b = sketchOf(zipf.repartition(13))
    b shouldBe a
    a.sum shouldBe depth * 2046L // each update touches one counter per row
  }

  test("never undercounts; overcount within the epsilon bound") {
    val exact = zipf.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = 2046L
    // e*N/width at e=2.718, width=256: ~21.7 per row; the min over 4 rows
    // holds with prob 1 - e^-4 per key — deterministic here, just assert
    val est = estOf(zipf.repartition(5), exact.keys.toSeq)
    est.foreach { case (t, c) =>
      c should be >= exact(t)
      (c - exact(t)).toDouble should be <= 2.718 * n / width
    }
    // an absent key's estimate is pure collision mass, inside the same bound
    val ghost = estOf(zipf, Seq("never-seen"))("never-seen")
    ghost.toDouble should be <= 2.718 * n / width
  }

  test("DataFrame estimate equals the driver-side SketchHash replay " +
      "(codegen and interpreted paths agree with the statics)") {
    val sk = sketchOf(zipf)
    def replay(t: String): Long = {
      val u = UTF8String.fromString(t)
      (0 until depth).map(r =>
        sk(r * width + SketchHash.cmsIndex(u, r, width))).min
    }
    val probes = (0 until 10).map(i => s"t$i") :+ "never-seen"
    val viaDf = estOf(zipf, probes)
    probes.foreach { t => viaDf(t) shouldBe replay(t) }
  }

  test("partial aggregation: the exchange carries counter matrices, not rows") {
    val plan = zipf.repartition(6)
      .agg(SketchExpressions.cmsSketch(col("term"), depth, width))
      .queryExecution.executedPlan.toString
    plan should include("partial_cms_sketch")
    plan should include("cms_sketch")
  }

  test("guards: wrong input type, bad shape parameters") {
    import spark.implicits._
    an[Exception] should be thrownBy
      Seq(1L).toDF("term")
        .agg(SketchExpressions.cmsSketch(col("term"), depth, width))
        .collect()
    an[IllegalArgumentException] should be thrownBy
      CmsSketch(null, 0, width)
    an[IllegalArgumentException] should be thrownBy
      CmsSketch(null, depth, -1)
  }
}
