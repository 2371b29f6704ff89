package graft.expressions

import graft.SparkSpec
import graft.ops.Layout
import org.apache.spark.sql.functions._

class LayoutExpressionsSpec extends SparkSpec {

  test("ZMortonQuantile matches the Scala mirror on random values and " +
      "duplicate-heavy random knots (codegen + interpreted eval)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // knots with deliberate duplicate runs (heavy quantile collisions)
    def knots(): Seq[Double] = {
      val raw = Seq.fill(9)(rnd.nextInt(20).toDouble).sorted
      raw
    }
    val breaks = Seq(knots(), knots())
    val pts = Seq.fill(500)((rnd.nextDouble() * 40 - 10,
      rnd.nextDouble() * 40 - 10))
    val df = pts.toDF("x", "y")
    val z = Layout.zOrderValueQuantile(Seq($"x", $"y"), breaks, bits = 10)
    // codegen (wholestage on) and forced-interpreted (codegen off) paths
    // must both match the mirror
    for (flag <- Seq("true", "false")) {
      val prev = spark.conf.get("spark.sql.codegen.wholeStage")
      try {
        spark.conf.set("spark.sql.codegen.wholeStage", flag)
        df.select($"x", $"y", z.as("z")).collect().foreach { r =>
          r.getLong(2) shouldBe Layout.zOrderValueQuantileScala(
            Seq(r.getDouble(0), r.getDouble(1)), breaks, bits = 10)
        }
      } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
  }

  test("ZMortonQuantile: any null input yields a null z-value") {
    import spark.implicits._
    val breaks = Seq(Seq(0.0, 1.0, 2.0), Seq(0.0, 1.0, 2.0))
    val df = Seq((Some(1.0), Some(1.0)), (None, Some(1.0)),
      (Some(1.0), None), (None, None)).toDF("x", "y")
    val out = df.select(Layout.zOrderValueQuantile(
      Seq($"x", $"y"), breaks, bits = 4).as("z")).collect()
    out.map(_.isNullAt(0)).toSeq shouldBe Seq(false, true, true, true)
  }
}
