package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  // type-7 (linear interpolation) percentile, the definition Spark's exact
  // percentile and DuckDB's quantile_cont share
  private def q7(sorted: Seq[Double], p: Double): Double = {
    val h = (sorted.size - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  private def fixture = {
    val rnd = new scala.util.Random(19)
    (0L until 300L).map(i => (i, s"g${i % 3}", rnd.nextInt(1000).toDouble))
  }

  test("quantileBand matches the type-7 definition per group") {
    import spark.implicits._
    val rows = fixture
    val bands = Quality.quantileBand(rows.toDF("id", "g", "v"), "g",
        col("v"), 0.25, 0.75)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    rows.groupBy(_._2).foreach { case (g, ks) =>
      val sorted = ks.map(_._3).sorted
      bands(g)._1 shouldBe q7(sorted, 0.25) +- 1e-9
      bands(g)._2 shouldBe q7(sorted, 0.75) +- 1e-9
    }
  }

  test("quantileGate keeps exactly the in-band rows (inclusive bounds)") {
    import spark.implicits._
    val rows = fixture
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ks) =>
      val sorted = ks.map(_._3).sorted
      val (lo, hi) = (q7(sorted, 0.25), q7(sorted, 0.75))
      ks.filter(r => r._3 >= lo && r._3 <= hi)
    }.map(_._1).toSet
    val out = Quality.quantileGate(rows.toDF("id", "g", "v"), "g",
        col("v"), 0.25, 0.75)
      .collect().map(_.getLong(0)).toSet
    out shouldBe expected
    // the band rows themselves are values from the data often enough here
    // that inclusivity matters: at least one group boundary row survives
    out.size should be < rows.size
  }

  test("approx mode tracks exact mode within sketch tolerance") {
    import spark.implicits._
    val rows = fixture
    val df = rows.toDF("id", "g", "v")
    val exact = Quality.quantileGate(df, "g", col("v"), 0.25, 0.75)
      .collect().map(_.getLong(0)).toSet
    val approx = Quality.quantileGate(df, "g", col("v"), 0.25, 0.75,
        exact = false)
      .collect().map(_.getLong(0)).toSet
    // high-accuracy sketch on 100-row groups: tiny symmetric difference
    val sym = (exact diff approx) ++ (approx diff exact)
    sym.size should be <= (rows.size / 20)
  }

  test("the corpus side never shuffles: band broadcasts onto the scan") {
    import spark.implicits._
    val df = fixture.toDF("id", "g", "v")
    val plan = Quality.quantileGate(df, "g", col("v"), 0.25, 0.75)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the only Exchange feeds the band AGGREGATION (grouped short keys) or
    // the broadcast itself — never a corpus-sized sort-merge join
    plan should not include "SortMergeJoin"
  }

  test("bad fractions fail loudly") {
    import spark.implicits._
    val df = fixture.toDF("id", "g", "v")
    an[IllegalArgumentException] should be thrownBy
      Quality.quantileBand(df, "g", col("v"), 0.75, 0.25)
    an[IllegalArgumentException] should be thrownBy
      Quality.quantileBand(df, "g", col("v"), -0.1, 0.5)
  }
}
