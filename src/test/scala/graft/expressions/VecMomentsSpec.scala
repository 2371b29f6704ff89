package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecMomentsSpec extends SparkSpec {

  private def moments(df: org.apache.spark.sql.DataFrame)
      : (Long, Seq[Double], Seq[Double]) = {
    val r = df.agg(SketchExpressions.vecMoments(col("v")).as("m"))
      .select("m.n", "m.sum", "m.sumsq").head()
    (r.getLong(0), r.getSeq[Double](1), r.getSeq[Double](2))
  }

  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    (0 until 500).map(_ => Array.fill(16)(rnd.nextFloat() * 2 - 1))
  }

  test("matches the driver replay; partitioning moves only float ulps") {
    import spark.implicits._
    val df = vecs.toDF("v")
    val (n, s, q) = moments(df)
    n shouldBe 500L
    val wantS = (0 until 16).map(i => vecs.map(_(i).toDouble).sum)
    val wantQ = (0 until 16).map(i =>
      vecs.map(x => x(i).toDouble * x(i).toDouble).sum)
    (0 until 16).foreach { i =>
      s(i) shouldBe wantS(i) +- 1e-9
      q(i) shouldBe wantQ(i) +- 1e-9
    }
    val (n2, s2, q2) = moments(df.repartition(13))
    n2 shouldBe 500L
    (0 until 16).foreach { i =>
      s2(i) shouldBe s(i) +- 1e-9; q2(i) shouldBe q(i) +- 1e-9
    }
  }

  test("double input, null rows skipped, empty input yields n=0") {
    import spark.implicits._
    val df = Seq(Some(Seq(1.0, 2.0)), None, Some(Seq(3.0, 4.0)))
      .toDF("v")
    val (n, s, q) = moments(df)
    n shouldBe 2L
    s shouldBe Seq(4.0, 6.0)
    q shouldBe Seq(10.0, 20.0)
    val (n0, s0, _) = moments(Seq.empty[Seq[Double]].toDF("v"))
    n0 shouldBe 0L
    s0 shouldBe empty
  }

  test("ragged dimensions fail loudly, never truncate") {
    import spark.implicits._
    val df = Seq(Seq(1.0, 2.0), Seq(3.0)).toDF("v")
    val e = intercept[Exception] {
      df.agg(SketchExpressions.vecMoments(col("v"))).collect()
    }
    e.getMessage should include("ragged")
  }

  test("partial aggregation: the exchange carries moment buffers") {
    import spark.implicits._
    val plan = vecs.toDF("v").repartition(6)
      .agg(SketchExpressions.vecMoments(col("v")))
      .queryExecution.executedPlan.toString
    plan should include("partial_vec_moments")
  }

  test("vectorProfile: mean/variance per dim equal the explicit formula") {
    import spark.implicits._
    val got = graft.ops.TableStats.vectorProfile(vecs.toDF("v"), "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    got.keySet shouldBe (0L until 16L).toSet
    (0 until 16).foreach { i =>
      val xs = vecs.map(_(i).toDouble)
      val mean = xs.sum / xs.size
      val variance = xs.map(x => x * x).sum / xs.size - mean * mean
      val (n, m, v) = got(i.toLong)
      n shouldBe 500L
      m shouldBe mean +- 1e-9
      v shouldBe variance +- 1e-9
    }
  }
}
