package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecTopKSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.agg(SketchExpressions.vecTopK(col("id"), col("score"), k).as("top"))
      .select(inline(col("top")))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

  // 200 (id, score) pairs with deliberate score ties (score = i % 37)
  private lazy val pairs = {
    import spark.implicits._
    (0L until 200L).map(i => (i, (i % 37).toDouble)).toDF("id", "score")
  }

  private def brute(k: Int) =
    (0L until 200L).map(i => (i, (i % 37).toDouble))
      .sortBy { case (id, s) => (-s, id) }.take(k)

  test("top-k equals the sorted-truncate order desc(score) asc(id), " +
      "under any partitioning (ties break to the lower id)") {
    topk(pairs, 10) shouldBe brute(10)
    topk(pairs.repartition(13), 10) shouldBe brute(10)
    topk(pairs.repartition(1), 10) shouldBe brute(10)
    // k beyond the input returns everything, still ordered
    topk(pairs.repartition(7), 500) shouldBe brute(500)
  }

  test("grouped top-k gives the kNN-join shape: per-group results match " +
      "per-group brute force") {
    import spark.implicits._
    val grouped = (0L until 300L).map(i => (i % 3, i, ((i * 7) % 53).toDouble))
      .toDF("g", "id", "score")
    val got = grouped.groupBy("g")
      .agg(SketchExpressions.vecTopK(col("id"), col("score"), 5).as("top"))
      .select(col("g"), inline(col("top")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    (0L until 3L).foreach { g =>
      val expect = (0L until 300L).filter(_ % 3 == g)
        .map(i => (i, ((i * 7) % 53).toDouble))
        .sortBy { case (id, s) => (-s, id) }.take(5)
      got(g) shouldBe expect
    }
  }

  test("nulls are ignored; empty input yields an empty array") {
    import spark.implicits._
    val df = Seq((Some(1L), Some(2.0)), (None, Some(9.0)), (Some(3L), None))
      .toDF("id", "score")
    topk(df, 5) shouldBe Seq((1L, 2.0))
    topk(Seq.empty[(Long, Double)].toDF("id", "score"), 5) shouldBe Seq.empty
  }

  test("partial aggregation: the exchange carries the k-bounded sketch, " +
      "not the input rows") {
    val agg = pairs.repartition(8)
      .agg(SketchExpressions.vecTopK(col("id"), col("score"), 10).as("top"))
    val plan = agg.queryExecution.executedPlan.toString
    // partial-then-final hash aggregate around the exchange — map-side
    // combine is what bounds the shuffle at O(k * partitions)
    plan should include("partial_vec_topk")
    plan should include("vec_topk")
  }

  test("vec_topk is callable from SQL (GraftExtensions surface) and " +
      "matches the Column-API result") {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    pairs.createOrReplaceTempView("vtk_pairs")
    val sql = spark.sql(
      """SELECT id, score FROM (
           SELECT inline(top) FROM (
             SELECT vec_topk(id, score, 10) AS top FROM vtk_pairs))""")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    sql shouldBe brute(10)
    // misuse fails with the descriptive message, not a ClassCastException
    val e = intercept[Exception] {
      spark.sql("SELECT vec_topk(id, score, 'ten') FROM vtk_pairs").collect()
    }
    e.getMessage should include("literal")
  }
}
