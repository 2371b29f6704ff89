package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MgSketchSpec extends SparkSpec {

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int) =
    df.agg(SketchExpressions.mgTopK(col("term"), cap).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  // Zipf-ish stream: term i appears 2^(10-i) times, i in 0..9 (N = 2046)
  private lazy val zipf = {
    import spark.implicits._
    (0 until 10).flatMap(i => Seq.fill(1 << (10 - i))(s"t$i"))
      .toDF("term")
  }

  test("capacity >= distinct items gives exact counts (any partitioning)") {
    val exact = zipf.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sketch(zipf, 16) shouldBe exact
    sketch(zipf.repartition(7), 16) shouldBe exact
    sketch(zipf.repartition(1), 16) shouldBe exact
  }

  test("MG bounds hold in the lossy regime: never over, undercount <= N/(k+1)") {
    val exact = zipf.groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = zipf.count()
    val cap = 4
    val est = sketch(zipf.repartition(5), cap)
    est.foreach { case (t, c) =>
      c should be <= exact(t)
      (exact(t) - c).toDouble should be <= n.toDouble / (cap + 1)
    }
    // every true heavy hitter (count > N/(k+1) ~ 409) must survive:
    // t0 (1024) and t1 (512)
    est.keySet should contain allOf ("t0", "t1")
  }

  test("nulls are ignored and empty input yields an empty sketch") {
    import spark.implicits._
    val df = Seq(Some("a"), None, Some("a"), None).toDF("term")
    sketch(df, 4) shouldBe Map("a" -> 2L)
    sketch(Seq.empty[String].toDF("term"), 4) shouldBe Map.empty
  }

  test("output is sorted by count desc then term asc") {
    import spark.implicits._
    val df = Seq("b", "b", "a", "a", "c").toDF("term")
    val rows = df.agg(SketchExpressions.mgTopK(col("term"), 8).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    rows shouldBe Seq(("a", 2L), ("b", 2L), ("c", 1L))
  }

  test("mg_topk is callable from SQL (GraftExtensions surface)") {
    graft.GraftFunctions.register(spark)
    zipf.createOrReplaceTempView("mg_zipf")
    val rows = spark.sql(
      "SELECT explode(mg_topk(term, 16)) AS e FROM mg_zipf")
      .select(col("e.term"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows("t0") shouldBe 1024L
    rows("t9") shouldBe 2L
    // literal-capacity guard
    val err = intercept[Exception] {
      spark.sql("SELECT mg_topk(term, length(term)) FROM mg_zipf").collect()
    }
    err.getMessage should include("literal capacity")
  }

  test("mg_topk aggregates under Structured Streaming (mergeable state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[String]
    val sdf = stream.toDF().toDF("term")
      .agg(SketchExpressions.mgTopK(col("term"), 16).as("hh"))
    val q = sdf.writeStream.format("memory").queryName("mg_stream")
      .outputMode("complete").start()
    // two separate micro-batches: the final sketch must merge incremental
    // buffer state across them, not recompute from scratch
    stream.addData("a", "a", "b")
    q.processAllAvailable()
    stream.addData("a", "c")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("mg_stream")
      .select(explode(col("hh")).as("e"))
      .select(col("e.term"), col("e.count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("a" -> 3L, "b" -> 1L, "c" -> 1L)
  }

  test("partial aggregation: the plan carries the sketch, not the terms") {
    // TypedImperativeAggregate runs map-side partial + reduce-side final:
    // the exchange ships <= capacity counters per partition, not rows
    val plan = zipf.repartition(6)
      .agg(SketchExpressions.mgTopK(col("term"), 8))
      .queryExecution.executedPlan.toString
    plan should include("partial_mg_topk")
    plan should include("mg_topk")
  }
}
