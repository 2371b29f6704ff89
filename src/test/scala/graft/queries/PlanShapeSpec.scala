package graft.queries

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.execution.ExplainMode

/** Plan-shape guards: the physical properties the 100 TB design depends on,
  * asserted so a regression fails tests rather than only showing up in
  * BENCH numbers. */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String = {
    // other specs cache DataFrames over the same parquet; the cache manager
    // would substitute InMemoryTableScan and hide the parquet PushedFilters
    spark.sqlContext.clearCache()
    GraftQueries.all(name)(spark, TestSpark.sf0001)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q02: every predicate reaches the parquet scan; schema pruned") {
    val p = plan("q02_filter_pushdown")
    p should include("PushedFilters")
    p should include("GreaterThanOrEqual(l_shipdate")
    p should include("LessThan(l_quantity,24.0)")
    // only the 4 referenced columns are read
    p should include("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp")
    (p should not).include("l_orderkey")
  }

  test("q03: dimension tables broadcast, no shuffle join") {
    val p = plan("q03_join_agg")
    p should include("BroadcastHashJoin")
    (p should not).include("SortMergeJoin")
  }

  test("q04/q11: top-k plans as TakeOrderedAndProject, not a global sort") {
    plan("q04_topk_orders") should include("TakeOrderedAndProject")
    val p11 = plan("q11_vec_topk")
    p11 should include("TakeOrderedAndProject")
    p11 should include("BroadcastNestedLoopJoin") // 1-row query side broadcast
  }

  test("q11: corpus-side scan prunes to pk + vector and pushes the query-row filter") {
    val p = plan("q11_vec_topk")
    p should include("EqualTo(vec_id,0)") // query-side scan filter pushed
    p should include("ReadSchema: struct<vec_id:bigint,embedding:array<float>>")
  }

  test("q12: knn join broadcasts the query relation") {
    plan("q12_knn_join") should include("BroadcastNestedLoopJoin")
  }

  test("q33: dense-id ingest never funnels through a single-partition exchange") {
    (plan("q33_image_pipeline") should not).include("SinglePartition")
  }
}
