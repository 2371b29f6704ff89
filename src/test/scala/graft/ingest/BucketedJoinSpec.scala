package graft.ingest

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.execution.ExplainMode

/** Bucketing: pre-shuffling fact tables on the join key at write time so
  * repeated joins are co-located — at 100 TB this converts every
  * lineitem⋈orders into a zero-Exchange merge of pre-sorted buckets. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt.lineitem_b")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt.orders_b")

    // disable broadcast so the join must pick sort-merge; bucketing should
    // then satisfy the distribution with zero shuffle
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bkt.lineitem_b")
        .join(spark.table("graft_bkt.orders_b"),
          spark.table("graft_bkt.lineitem_b")("l_orderkey") ===
            spark.table("graft_bkt.orders_b")("o_orderkey"))
      val p = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      p should include("SortMergeJoin")
      // no Exchange feeding the join: bucket layout satisfies distribution
      (p should not).include("Exchange hashpartitioning")
      // result parity with the plain join
      joined.count() shouldBe li.join(o,
        li("l_orderkey") === o("o_orderkey")).count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE graft_bkt.lineitem_b")
      spark.sql("DROP TABLE graft_bkt.orders_b")
      spark.sql("DROP DATABASE graft_bkt")
    }
  }
}
