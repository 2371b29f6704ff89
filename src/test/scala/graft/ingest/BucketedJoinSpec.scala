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

  test("partitioned layout prunes partitions at the file-listing level") {
    // the other half of storage-layout design at 100 TB: date/tenant
    // partitioning turns predicates on the partition column into directory
    // pruning — files of other partitions are never LISTED, let alone read
    import org.apache.spark.sql.functions.{col, input_file_name, year}
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    try {
      val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
        .withColumn("yr", year(col("o_orderdate")))
      o.write.mode("overwrite").partitionBy("yr").parquet(dir)

      val pruned = spark.read.parquet(dir).filter(col("yr") === 1996)
      val p = pruned.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the predicate lands in PartitionFilters (metadata pruning), not in
      // PushedFilters (which would still open every file)
      p should include("PartitionFilters")
      p should include regex "PartitionFilters: \\[[^\\]]*yr[^\\]]*1996"
      // and only the matching partition's files are scanned
      val scannedFiles = pruned.select(input_file_name()).distinct()
        .collect().map(_.getString(0))
      scannedFiles should not be empty
      all(scannedFiles) should include("yr=1996")
      // result parity with the unpartitioned filter
      pruned.count() shouldBe o.filter(col("yr") === 1996).count()
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
