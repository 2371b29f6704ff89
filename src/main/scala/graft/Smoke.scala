package graft

import graft.embed.DeterministicEmbedder
import graft.index.{VectorIndex, VectorIndexCatalog}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end smoke demo: the flagship query path plus index lifecycle
  * (build -> search -> refresh with a version watermark). Run with
  * `sbt "runMain graft.Smoke"`. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println("== flagship entry ==")
    SparkEntry.entry(spark).show(truncate = false)

    println("== index lifecycle: refresh picks up new versioned rows ==")
    val src = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("version", lit(1L))
    val idx = VectorIndex.build(src, "smoke", "vec_id", "embedding")
    val qv = src.filter(col("vec_id") === 7)
      .select("embedding").head().getSeq[Float](0).toArray
    println(s"indexed ${idx.size} rows @ version ${idx.currentVersion}")
    idx.search(qv, k = 3).show()

    // simulate a CDF append: one changed row at version 2 (vec 7's vector
    // moved to vec 9999) and refresh
    val changed = src.filter(col("vec_id") === 7)
      .withColumn("vec_id", lit(9999L)).withColumn("version", lit(2L))
    idx.refresh(src.unionByName(changed))
    println(s"after refresh: ${idx.size} rows @ version ${idx.currentVersion}")
    idx.search(qv, k = 3).show() // expect 9999 tied at score 1.0

    println("== registry + data_array parity ==")
    println(VectorIndexCatalog.list.mkString(", "))
    println(VectorIndexCatalog.get("smoke").dataArray(qv, k = 2).mkString("; "))

    println("== salted skew join (orders heavily skewed to one customer) ==")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val skewed = orders.withColumn("o_custkey", lit(1L)) // force skew
    val joined = graft.ops.SkewJoin.saltedJoin(
      skewed, customer, "o_custkey", "c_custkey", salts = 8)
    println(s"salted join rows = ${joined.count()} (== ${skewed.count()} orders)")

    println("== dim-mismatch guard ==")
    try idx.search(Array(1.0f, 2.0f), k = 1).show()
    catch { case e: IllegalArgumentException => println(s"ok: ${e.getMessage}") }

    spark.stop()
  }
}
