package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the headline queries — the
  * plan-review loop (pushdown reaching the scan, broadcasts chosen, codegen
  * spans). `sbt "runMain graft.Plans [sfDir] [query...]"`. */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_agg_pricing", "q02_filter_pushdown", "q03_join_agg",
        "q04_topk_orders", "q11_vec_topk", "q13_embed_dedup_pairs",
        "q15_jaccard_pairs")
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
