package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The property q77 rides on: unioning per-part HLL sketches equals
  * sketching the whole — rollups over persisted sketches lose nothing vs
  * rescanning, at any cardinality regime. */
class HllMergeSpec extends SparkSpec {

  test("union of per-part sketches == sketch of the whole (estimation regime)") {
    import spark.implicits._
    // 80k rows over 25k distinct ids, split into 10 parts
    val df = (0L until 80000L).map(i => (i % 10, (i * 2654435761L) % 25000))
      .toDF("part", "id")
    val merged = df.groupBy($"part").agg(hll_sketch_agg($"id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head().getLong(0)
    val direct = df.agg(hll_sketch_estimate(hll_sketch_agg($"id")))
      .head().getLong(0)
    merged shouldBe direct
    // and the estimate itself is within HLL error of the true 25k
    merged.toDouble shouldBe 25000.0 +- 25000.0 * 0.05
  }

  test("sparse regime: estimates are exact at small cardinality") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 4, i % 150)).toDF("part", "id")
    val merged = df.groupBy($"part").agg(hll_sketch_agg($"id").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")))
      .head().getLong(0)
    merged shouldBe 150L
  }
}
