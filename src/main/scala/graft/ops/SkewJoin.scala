package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit salting for skewed equi-joins — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skewed side is the output
  * of a cached stage) or the skew is known ahead of time.
  *
  * Shape: the skewed (big) side gets a random salt in [0, salts); the small
  * side is replicated `salts` times with every salt value; the join key
  * becomes (key, salt). One hot key's rows now spread across `salts`
  * reducers instead of one. Cost: small side shuffles `salts` x its size —
  * keep `salts` modest (8-32) and the small side genuinely small.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // right/full outer would emit each unmatched SMALL-side row once per
    // salt replica — `salts`x duplication; only joins that never surface
    // unmatched small-side rows are sound under replication
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
        allowed.contains(joinType.toLowerCase),
      s"saltedJoin does not support '$joinType': unmatched small-side rows " +
        "would be duplicated per salt (use AQE skew handling for outer joins)")
    // deterministic pseudo-random salt derived from the row, not rand():
    // keeps the operator reproducible and retry-safe (a task retry with
    // rand() could double-count rows)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("__salt") === replicated("__salt"),
        joinType)
      .drop("__salt")
  }
}
