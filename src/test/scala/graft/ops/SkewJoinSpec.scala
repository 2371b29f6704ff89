package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {

  test("salted join returns exactly the plain-join result") {
    import spark.implicits._
    // skewed: 90% of rows share key 1
    val big = ((1 to 900).map(i => (1L, s"hot$i")) ++
      (1 to 100).map(i => (i.toLong % 7 + 2, s"cold$i"))).toDF("k", "v")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("sk", "dim")
    val plain = big.join(small, big("k") === small("sk")).drop("sk")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val salted = SkewJoin.saltedJoin(big, small, "k", "sk", salts = 8)
      .drop("sk").collect().map(_.toSeq).toSeq.sortBy(_.toString)
    salted shouldBe plain
  }

  test("salting spreads a hot key across reducers") {
    import spark.implicits._
    val big = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val salts = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    salts should be >= 6L // hot key fans out over most of the 8 buckets
  }

  test("left join keeps unmatched big-side rows exactly once") {
    import spark.implicits._
    val big = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "v")
    val small = Seq((1L, "dim1")).toDF("sk", "dim")
    val out = SkewJoin.saltedJoin(big, small, "k", "sk", salts = 4, "left")
    out.count() shouldBe 2
    out.filter($"k" === 99L).select("dim").head().isNullAt(0) shouldBe true
  }
}
