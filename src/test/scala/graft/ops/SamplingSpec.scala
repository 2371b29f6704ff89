package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val ids = {
    import spark.implicits._
    (0L until 20000L).toDF("id")
  }

  test("hashSample is deterministic and partitioning-invariant") {
    val a = Sampling.hashSample(ids, "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(ids.repartition(13), "id", 0.25)
      .collect().map(_.getLong(0)).toSet
    a shouldBe b
  }

  test("hashSample rate concentrates near the target (binomial bound)") {
    // n=20000, p=0.25: 5 sigma ~ 306
    val n = Sampling.hashSample(ids, "id", 0.25).count()
    n.toDouble shouldBe 5000.0 +- 350.0
  }

  test("samples nest: rate r1 < r2 gives a strict subset") {
    val small = Sampling.hashSample(ids, "id", 0.1)
      .collect().map(_.getLong(0)).toSet
    val big = Sampling.hashSample(ids, "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    small.subsetOf(big) shouldBe true
    small.size should be < big.size
  }

  test("stratifiedHashSample applies per-stratum rates") {
    import spark.implicits._
    val df = (0L until 30000L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "s")
    val out = Sampling.stratifiedHashSample(df, "id", "s",
      Map("a" -> 0.5), defaultRate = 0.05)
    val byS = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byS("a").toDouble shouldBe 5000.0 +- 350.0 // 10000 * 0.5
    byS("b").toDouble shouldBe 1000.0 +- 250.0 // 20000 * 0.05
  }

  test("stratified sample of a stratum equals the uniform sample at its rate") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (i, "only")).toDF("id", "s")
    val strat = Sampling.stratifiedHashSample(df, "id", "s",
      Map("only" -> 0.2), defaultRate = 0.9)
      .collect().map(_.getLong(0)).toSet
    val unif = Sampling.hashSample(df, "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    strat shouldBe unif
  }

  test("hashSample plans as a scan-level filter: no shuffle, no sort") {
    val plan = Sampling.hashSample(ids, "id", 0.25)
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "Sort"
  }

  test("thresholdHex rejects rates outside [0,1)") {
    an[IllegalArgumentException] should be thrownBy Sampling.thresholdHex(1.0)
    an[IllegalArgumentException] should be thrownBy Sampling.thresholdHex(-0.1)
    Sampling.thresholdHex(0.5) shouldBe "8000"
    Sampling.thresholdHex(0.0) shouldBe "0000"
  }
}
