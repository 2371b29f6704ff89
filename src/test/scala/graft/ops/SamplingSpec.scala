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

  test("weightedSamplePerKey matches a driver-side A-ES draw") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val rows = (0L until 400L).map(i =>
      (i, s"s${i % 4}", 1L + rnd.nextInt(200).toLong))
    // driver-side mirror of the exact key math (same 52-bit u, float cast)
    def key(id: Long, w: Long): Float = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(13)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4503599627370496.0
      math.pow(u, 1.0 / w).toFloat
    }
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ks) =>
      ks.sortBy { case (id, _, w) => (-key(id, w), id) }.take(7)
    }.map(_._1).toSet
    val out = Sampling.weightedSamplePerKey(rows.toDF("id", "s", "w"),
        "id", "s", col("w"), n = 7)
      .collect().map(_.getLong(0)).toSet
    out shouldBe expected
  }

  test("weightedSamplePerKey inclusion scales with weight (statistical)") {
    import spark.implicits._
    // two weight classes, 10x apart; heavy rows must win most slots
    val rows = (0L until 2000L).map(i =>
      (i, "one", if (i % 2 == 0) 100L else 10L))
    val picked = Sampling.weightedSamplePerKey(rows.toDF("id", "s", "w"),
        "id", "s", col("w"), n = 200)
      .collect().map(_.getLong(0))
    picked.length shouldBe 200
    val heavy = picked.count(_ % 2 == 0)
    // E[heavy] ~ 178 of 200 under without-replacement weighted draw;
    // a generous floor separates it from the unweighted 100
    heavy should be > 150
  }

  test("weightedSamplePerKey is partitioning-invariant") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, s"s${i % 3}", (i % 23) + 1))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSamplePerKey(df, "id", "s", col("w"), 11)
        .collect().map(_.getLong(0)).toSet
    run(rows.toDF("id", "s", "w")) shouldBe
      run(rows.toDF("id", "s", "w").repartition(13))
  }

  test("capPerKeyBudget matches a driver-side greedy walk") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (0L until 500L).map(i =>
      (i, s"k${i % 7}", 1L + rnd.nextInt(40).toLong))
    val budget = 100L
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ks) =>
      var cum = 0L
      ks.sortBy(_._1).takeWhile { r => cum += r._3; cum <= budget }
    }.map(_._1).toSet

    val out = Sampling.capPerKeyBudget(rows.toDF("id", "k", "w"),
        "k", "id", col("w"), budget)
      .collect().map(_.getLong(0)).toSet
    out shouldBe expected
  }

  test("capPerKeyBudget boundary: a row landing exactly on the budget is kept") {
    import spark.implicits._
    val df = Seq((1L, "a", 60L), (2L, "a", 40L), (3L, "a", 1L))
      .toDF("id", "k", "w")
    Sampling.capPerKeyBudget(df, "k", "id", col("w"), 100L)
      .collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
  }

  test("capPerKeyBudget is partitioning-invariant (retry-stable)") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, s"k${i % 5}", (i % 13) + 1))
    val a = Sampling.capPerKeyBudget(rows.toDF("id", "k", "w"),
      "k", "id", col("w"), 200L).collect().map(_.getLong(0)).toSet
    val b = Sampling.capPerKeyBudget(rows.toDF("id", "k", "w").repartition(17),
      "k", "id", col("w"), 200L).collect().map(_.getLong(0)).toSet
    a shouldBe b
  }

  test("capPerKeyBudget plans exactly one exchange (the key shuffle)") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, s"k${i % 5}", 1L)).toDF("id", "k", "w")
    val plan = Sampling.capPerKeyBudget(df, "k", "id", col("w"), 50L)
      .queryExecution.executedPlan.toString
    // one hash exchange on the key feeds the window sort; no second shuffle
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("rendezvousShard: in range, deterministic, partition-invariant") {
    val a = ids.select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.values.foreach { s => s should be >= 0L; s should be < 8L }
    val b = ids.repartition(13).select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    b shouldBe a
    // every shard gets work, and no shard hogs: 20k keys over 8 shards,
    // binomial 5-sigma band around 2500
    val byShard = a.values.groupBy(identity).view.mapValues(_.size)
    byShard.size shouldBe 8
    byShard.values.foreach(n => n.toDouble shouldBe 2500.0 +- 250.0)
  }

  test("rendezvousShard: dropping the last shard moves ONLY its keys " +
      "(minimal disruption, the property mod-hashing lacks)") {
    val with8 = ids.select(col("id"),
        Sampling.rendezvousShard(col("id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val with7 = ids.select(col("id"),
        Sampling.rendezvousShard(col("id"), 7).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    with8.foreach { case (id, s8) =>
      if (s8 < 7) with7(id) shouldBe s8 // survivors keep their argmax
      else with7(id) should be < 7L     // orphans land on a runner-up
    }
    // contrast: mod-hashing would move ~(n-1)/n of ALL keys on the resize
    val moved = with8.count { case (id, s8) => with7(id) != s8 }
    moved shouldBe with8.count(_._2 == 7L)
  }

  test("rendezvousShard rejects a non-positive shard count") {
    an[IllegalArgumentException] should be thrownBy
      Sampling.rendezvousShard(col("id"), 0)
  }

  private def shuffled(ids: Seq[Long], seed: String, nShards: Int)
      : Map[Long, (Long, Long)] = {
    import spark.implicits._
    Sampling.shuffleShard(ids.toDF("id"), "id", seed, nShards)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
  }

  test("shuffleShard: positions are dense 1..n per shard, every row " +
      "addressed once, and the two-pass rank equals the naive window") {
    import spark.implicits._
    val ids = (0L until 500L)
    val got = shuffled(ids, "s1", 8)
    got.keySet shouldBe ids.toSet
    // dense per-shard positions
    got.values.groupBy(_._1).foreach { case (_, addrs) =>
      addrs.map(_._2).toSeq.sorted shouldBe (1L to addrs.size)
    }
    // naive single-exchange window formulation as the in-engine mirror
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("skey"), col("id"))
    val naive = ids.toDF("id")
      .select(col("id"), Sampling.rendezvousShard(col("id"), 8).as("shard"),
        md5(concat(lit("s1:"), col("id").cast("string"))
          .cast("binary")).as("skey"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(3)))
      .toMap
    got shouldBe naive
  }

  test("shuffleShard is deterministic under input repartitioning and " +
      "seed-sensitive; resharding preserves surviving relative order") {
    import spark.implicits._
    val ids = (0L until 300L)
    val a = shuffled(ids, "s1", 8)
    val b = {
      val df = ids.toDF("id").repartition(13)
      Sampling.shuffleShard(df, "id", "s1", 8)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
    }
    b shouldBe a
    shuffled(ids, "s2", 8) should not be a
    // drop the last shard: keys staying in a shard keep their relative
    // order (the HRW minimal-disruption story carried into positions)
    val c = shuffled(ids, "s1", 7)
    (0 until 7).foreach { s =>
      val before = a.toSeq.filter(_._2._1 == s).sortBy(_._2._2).map(_._1)
      val after = c.toSeq.filter(_._2._1 == s).sortBy(_._2._2).map(_._1)
      val survivors = before.filter(after.contains)
      after.filter(survivors.contains) shouldBe survivors
    }
  }
}
