package graft

/** Floor assertion for [[Recall]]: every ANN family at its DEFAULT
  * operating point must deliver recall@5/@10 >= 0.9 on the resolvable
  * perturbed corpus (sigma = 0.1 — within-cluster rank gaps above the
  * 8-bit quantizer resolution; see Recall.measure's scaladoc for why the
  * sigma = 0.02 dedup-density corpus is a documented envelope, not a
  * floor case). Small-scale twin of the RECALL_r6.json artifact run
  * (which measured the 200k corpus: all families 0.93-1.0). */
class RecallSpec extends SparkSpec {

  test("recall@5 and @10 >= 0.9 for every ANN family at default " +
      "operating points (20k perturbed corpus)") {
    // reps = 40 keeps the artifact's cluster-size-to-cell geometry
    // (~100 replicas per 32-cell corpus at 200k ≙ ~40 per cell-load
    // here); a 10-replica cluster against 32 cells is a different —
    // artificially hostile — geometry
    val results = Recall.measure(spark, TestSpark.sf0001, reps = 40,
      nQueries = 16, sigma = 0.1)
    results should have size 5
    results.foreach { case (family, (r5, r10)) =>
      withClue(s"$family recall@5=$r5 recall@10=$r10: ") {
        r5 should be >= 0.9
        r10 should be >= 0.9
      }
    }
  }

  test("IVF-routed MaxSim recall@5 and @10 >= 0.9 at nProbe 4 of 32 " +
      "cells (docs = replica clusters of the perturbed corpus)") {
    val (r5, r10) = Recall.maxSimRecall(spark, TestSpark.sf0001,
      reps = 40, nQueries = 16, sigma = 0.1)
    withClue(s"maxsim recall@5=$r5 recall@10=$r10: ") {
      r5 should be >= 0.9
      r10 should be >= 0.9
    }
  }

  test("operatingPoint derives nCells ~ sqrt(n) pow2-clamped, constant " +
      "probe fraction") {
    import graft.ops.SimilaritySearch.operatingPoint
    operatingPoint(100) shouldBe
      graft.ops.SimilaritySearch.IvfOperatingPoint(16, 4, 16, 2)
    operatingPoint(200000) shouldBe
      graft.ops.SimilaritySearch.IvfOperatingPoint(256, 32, 16, 2)
    operatingPoint(2000000) shouldBe
      graft.ops.SimilaritySearch.IvfOperatingPoint(1024, 128, 16, 2)
    operatingPoint(1000000000000L).nCells shouldBe 65536
    // monotone in n, and the probe fraction never exceeds 25%
    val pts = Seq(1L, 1000L, 1000000L, 1000000000L).map(operatingPoint)
    pts.map(_.nCells) shouldBe sorted
    pts.foreach(p => p.nProbe.toDouble / p.nCells should be <= 0.25)
  }

  /** A replication-scaled base (the ScaleUp sf>=1 shape: byte-identical
    * duplicate vectors) at test scale: sf0.001's 500 vectors x 4. */
  private def duplicatedBase(m: Int): String = {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files
      .createTempDirectory("recall-dup-base").toString
    val base = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")
    (0 until m).map(r => base.withColumn("vec_id",
        col("vec_id") + lit(r * 500L)))
      .reduce(_ union _)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("spread centers restore the floor on a duplicated base at the " +
      "derived operating point (the RECALL_sf1 protocol at test scale)") {
    import graft.ops.SimilaritySearch.operatingPoint
    val dir = duplicatedBase(m = 4)
    // reps = 25 keeps the artifact's k-to-cluster-size margin: ground
    // truth is the best 10 OF 25 members (order-statistic margin inside
    // the probed cells), as at artifact scale (10 of 100) — reps = k
    // would demand the cluster's worst off-axis outlier be probed too
    val op = operatingPoint(2000L * 25) // 4x500 base, reps=25
    val results = Recall.measure(spark, dir, reps = 25, nQueries = 8,
      sigma = 0.1, op.nCells, op.nProbe, op.pqRefine, op.sqRefine,
      spreadSigma = 0.5, families = Set("ivf", "pq"))
    results should have size 2
    results.foreach { case (family, (r5, r10)) =>
      withClue(s"$family recall@5=$r5 recall@10=$r10: ") {
        r5 should be >= 0.9
        r10 should be >= 0.9
      }
    }
  }

  test("deep refine covers the duplicate mass: k*refine >= 2x the " +
      "dup_mult*reps cluster recovers the floor on the UNSPREAD corpus") {
    import graft.ops.SimilaritySearch.operatingPoint
    val dir = duplicatedBase(m = 4)
    val op = operatingPoint(2000L * 10)
    // the main()'s demoRefine formula: nextPow2(ceil(m * reps * 2 / k))
    val refine = Integer.highestOneBit(
      math.max(1, math.ceil(4 * 10 * 2.0 / 10).toInt) * 2 - 1)
    refine shouldBe 8 // k*refine = 80 >= 2 * 40
    val results = Recall.measure(spark, dir, reps = 10, nQueries = 8,
      sigma = 0.1, op.nCells, op.nProbe, pqRefine = refine,
      spreadSigma = 0.0, families = Set("pq"))
    val (_, (r5, r10)) = results.head
    withClue(s"pq_refine$refine recall@5=$r5 recall@10=$r10: ") {
      r5 should be >= 0.9
      r10 should be >= 0.9
    }
  }
}
