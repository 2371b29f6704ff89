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
}
