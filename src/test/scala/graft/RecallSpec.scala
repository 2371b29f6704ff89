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
    // measure()'s defaults ARE the serving defaults — derived from the
    // corpus size since round 11 (128 cells / 16 probes at 20k rows),
    // so this floor gates what a no-args user actually gets
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

  test("IVF-routed MaxSim recall@5 and @10 >= 0.9 at the derived " +
      "operating point (docs = replica clusters of the perturbed corpus)") {
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

  test("refine -1 sentinel resolves to the certified depths, agreeing " +
      "across every serving surface (VERDICT r11 task 2)") {
    import graft.ops.SimilaritySearch._
    // the single source of truth all -1 defaults resolve against
    resolveRefine(-1, PqRefineCertified) shouldBe 16
    resolveRefine(-1, SqRefineCertified) shouldBe 2
    resolveRefine(48, PqRefineCertified) shouldBe 48 // explicit wins
    // operatingPoint's depths ARE those constants — no second copy to
    // drift (the r11 split-brain: knnJoinIvfPq defaulted 8 vs the
    // certified 16)
    operatingPoint(1000).pqRefine shouldBe PqRefineCertified
    operatingPoint(1000).sqRefine shouldBe SqRefineCertified
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

  test("a DEFAULT-built 2M-row index delivers recall@10 >= 0.9: derived " +
      "geometry is the serving default, not a harness-only option") {
    import graft.ops.SimilaritySearch
    import org.apache.spark.sql.functions._
    // the exact corpus size RECALL_sf1 measured the old fixed defaults
    // collapsing at (~0.25 recall) — a user typing buildIvf()/searchIvf()
    // with no geometry args must get the derived operating point instead
    val reps = 4000 // 500-vector base -> 2,000,000 rows
    val n = 500L * reps
    val corpus = Recall
      .perturbedCorpus(spark, TestSpark.sf0001, reps = reps, sigma = 0.1)
      .persist()
    val idx = graft.index.VectorIndex.build(corpus, "recall_default_2m",
      "vec_id", "embedding")
    try {
      idx.buildIvf() // NO geometry args anywhere in this test
      idx.ivfCells shouldBe Some(SimilaritySearch.operatingPoint(n).nCells)
      val queries = Recall.centers(spark, TestSpark.sf0001, 0.0)
        .filter(col("vec_id") < 8).persist()
      val exact = SimilaritySearch.knnJoin(queries, corpus,
          "vec_id", "vec_id", "embedding", k = 10, viaAggregator = true)
        .select(col("query_id"), col("vec_id")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
        .toMap
      val qvs = queries.orderBy("vec_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      val recalls = qvs.map { case (qid, qv) =>
        val got = idx.searchIvf(qv, k = 10) // NO nProbe: derived fraction
          .select(col("vec_id").cast("long")).collect()
          .map(_.getLong(0)).toSet
        (exact(qid) & got).size.toDouble / 10
      }
      queries.unpersist()
      val r10 = recalls.sum / recalls.length
      withClue(s"default-built 2M index recall@10=$r10: ") {
        r10 should be >= 0.9
      }
    } finally {
      corpus.unpersist()
      graft.index.VectorIndexCatalog.drop("recall_default_2m")
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
