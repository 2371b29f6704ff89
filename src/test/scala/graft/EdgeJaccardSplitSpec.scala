package graft

/** Pins Bench.edgeJaccardSplit — the x_split_q97 measurement mirror that
  * materializes the triangle set and flushes dirty pages at the
  * wedge/attach boundary (VERDICT r13 task 5) — to the engine operator it
  * replicates: same rows as GraphOps.edgeJaccard over the q97 pipeline,
  * and a boundary hook that actually fires after the wedge phase. A
  * drifted replica would grade a different computation under the q97
  * name, which is exactly the claim/artifact divergence this round
  * exists to make impossible. */
class EdgeJaccardSplitSpec extends SparkSpec {

  test("x_split_q97 mirror computes exactly GraphOps.edgeJaccard over " +
      "the q97 pipeline, and the boundary hook fires once") {
    import org.apache.spark.sql.functions.col
    var hookFires = 0
    val (split, wedgeSec) = Bench.edgeJaccardSplit(spark, TestSpark.sf0001,
      () => hookFires += 1)
    val engine = graft.queries.GraftQueries
      .all("q97_edge_jaccard")(spark, TestSpark.sf0001)
      .select(col("part_a").as("u"), col("part_b").as("v"),
        col("common"), col("jaccard"))
    hookFires shouldBe 1
    wedgeSec should be > 0.0
    split.count() shouldBe engine.count()
    // exact row-set equality both directions (counts alone could mask a
    // swap); common/jaccard are exact-long / integer-valued-double
    // arithmetic, so no tolerance is needed
    split.exceptAll(engine).count() shouldBe 0L
    engine.exceptAll(split).count() shouldBe 0L
  }
}
