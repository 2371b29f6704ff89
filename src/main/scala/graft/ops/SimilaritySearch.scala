package graft.ops

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search as first-class relational operators over an
  * `array<float>` embedding column (the reference's `similarity_search`,
  * `Nomic MultiModal Retrieval.py:380-390`, generalized per SURVEY §2.4).
  *
  * Scale design: the query side is always the small side — broadcast it.
  * Corpus-side scoring is map-only (no shuffle); per-query top-k uses a
  * rank-over-window only when there are multiple queries, otherwise
  * `TakeOrderedAndProject`. The IVF variant prunes the corpus to the
  * closest centroid partitions before scoring, the standard ANN recall/cost
  * trade.
  */
object SimilaritySearch {

  /** Single-query exact top-k: broadcast scalar query vector, map-only
    * scoring, per-partition heaps (`TakeOrderedAndProject`). */
  def topK(corpus: DataFrame, pk: String, vecCol: String,
      query: Array[Float], k: Int): DataFrame =
    corpus.withColumn("score", cosineUnit(col(vecCol), vecLit(query)))
      .orderBy(desc("score"), col(pk))
      .limit(k)
      .drop(vecCol)

  /** Multi-query exact k-NN join: broadcast the (small) query relation
    * against the corpus, score map-side, rank per query. Deterministic
    * tie-break on corpus pk.
    *
    * Two physical strategies behind one result:
    *   - window (default): rank `row_number() over (partition by query)` —
    *     shuffles EVERY scored row to its query's partition before ranking;
    *     fine when the corpus is modest or k is a large fraction of it;
    *   - `viaAggregator = true`: [[TopKAggregator.knnAggregate]] — map-side
    *     partial aggregation reduces each partition to <= k rows per query
    *     BEFORE the shuffle, so the exchange carries O(k * partitions) rows
    *     per query instead of O(corpus). The scale path when corpus >>
    *     k * partitions (the common 100 TB shape); integer pks and the
    *     `(query_id, pk, score, rank)` projection only (re-attach other
    *     corpus columns by joining on pk afterwards). */
  def knnJoin(queries: DataFrame, corpus: DataFrame, qPk: String,
      cPk: String, vecCol: String, k: Int,
      viaAggregator: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val q = queries.select(col(qPk).as("query_id"), col(vecCol).as("__qv"))
    val scored = corpus.crossJoin(broadcast(q))
      .withColumn("score", cosineUnit(col(vecCol), $"__qv"))
    if (viaAggregator) {
      val tuples = scored.select($"query_id".cast("long"),
        col(cPk).cast("long"), $"score".cast("double")).as[(Long, Long, Double)]
      TopKAggregator.knnAggregate(tuples, k)
        .toDF("query_id", cPk, "score", "rank")
    } else {
      val w = Window.partitionBy($"query_id").orderBy(desc("score"), col(cPk))
      scored.withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .drop("__qv", vecCol)
    }
  }

  /** Threshold similarity join (all pairs above `minScore`), query side
    * broadcast. */
  def thresholdJoin(queries: DataFrame, corpus: DataFrame, qPk: String,
      cPk: String, vecCol: String, minScore: Double): DataFrame = {
    val q = queries.select(col(qPk).as("query_id"), col(vecCol).as("__qv"))
    corpus.crossJoin(broadcast(q))
      .withColumn("score", cosineUnit(col(vecCol), col("__qv")))
      .filter(col("score") >= minScore)
      .drop("__qv", vecCol)
  }

  /** IVF (inverted-file) index: kmeans-lite centroids computed from a
    * sample, every corpus row assigned to its nearest centroid. Search
    * probes only `nProbe` closest centroid cells — at 100 TB this is the
    * difference between scanning the corpus and scanning ~nProbe/nCells of
    * it. Returns the corpus with a `cell` column, plus the centroids. */
  def ivfBuild(corpus: DataFrame, pk: String, vecCol: String,
      nCells: Int = 16, seed: Long = 42L): (DataFrame, Array[Array[Float]]) = {
    // centroid init: deterministic sample, then one Lloyd step executor-side
    val sample = corpus.select(col(vecCol)).orderBy(xxhash64(col(pk), lit(seed)))
      .limit(nCells * 8).collect().map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "ivfBuild: empty corpus")
    // a corpus smaller than nCells gets one cell per row, not an exception
    val cells = math.min(nCells, sample.length)
    val init = sample.take(cells)
    val assigned = sample.map { v =>
      (init.indices.minBy(i => -dot(v, init(i))), v)
    }
    val centroids = assigned.groupBy(_._1).map { case (c, vs) =>
      val dim = vs.head._2.length
      val acc = new Array[Float](dim)
      vs.foreach { case (_, v) => var i = 0; while (i < dim) { acc(i) += v(i); i += 1 } }
      var i = 0
      while (i < dim) { acc(i) /= vs.length; i += 1 }
      c -> l2Normalize(acc)
    }
    val cents = (0 until cells).map(i => centroids.getOrElse(i, init(i))).toArray
    // codegen'd argmax over the centroid matrix (one loop per row; the
    // struct-array + sort_array formulation was interpreted per row)
    val indexed = corpus.withColumn("cell",
      graft.expressions.VectorExpressions.nearestCentroid(col(vecCol), cents))
    (indexed, cents)
  }

  /** IVF with distributed KMeans (Lloyd) centroids — the principled build
    * path when the corpus is too large for a driver-side sample to
    * represent: every per-row step runs as Spark jobs; only the k centroid
    * vectors (k * dim floats) ever visit the driver.
    *
    * The fit runs on a DISTRIBUTED sample of ~`fitRowsPerCell` rows per
    * cell (never collected): centroid quality needs row density per cell,
    * not the whole corpus, so fitting ~32k sampled rows instead of 200M
    * costs per-iteration work proportional to the sample while the
    * resulting cells partition the full corpus identically in expectation.
    *
    * Each Lloyd iteration is ONE `treeAggregate` job over a cached
    * `RDD[Array[Float]]` with the current centroids broadcast: executors
    * accumulate per-cell (sum, count) locally and ship k*dim doubles per
    * partition — the one place the engine drops to an RDD, because the
    * loop re-runs the SAME compiled closure with only the broadcast
    * changing (a Column-expression formulation re-embeds the centroid
    * matrix as literals and pays a janino compile of ~k*dim constants per
    * iteration; MLlib's KMeans adds k-means|| init — itself rounds of
    * distributed re-sampling — plus `ml.Vector` conversion; both measured
    * 3-5x slower at modest k). Iteration stops early when no centroid
    * moves more than `tol` (squared L2). */
  def ivfBuildKMeans(corpus: DataFrame, pk: String, vecCol: String,
      nCells: Int = 16, maxIter: Int = 5, seed: Long = 42L,
      fitRowsPerCell: Int = 1024, tol: Double = 1e-4)
      : (DataFrame, Array[Array[Float]]) = {
    import graft.expressions.VectorExpressions.nearestCentroid
    import graft.functions.VectorFunctions.l2Normalize
    val total = corpus.count()
    require(total > 0, "ivfBuildKMeans: empty corpus")
    val cells = math.min(nCells.toLong, total).toInt
    val target = cells.toLong * fitRowsPerCell
    val sampled =
      if (total <= target) corpus
      else corpus.sample(withReplacement = false,
        // small over-draw so the sample rarely lands under target
        math.min(1.0, target.toDouble / total * 1.05), seed)
    val fit = sampled.select(col(vecCol))
      .rdd.map(_.getSeq[Float](0).toArray).persist()
    // deterministic distributed seeded draw; ships k rows only
    var cents: Array[Array[Float]] = fit.takeSample(
      withReplacement = false, cells, seed)
    val dim = cents.head.length
    val sc = corpus.sparkSession.sparkContext
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val bc = sc.broadcast(cents)
      val (sums, counts) = fit.treeAggregate(
        (Array.fill(cells)(new Array[Double](dim)), new Array[Long](cells)))(
        seqOp = { case ((s, n), v) =>
          val cs = bc.value
          var best = 0; var bestDot = Double.MinValue; var c = 0
          while (c < cs.length) {
            var d = 0.0; var i = 0
            while (i < dim) { d += cs(c)(i) * v(i); i += 1 }
            if (d > bestDot) { bestDot = d; best = c }
            c += 1
          }
          var i = 0
          while (i < dim) { s(best)(i) += v(i); i += 1 }
          n(best) += 1
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var c = 0
          while (c < cells) {
            var i = 0
            while (i < dim) { s1(c)(i) += s2(c)(i); i += 1 }
            n1(c) += n2(c); c += 1
          }
          (s1, n1)
        })
      bc.destroy()
      // spherical k-means step: corpus vectors are unit-norm (engine
      // invariant, NB:209/376), so centroids are re-normalized each round
      // and the dot-argmax is a true cosine argmax. Empty cells keep
      // their previous centroid (same policy as ivfBuild).
      moved = 0.0
      (0 until cells).foreach { c =>
        if (counts(c) > 0) {
          val nn = l2Normalize(
            sums(c).map(x => (x / counts(c)).toFloat))
          val d = cents(c).zip(nn)
            .map { case (a, b) => (a - b).toDouble * (a - b) }.sum
          moved = math.max(moved, d)
          cents(c) = nn
        }
      }
      iter += 1
    }
    fit.unpersist()
    val indexed = corpus.withColumn("cell",
      nearestCentroid(col(vecCol), cents))
    (indexed, cents)
  }

  /** IVF probe: score only rows in the `nProbe` cells closest to the query.
    * Cell pruning happens before any vector math touches the corpus. */
  def ivfSearch(indexed: DataFrame, centroids: Array[Array[Float]],
      pk: String, vecCol: String, query: Array[Float], k: Int,
      nProbe: Int = 4): DataFrame = {
    val probeCells = centroids.indices
      .sortBy(i => -dot(query, centroids(i))).take(nProbe)
    indexed.filter(col("cell").isin(probeCells: _*))
      .withColumn("score", cosineUnit(col(vecCol), vecLit(query)))
      .orderBy(desc("score"), col(pk))
      .limit(k)
      .drop(vecCol)
  }
}
