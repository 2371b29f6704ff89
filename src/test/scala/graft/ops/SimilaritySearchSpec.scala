package graft.ops

import graft.{SparkSpec, TestSpark}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

class SimilaritySearchSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf0001}/embeddings.parquet")
  private lazy val all = emb.select("vec_id", "embedding").collect()
    .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  test("topK matches driver-side brute force") {
    val qv = all(11L)
    val want = all.toSeq.map { case (id, v) => id -> VectorFunctions.dot(qv, v) }
      .sortBy { case (id, s) => (-s, id) }.take(7).map(_._1)
    val got = SimilaritySearch.topK(emb, "vec_id", "embedding", qv, 7)
      .collect().map(_.getLong(0)).toSeq
    got shouldBe want
  }

  test("knnJoin: per-query ranks agree with brute force") {
    val queries = emb.filter(col("vec_id") < 3)
    val got = SimilaritySearch.knnJoin(queries, emb, "vec_id", "vec_id",
      "embedding", k = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (0L until 3L).foreach { q =>
      val want = all.toSeq
        .map { case (id, v) => id -> VectorFunctions.dot(all(q), v) }
        .sortBy { case (id, s) => (-s, id) }.take(4).map(_._1)
      got(q).sorted shouldBe want.sorted
    }
  }

  test("knnJoin viaAggregator: identical (query, id, score, rank) tuples " +
      "to the window path") {
    val queries = emb.filter(col("vec_id") < 5)
    def tuples(viaAgg: Boolean) =
      SimilaritySearch.knnJoin(queries, emb, "vec_id", "vec_id",
        "embedding", k = 4, viaAggregator = viaAgg)
        .select(col("query_id"), col("vec_id"), col("score"),
          col("rank").cast("int"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .toSet
    tuples(viaAgg = true) shouldBe tuples(viaAgg = false)
  }

  test("thresholdJoin returns exactly the pairs above minScore") {
    val queries = emb.filter(col("vec_id") === 2)
    val want = all.toSeq
      .map { case (id, v) => id -> VectorFunctions.dot(all(2L), v) }
      .filter(_._2 >= 0.3).map(_._1).toSet
    val got = SimilaritySearch.thresholdJoin(queries, emb, "vec_id", "vec_id",
      "embedding", 0.3).collect().map(_.getAs[Long]("vec_id")).toSet
    got shouldBe want
  }

  test("IVF: cells partition the corpus; probe recall reasonable") {
    val (indexed, cents) = SimilaritySearch.ivfBuild(emb, "vec_id", "embedding",
      nCells = 8)
    indexed.count() shouldBe emb.count() // assignment is total
    cents.length shouldBe 8
    val qv = all(0L)
    val exact = SimilaritySearch.topK(emb, "vec_id", "embedding", qv, 5)
      .collect().map(_.getLong(0)).toSet
    // full probe == exact (sanity: pruning at nProbe=all loses nothing)
    val full = SimilaritySearch.ivfSearch(indexed, cents, "vec_id", "embedding",
      qv, 5, nProbe = 8).collect().map(_.getLong(0)).toSet
    full shouldBe exact
    // partial probe: top-1 (the self-match) must survive its own cell
    val part = SimilaritySearch.ivfSearch(indexed, cents, "vec_id", "embedding",
      qv, 5, nProbe = 2).collect().map(_.getLong(0)).toSet
    part should contain(0L)
  }

  test("IVF with distributed KMeans centroids: total assignment, full probe exact") {
    val (indexed, cents) = SimilaritySearch.ivfBuildKMeans(emb, "vec_id",
      "embedding", nCells = 8, maxIter = 3)
    indexed.count() shouldBe emb.count()
    cents.length shouldBe 8
    val qv = all(4L)
    val exact = SimilaritySearch.topK(emb, "vec_id", "embedding", qv, 5)
      .collect().map(_.getLong(0)).toSet
    SimilaritySearch.ivfSearch(indexed, cents, "vec_id", "embedding", qv, 5,
      nProbe = 8).collect().map(_.getLong(0)).toSet shouldBe exact
  }
}
