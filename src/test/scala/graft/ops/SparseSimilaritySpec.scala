package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SparseSimilaritySpec extends SparkSpec {

  // driver-side brute-force TF-IDF cosine: the spec oracle
  private def bruteNeighbors(docs: Seq[(Long, String)], k: Int,
      maxDfFraction: Double): Seq[(Long, Long, Float, Long)] = {
    val n = docs.size.toDouble
    val tf = docs.map { case (id, txt) =>
      id -> txt.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .groupBy(identity).map { case (t, xs) => t -> xs.length }
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity)
      .map { case (t, xs) => t -> xs.size }
    val kept = df.filter { case (_, d) => d.toDouble <= n * maxDfFraction }
    val w = tf.map { case (id, m) =>
      id -> m.collect { case (t, f) if kept.contains(t) =>
        t -> f.toDouble * math.log((n + 1.0) / (kept(t) + 1.0)) }
    }
    val norm = w.map { case (id, m) =>
      id -> math.sqrt(m.values.map(x => x * x).sum) }
    val ids = docs.map(_._1)
    val sym = for {
      a <- ids; b <- ids if a != b
      shared = w(a).keySet intersect w(b).keySet if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(t => w(a)(t) * w(b)(t)).sum
      (a, b, (dot / (norm(a) * norm(b))).toFloat)
    }
    sym.groupBy(_._1).toSeq.flatMap { case (id, nbrs) =>
      nbrs.sortBy { case (_, nb, c) => (-c, nb) }.take(k).zipWithIndex
        .map { case ((_, nb, c), i) => (id, nb, c, (i + 1).toLong) }
    }
  }

  private val docs = Seq(
    (1L, "spark shuffle join agg join"),
    (2L, "spark shuffle join agg"),
    (3L, "duck oracle compare compare hash"),
    (4L, "duck oracle compare hash hash hash"),
    (5L, "spark duck join compare"),
    (6L, "tokens terms spark spark spark"),
    (7L, "isolated vocabulary entirely disjoint"))

  test("tfidfNeighbors matches the driver brute force (no prune)") {
    import spark.implicits._
    val got = SparseSimilarity.tfidfNeighbors(docs.toDF("id", "text"),
        "id", "text", k = 3, maxDfFraction = 1.0)
      .as[(Long, Long, Float, Long)].collect().toSet
    got shouldBe bruteNeighbors(docs, 3, 1.0).toSet
  }

  test("df band prunes head terms and the brute force agrees") {
    import spark.implicits._
    // 'spark' appears in 4/7 docs (4/7 > 0.5): pruned at 0.5
    val got = SparseSimilarity.tfidfNeighbors(docs.toDF("id", "text"),
        "id", "text", k = 2, maxDfFraction = 0.5)
      .as[(Long, Long, Float, Long)].collect().toSet
    got shouldBe bruteNeighbors(docs, 2, 0.5).toSet
    // doc 6 shares ONLY 'spark' with others — with 'spark' pruned it must
    // have no neighbors at all (and appear in no one else's list)
    got.map(_._1) should not contain 6L
    got.map(_._2) should not contain 6L
  }

  test("docs with no shared surviving term are absent, not zero-scored") {
    import spark.implicits._
    val got = SparseSimilarity.tfidfNeighbors(docs.toDF("id", "text"),
        "id", "text", k = 3, maxDfFraction = 1.0)
      .as[(Long, Long, Float, Long)].collect()
    got.map(_._1) should not contain 7L
    got.map(_._2) should not contain 7L
  }

  test("ranks are dense from 1 and bounded by k per doc") {
    import spark.implicits._
    val got = SparseSimilarity.tfidfNeighbors(docs.toDF("id", "text"),
        "id", "text", k = 2, maxDfFraction = 1.0)
      .as[(Long, Long, Float, Long)].collect()
    got.groupBy(_._1).values.foreach { nbrs =>
      nbrs.map(_._4).sorted shouldBe (1L to nbrs.length.toLong)
      nbrs.length should be <= 2
    }
  }

  test("empty and single-doc inputs give empty output") {
    import spark.implicits._
    SparseSimilarity.tfidfNeighbors(
      Seq.empty[(Long, String)].toDF("id", "text"), "id", "text")
      .count() shouldBe 0L
    SparseSimilarity.tfidfNeighbors(
      Seq((1L, "alone doc")).toDF("id", "text"), "id", "text")
      .count() shouldBe 0L
  }

  test("degenerate-vocabulary guard measures candidate mass (the q113 contract)") {
    import spark.implicits._
    // degenerate corpus: every doc shares the same 2-token vocabulary, so
    // Σ df² = 2·N² / ... > 0.1·N² and the contract line trips
    val degen = (1L to 40L).map(i => (i, "alpha beta")).toDF("id", "text")
    val (massD, n2D) = SparseSimilarity.candidateMass(degen, "id", "text")
    massD should be > 0.1 * n2D // the warn threshold
    // discriminative corpus: per-doc unique tokens + one shared pair term,
    // df stays O(1) per term so the mass sits far below the line
    val sparse = (1L to 40L).map(i =>
      (i, s"tok${i}a tok${i}b shared${i / 2}")).toDF("id", "text")
    val (massS, n2S) = SparseSimilarity.candidateMass(sparse, "id", "text")
    massS should be < 0.1 * n2S
    // the measurement respects the df band: pruning the degenerate pair
    // of head terms removes the whole mass
    val (massBand, _) =
      SparseSimilarity.candidateMass(degen, "id", "text",
        maxDfFraction = 0.5)
    massBand shouldBe 0.0
  }

  test("parameter guards reject nonsense") {
    import spark.implicits._
    val df = docs.toDF("id", "text")
    an[IllegalArgumentException] should be thrownBy
      SparseSimilarity.tfidfNeighbors(df, "id", "text", k = 0)
    an[IllegalArgumentException] should be thrownBy
      SparseSimilarity.tfidfNeighbors(df, "id", "text", maxDfFraction = 0.0)
    an[IllegalArgumentException] should be thrownBy
      SparseSimilarity.tfidfNeighbors(df, "id", "text", maxDfFraction = 1.5)
  }
}
