package graft.ops

import graft.SparkSpec

class ClassifySpec extends SparkSpec {

  private def run(rows: Seq[(Long, Int, Seq[Float])])
      : (Map[Long, (Int, Double)], Map[(Int, Int), Long]) = {
    import spark.implicits._
    val df = rows.toDF("vec_id", "label", "embedding")
    val per = Classify.nearestCentroid(df, "vec_id", "label", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(2), r.getDouble(3))).toMap
    val conf = Classify.centroidConfusion(df, "vec_id", "label", "embedding")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    (per, conf)
  }

  test("hand-computed 2-class case: the mislabeled vector crosses over") {
    // label 1 = x-axis pair; label 2 = two y-axis rows PLUS a mislabeled
    // near-x vector, which drags centroid 2 to (0.3, 0.7). Scores by
    // dot/|c|: (0.9, 0.1) reads 0.9 vs 1's unit-x centroid and ~0.446 vs
    // 2's — so it is flagged as predicted-1 (the off-diagonal audit row)
    val rows = Seq(
      (10L, 1, Seq(1f, 0f)), (11L, 1, Seq(1f, 0f)),
      (20L, 2, Seq(0f, 1f)), (21L, 2, Seq(0f, 1f)),
      (22L, 2, Seq(0.9f, 0.1f)))
    val (per, conf) = run(rows)
    per(22L)._1 shouldBe 1
    per(22L)._2 shouldBe (0.9 +- 1e-7)
    per(10L)._1 shouldBe 1
    per(20L)._1 shouldBe 2
    conf shouldBe Map((1, 1) -> 2L, (2, 2) -> 2L, (2, 1) -> 1L)
  }

  test("exact score tie breaks to the smallest class label") {
    // both classes produce the SAME centroid (0.5, 0.5), so every row
    // ties across classes and must resolve to label 1
    val rows = Seq(
      (1L, 1, Seq(1f, 0f)), (2L, 1, Seq(0f, 1f)),
      (3L, 2, Seq(0f, 1f)), (4L, 2, Seq(1f, 0f)))
    val (per, conf) = run(rows)
    per.values.map(_._1).toSet shouldBe Set(1)
    conf shouldBe Map((1, 1) -> 2L, (2, 1) -> 2L)
  }

  test("centroidOutliers: the planted far vector is flagged with the " +
      "mirror's exact dist/z; identical clusters flag nothing (sd=0)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val base = (0 until 60).map { i =>
      (i.toLong, 1, Seq(1f + 0.01f * rnd.nextGaussian().toFloat,
        0.01f * rnd.nextGaussian().toFloat))
    }
    val rows = base :+ ((999L, 1, Seq(-1f, 0f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Classify.centroidOutliers(df, "vec_id", "label", "embedding",
        zThreshold = 2.0)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    // mirror: sum/n centroid, l2 dist, population z
    val n = rows.size
    val cent = Array(
      rows.map(_._3(0).toDouble).sum / n, rows.map(_._3(1).toDouble).sum / n)
    val dists = rows.map { case (id, _, v) =>
      id -> math.sqrt(math.pow(v(0) - cent(0), 2) +
        math.pow(v(1) - cent(1), 2)) }.toMap
    val mu = dists.values.sum / n
    val sd = math.sqrt(dists.values.map(d => d * d).sum / n - mu * mu)
    val want = dists.view.filter { case (_, d) => (d - mu) / sd > 2.0 }
      .map { case (id, d) => id -> (d, (d - mu) / sd) }.toMap
    got.keySet shouldBe want.keySet
    got.keySet should contain(999L)
    got.foreach { case (id, (d, z)) =>
      d shouldBe want(id)._1 +- 1e-6
      z shouldBe want(id)._2 +- 1e-6
    }
    // a degenerate all-identical cluster has sd = 0 -> NaN z -> no rows
    val same = (0 until 10).map(i => (i.toLong, 7, Seq(1f, 2f)))
    Classify.centroidOutliers(same.toDF("vec_id", "label", "embedding"),
      "vec_id", "label", "embedding", 2.0).count() shouldBe 0L
  }

  test("matches a plain-Scala mirror on seeded clustered vectors") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val centers = (0 until 4).map(_ => Array.fill(dim)(rnd.nextGaussian()))
    val rows = (0 until 200).map { i =>
      val lab = rnd.nextInt(4)
      val v = centers(lab).map(x => (x + 0.4 * rnd.nextGaussian()).toFloat)
      (i.toLong, lab, v.toSeq)
    }
    // independent mirror: same sum/n centroid, dot/|c| score, argmax by
    // (score desc, label asc)
    val byLab = rows.groupBy(_._2)
    val cents = byLab.map { case (lab, rs) =>
      val s = Array.fill(dim)(0.0)
      rs.foreach(r => r._3.zipWithIndex.foreach { case (x, i) =>
        s(i) += x.toDouble })
      lab -> s.map(_ / rs.size)
    }
    val norms = cents.map { case (l, c) =>
      l -> math.sqrt(c.map(x => x * x).sum) }
    def pred(v: Seq[Float]): Int =
      cents.map { case (l, c) =>
        val d = v.zip(c).foldLeft(0.0) { case (a, (x, y)) =>
          a + x.toDouble * y }
        (l, d / norms(l))
      }.toSeq.minBy { case (l, s) => (-s, l) }._1
    val want = rows.map(r => r._1 -> pred(r._3)).toMap
    val (per, conf) = run(rows)
    per.view.mapValues(_._1).toMap shouldBe want
    conf.values.sum shouldBe 200L
    // clustered data must classify mostly on-diagonal
    val diag = conf.collect { case ((a, b), n) if a == b => n }.sum
    diag.toDouble / 200 should be > 0.9
  }
}
