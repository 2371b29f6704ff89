package graft.ops

import graft.SparkSpec

class EvalSpec extends SparkSpec {

  private def run(expected: Seq[(Long, Long, Int)],
      actual: Seq[(Long, Long, Int)], k: Int)
      : Map[Long, (Long, Double, Double, Double)] = {
    import spark.implicits._
    Eval.rankingMetrics(expected.toDF("q", "id", "rank"),
        actual.toDF("q", "id", "rank"), "q", "id", "rank", k)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
  }

  test("hand-computed: perfect, partial, and empty rankings") {
    def ranked(q: Long, ids: Seq[Long]): Seq[(Long, Long, Int)] =
      ids.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
    val expected =
      ranked(1L, Seq(10, 11, 12)) ++ // q1: actual is a perfect match
        ranked(2L, Seq(10, 11, 12)) ++ // q2: one hit at actual rank 2
        ranked(3L, Seq(10, 11, 12)) // q3: absent from actual entirely
    val actual =
      ranked(1L, Seq(10, 11, 12)) ++
        ranked(2L, Seq(99, 11, 98))
    val got = run(expected, actual, k = 3)
    val idcg3 = (1 to 3).map(i => 1.0 / (math.log(i + 1) / math.log(2))).sum
    got(1L) shouldBe ((3L, 1.0, 1.0, 1.0))
    got(2L)._1 shouldBe 1L
    got(2L)._2 shouldBe (1.0 / 3) +- 1e-12
    got(2L)._3 shouldBe 0.5 +- 1e-12 // first hit at rank 2
    got(2L)._4 shouldBe ((1.0 / (math.log(3) / math.log(2))) / idcg3) +- 1e-12
    got(3L) shouldBe ((0L, 0.0, 0.0, 0.0))
  }

  test("rank > k rows are ignored; short expected lists normalize by " +
      "their own size; k guard") {
    def ranked(q: Long, ids: Seq[Long]): Seq[(Long, Long, Int)] =
      ids.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
    // expected has only 2 items; actual finds both inside k=3 but also
    // carries a rank-4 row that must not count
    val expected = ranked(7L, Seq(20, 21))
    val actual = ranked(7L, Seq(20, 99, 21, 22))
    val got = run(expected, actual, k = 3)
    val idcg2 = (1 to 2).map(i => 1.0 / (math.log(i + 1) / math.log(2))).sum
    got(7L)._1 shouldBe 2L
    got(7L)._2 shouldBe 1.0 +- 1e-12 // 2 of min(3, 2)
    got(7L)._3 shouldBe 1.0 +- 1e-12
    got(7L)._4 shouldBe ((1.0 + 1.0 / (math.log(4) / math.log(2))) /
      idcg2) +- 1e-12
    an[IllegalArgumentException] should be thrownBy run(expected, actual, 0)
  }

  test("matches a plain mirror on random rankings") {
    val rnd = new scala.util.Random(41)
    val k = 5
    def mk(): Seq[(Long, Long, Int)] = (0L until 30L).flatMap { q =>
      val ids = rnd.shuffle((0L until 20L).toList).take(k)
      ids.zipWithIndex.map { case (id, i) => (q, id, i + 1) }
    }
    val expected = mk()
    val actual = mk()
    val got = run(expected, actual, k)
    def log2(x: Double) = math.log(x) / math.log(2)
    (0L until 30L).foreach { q =>
      val e = expected.filter(_._1 == q).map(_._2).toSet
      val a = actual.filter(_._1 == q).sortBy(_._3)
      val hits = a.filter(r => e.contains(r._2))
      val recall = hits.size.toDouble / math.min(k, e.size)
      val mrr = hits.headOption.map(r => 1.0 / r._3).getOrElse(0.0)
      val dcg = hits.map(r => 1.0 / log2(r._3 + 1.0)).sum
      val idcg = (1 to math.min(k, e.size)).map(i => 1.0 / log2(i + 1.0)).sum
      got(q)._1 shouldBe hits.size.toLong
      got(q)._2 shouldBe recall +- 1e-12
      got(q)._3 shouldBe mrr +- 1e-12
      got(q)._4 shouldBe (dcg / idcg) +- 1e-12
    }
  }
}
