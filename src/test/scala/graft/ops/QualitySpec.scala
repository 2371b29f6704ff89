package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  // type-7 (linear interpolation) percentile, the definition Spark's exact
  // percentile and DuckDB's quantile_cont share
  private def q7(sorted: Seq[Double], p: Double): Double = {
    val h = (sorted.size - 1) * p
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo))
  }

  private def fixture = {
    val rnd = new scala.util.Random(19)
    (0L until 300L).map(i => (i, s"g${i % 3}", rnd.nextInt(1000).toDouble))
  }

  test("quantileBand matches the type-7 definition per group") {
    import spark.implicits._
    val rows = fixture
    val bands = Quality.quantileBand(rows.toDF("id", "g", "v"), "g",
        col("v"), 0.25, 0.75)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2))))
      .toMap
    rows.groupBy(_._2).foreach { case (g, ks) =>
      val sorted = ks.map(_._3).sorted
      bands(g)._1 shouldBe q7(sorted, 0.25) +- 1e-9
      bands(g)._2 shouldBe q7(sorted, 0.75) +- 1e-9
    }
  }

  test("quantileGate keeps exactly the in-band rows (inclusive bounds)") {
    import spark.implicits._
    val rows = fixture
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (_, ks) =>
      val sorted = ks.map(_._3).sorted
      val (lo, hi) = (q7(sorted, 0.25), q7(sorted, 0.75))
      ks.filter(r => r._3 >= lo && r._3 <= hi)
    }.map(_._1).toSet
    val out = Quality.quantileGate(rows.toDF("id", "g", "v"), "g",
        col("v"), 0.25, 0.75)
      .collect().map(_.getLong(0)).toSet
    out shouldBe expected
    // the band rows themselves are values from the data often enough here
    // that inclusivity matters: at least one group boundary row survives
    out.size should be < rows.size
  }

  test("approx mode tracks exact mode within sketch tolerance") {
    import spark.implicits._
    val rows = fixture
    val df = rows.toDF("id", "g", "v")
    val exact = Quality.quantileGate(df, "g", col("v"), 0.25, 0.75)
      .collect().map(_.getLong(0)).toSet
    val approx = Quality.quantileGate(df, "g", col("v"), 0.25, 0.75,
        exact = false)
      .collect().map(_.getLong(0)).toSet
    // high-accuracy sketch on 100-row groups: tiny symmetric difference
    val sym = (exact diff approx) ++ (approx diff exact)
    sym.size should be <= (rows.size / 20)
  }

  test("the corpus side never shuffles: band broadcasts onto the scan") {
    import spark.implicits._
    val df = fixture.toDF("id", "g", "v")
    val plan = Quality.quantileGate(df, "g", col("v"), 0.25, 0.75)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    // the only Exchange feeds the band AGGREGATION (grouped short keys) or
    // the broadcast itself — never a corpus-sized sort-merge join
    plan should not include "SortMergeJoin"
  }

  test("bad fractions fail loudly") {
    import spark.implicits._
    val df = fixture.toDF("id", "g", "v")
    an[IllegalArgumentException] should be thrownBy
      Quality.quantileBand(df, "g", col("v"), 0.75, 0.25)
    an[IllegalArgumentException] should be thrownBy
      Quality.quantileBand(df, "g", col("v"), -0.1, 0.5)
  }

  test("unigramLogProb matches a driver-side fit + score") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat"),
      (3L, "RARE Words Here"),
      (4L, "the the the"))
    val toks = docs.flatMap { case (id, t) =>
      t.split("\\s+").filter(_.nonEmpty).map(w => (id, w.toLowerCase)) }
    val total = toks.size.toDouble
    val freq = toks.groupBy(_._2).map { case (w, xs) =>
      w -> (math.log(xs.size.toDouble) - math.log(total)) }
    val expected = docs.map { case (id, t) =>
      val ws = t.split("\\s+").filter(_.nonEmpty).map(_.toLowerCase)
      id -> ((ws.length.toLong, (ws.map(freq).sum / ws.length).toFloat))
    }.toMap

    val out = Quality.unigramLogProb(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getFloat(2))))
      .toMap
    out.keySet shouldBe expected.keySet
    out.foreach { case (id, (n, s)) =>
      n shouldBe expected(id)._1
      s shouldBe expected(id)._2 +- 1e-5f
    }
    // ordering sanity: the all-stopword doc outscores the all-rare doc
    out(4L)._2 should be > out(3L)._2
  }

  test("unigramLogProb accepts an external reference model") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb"), (2L, "aa cc")).toDF("doc_id", "text")
    val model = Seq(("aa", -1.0), ("bb", -2.0), ("cc", -10.0))
      .toDF("__term", "__logp")
    val out = Quality.unigramLogProb(docs, "doc_id", "text", Some(model))
      .collect().map(r => r.getLong(0) -> r.getFloat(2)).toMap
    out(1L) shouldBe -1.5f +- 1e-6f
    out(2L) shouldBe -5.5f +- 1e-6f
  }

  test("bigramLogProb matches a hand-computed add-alpha fit") {
    import spark.implicits._
    // corpus: bigrams (a,b)x2 from docs 1,2; (a,c)x1 from doc 3;
    // context counts: a->3; vocab {a,b,c} = 3; alpha 0.5
    val docs = Seq((1L, "a b"), (2L, "A b"), (3L, "a c"), (4L, "solo"))
    val out = Quality.bigramLogProb(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getFloat(2))))
      .toMap
    // vocab includes 'solo' even though doc 4 has no bigram: V = 4
    val pAb = math.log((2 + 0.5) / (3 + 0.5 * 4))
    val pAc = math.log((1 + 0.5) / (3 + 0.5 * 4))
    out.keySet shouldBe Set(1L, 2L, 3L) // doc 4: < 2 tokens, absent
    out(1L) shouldBe ((1L, pAb.toFloat))
    out(2L) shouldBe ((1L, pAb.toFloat)) // case-folded
    out(3L) shouldBe ((1L, pAc.toFloat))
    out(1L)._2 should be > out(3L)._2 // frequent transition outscores rare
  }

  test("bigramLogProb ranks token ORDER, not just token choice") {
    import spark.implicits._
    // same unigram bag; doc 2 scrambles the dominant word order
    val fluent = "the cat sat on the mat and the cat sat on the mat"
    val docs = Seq((1L, fluent), (2L, fluent), (3L, fluent),
      (4L, "mat the on sat cat the and mat the on sat cat the"))
    val out = Quality.bigramLogProb(docs.toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getFloat(2)).toMap
    out(1L) should be > out(4L)
  }

  test("bigramLogProb rejects alpha <= 0") {
    import spark.implicits._
    an[IllegalArgumentException] should be thrownBy
      Quality.bigramLogProb(Seq((1L, "a b")).toDF("doc_id", "text"),
        "doc_id", "text", alpha = 0.0)
  }
}
