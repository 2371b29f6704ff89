package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoilerplateSpec extends SparkSpec {

  // "sign up for our newsletter" (3-grams of it) appears in docs 1-3;
  // everything else is unique text. doc 4 is pure boilerplate, doc 5 too
  // short to have a 3-gram.
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta sign up for our newsletter gamma delta"),
      (2L, "epsilon sign up for our newsletter zeta"),
      (3L, "sign up for our newsletter eta theta iota kappa"),
      (4L, "sign up for our newsletter"),
      (5L, "too short")
    ).toDF("doc_id", "text")
  }

  private def grams(s: String, n: Int): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSeq

  test("frequentGramDigests finds exactly the cross-doc grams, df = distinct docs") {
    val out = Boilerplate.frequentGramDigests(fixture, "doc_id", "text",
        n = 3, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the 3-grams of "sign up for our newsletter" appear in docs 1,2,3,4
    val expected = grams("sign up for our newsletter", 3)
    out.size shouldBe expected.size
    out.values.toSet shouldBe Set(4L)
  }

  test("document frequency counts documents, not occurrences") {
    import spark.implicits._
    // one doc repeats a gram 5x, one other doc has it once: df must be 2
    val docs = Seq(
      (1L, Seq.fill(5)("x y z").mkString(" q ")), // "x y z" 5 times
      (2L, "a b x y z c")
    ).toDF("doc_id", "text")
    val out = Boilerplate.frequentGramDigests(docs, "doc_id", "text",
        n = 3, minDocs = 2)
      .collect().map(r => r.getLong(1))
    // only "x y z" is shared; its df is 2 (not 6)
    out.toSeq shouldBe Seq(2L)
  }

  test("fractions matches a driver-side recomputation") {
    val n = 3
    val minDocs = 3L
    val docs = fixture.collect().map(r => (r.getLong(0), r.getString(1)))
    val df = docs.flatMap { case (id, t) => grams(t, n).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length.toLong }
    val boiler = df.filter(_._2 >= minDocs).keySet
    val expected = docs.map { case (id, t) =>
      val gs = grams(t, n)
      id -> ((gs.size.toLong, gs.count(boiler.contains).toLong))
    }.filter(_._2._1 > 0).toMap

    val out = Boilerplate.fractions(fixture, "doc_id", "text", n, minDocs)
      .collect().map { r =>
        r.getDouble(3) shouldBe r.getLong(2).toDouble / r.getLong(1)
        r.getLong(0) -> ((r.getLong(1), r.getLong(2)))
      }.toMap
    out shouldBe expected
  }

  test("clean drops high-boilerplate docs and keeps short/clean ones") {
    // fractions: doc 1 = 3/7, doc 2 = 3/5 (exactly on the threshold — the
    // >= boundary drops it), doc 3 = 3/7, doc 4 = 3/3, doc 5 = no grams
    val kept = Boilerplate.clean(fixture, "doc_id", "text", n = 3,
        minDocs = 3, maxFrac = 0.6)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    kept shouldBe Array(1L, 3L, 5L)
    val keptLoose = Boilerplate.clean(fixture, "doc_id", "text", n = 3,
        minDocs = 3, maxFrac = 0.61)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    keptLoose shouldBe Array(1L, 2L, 3L, 5L)
  }

  test("matches brute force on a seeded random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    def doc() = Seq.fill(4 + rnd.nextInt(16))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val docs = (0L until 80L).map(i => (i, doc()))
    val n = 2
    val minDocs = 5L

    val df = docs.flatMap { case (id, t) => grams(t, n).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (g, xs) => g -> xs.length.toLong }
    val boiler = df.filter(_._2 >= minDocs).keySet
    val expected = docs.map { case (id, t) =>
      val gs = grams(t, n)
      id -> ((gs.size.toLong, gs.count(boiler.contains).toLong))
    }.filter(_._2._1 > 0).toMap

    val out = Boilerplate.fractions(docs.toDF("doc_id", "text"),
        "doc_id", "text", n, minDocs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out shouldBe expected
  }

  test("exchanges ship digests, not gram or document text") {
    // the scoring join's inputs must not carry the text column — the
    // ids-only/digests-only discipline the dedup family spec-guards
    val plan = Boilerplate.fractions(fixture, "doc_id", "text", 3, 3)
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    joins should not be empty
    joins.foreach { j =>
      j.children.foreach { side =>
        side.output.map(_.name) should not contain "text"
      }
    }
  }
}
