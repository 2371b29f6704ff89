package graft.ops

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

class InvertedIndexSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat"),
      (2L, "the cat ran"),
      (3L, "the cat sat down"),
      (4L, "a dog sat"),
      (5L, "the the the cat") // repeated term: must post once
    ).toDF("doc_id", "text")
  }

  private def build(minDf: Long, maxDf: Long) =
    InvertedIndex.build(docs, "doc_id",
      TextFunctions.tokens(lower(col("text"))), minDf, maxDf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

  test("postings are sorted, deduped per doc, and df-banded") {
    val idx = build(2, 4)
    // "the" has df 4 (doc 5 counts ONCE despite 3 occurrences)
    idx("the") shouldBe ((4L, "1,2,3,5"))
    idx("cat") shouldBe ((4L, "1,2,3,5"))
    idx("sat") shouldBe ((3L, "1,3,4"))
    // hapaxes dropped by minDf
    idx.contains("ran") shouldBe false
    idx.contains("dog") shouldBe false
  }

  test("maxDf drops head terms before any postings are collected") {
    val idx = build(2, 3)
    idx.contains("the") shouldBe false
    idx.contains("cat") shouldBe false
    idx("sat") shouldBe ((3L, "1,3,4"))
  }

  test("df equals postings length for every term") {
    build(1, 100).foreach { case (_, (df, p)) =>
      p.split(",").length.toLong shouldBe df
    }
  }

  test("the postings collect runs on the df-filtered side (two-pass plan)") {
    // The final aggregate's input must contain the df filter: a plan that
    // collects every term's postings and filters afterwards would show the
    // Filter ABOVE the last Aggregate instead.
    val plan = InvertedIndex.build(docs, "doc_id",
      TextFunctions.tokens(lower(col("text"))), 2, 4)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val lastAgg = plan.collectFirst { case a: Aggregate => a }.get
    val filterBelow = lastAgg.collectFirst {
      case f: Filter if f.condition.sql.contains("df") => f }
    filterBelow should not be empty
  }

  test("substringSearch equals the full-scan contains on seeded texts") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val words = Seq("fast", "merge", "scan", "fas", "tmer", "xmergey")
    val docs = (0L until 200L).map { i =>
      i -> (0 until 8).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    }
    val df = docs.toDF("doc_id", "text")
    for (needle <- Seq("fast merge", "merge scan", "st m")) {
      val got = InvertedIndex.substringSearch(df, "doc_id", "text", needle)
        .collect().map(_.getLong(0)).toSet
      val want = docs.filter(_._2.contains(needle)).map(_._1).toSet
      withClue(s"needle '$needle': ") { got shouldBe want }
      want should not be empty // the fixture must actually exercise hits
    }
  }

  test("substringSearch verify stage removes coincidental-trigram docs; " +
      "short-needle guard") {
    import spark.implicits._
    // "abcd xcde" carries every trigram of "abcde" (abc, bcd, cde) but
    // not the substring itself -- candidate gate alone would return it
    val df = Seq((1L, "abcd xcde"), (2L, "zzabcdezz"), (3L, "nothing"))
      .toDF("doc_id", "text")
    InvertedIndex.substringSearch(df, "doc_id", "text", "abcde")
      .collect().map(_.getLong(0)).toSeq shouldBe Seq(2L)
    an[IllegalArgumentException] should be thrownBy
      InvertedIndex.substringSearch(df, "doc_id", "text", "ab")
  }
}
