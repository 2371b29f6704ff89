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
}
