package graft.ops

import graft.SparkSpec

class TableDiffSpec extends SparkSpec {

  private def run(before: Seq[(Long, Option[String], Option[Double])],
      after: Seq[(Long, Option[String], Option[Double])]) = {
    import spark.implicits._
    TableDiff.diff(before.toDF("pk", "s", "v"), after.toDF("pk", "s", "v"),
      "pk", Seq("s", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("classifies added, removed, changed; drops unchanged") {
    val d = run(
      before = Seq((1L, Some("a"), Some(1.0)), (2L, Some("b"), Some(2.0)),
        (3L, Some("c"), Some(3.0))),
      after = Seq((1L, Some("a"), Some(1.0)), (2L, Some("B"), Some(2.0)),
        (4L, Some("d"), Some(4.0))))
    d shouldBe Map(2L -> "changed", 3L -> "removed", 4L -> "added")
  }

  test("null vs value is a change; null vs null is not") {
    val d = run(
      before = Seq((1L, None, Some(1.0)), (2L, None, None)),
      after = Seq((1L, Some("x"), Some(1.0)), (2L, None, None)))
    d shouldBe Map(1L -> "changed")
  }

  test("adjacent-column aliasing is barred by the separator") {
    // ("ab","c") vs ("a","bc") concatenate identically without a separator
    val d = run(
      before = Seq((1L, Some("ab"), None)),
      after = Seq((1L, Some("a"), None)))
    d shouldBe Map(1L -> "changed")
  }

  test("the full-outer join ships digests, not payloads") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i, s"s$i", i.toDouble))
      .toDF("pk", "s", "v")
    val plan = TableDiff.diff(df, df.limit(50), "pk", Seq("s", "v"))
      .queryExecution.optimizedPlan
    val join = plan.collectFirst {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.get
    join.children.foreach { side =>
      val out = side.output.map(_.name)
      out should contain noneOf ("s", "v")
      out.exists(_.startsWith("__d_")) shouldBe true
    }
  }
}
