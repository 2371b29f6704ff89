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

  test("property: random perturbations classify exactly as a driver diff") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 5).foreach { _ =>
      val before = (0L until 500L).map(i =>
        (i, Option.when(rnd.nextDouble() > 0.1)(s"v${rnd.nextInt(5)}"),
          Option.when(rnd.nextDouble() > 0.1)(rnd.nextInt(3).toDouble)))
      val after = before.flatMap { case (k, s, v) =>
        rnd.nextDouble() match {
          case d if d < 0.1 => None // removed
          case d if d < 0.3 => // changed (maybe to an equal value)
            Some((k, s.map(_ => s"v${rnd.nextInt(5)}"), v))
          case _ => Some((k, s, v))
        }
      } ++ (1000L until 1000L + rnd.nextInt(20)).map(k =>
        (k, Some("new"), Some(1.0)))
      val got = TableDiff.diff(
        before.toDF("pk", "s", "v"), after.toDF("pk", "s", "v"),
        "pk", Seq("s", "v"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val bm = before.map(r => r._1 -> ((r._2, r._3))).toMap
      val am = after.map(r => r._1 -> ((r._2, r._3))).toMap
      val want = ((bm.keySet ++ am.keySet).flatMap { k =>
        (bm.get(k), am.get(k)) match {
          case (None, Some(_)) => Some(k -> "added")
          case (Some(_), None) => Some(k -> "removed")
          case (Some(x), Some(y)) if x != y => Some(k -> "changed")
          case _ => None
        }
      }).toMap
      got shouldBe want
    }
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

  test("toChangeSet: I/U carry the after image, D the before image; " +
      "applyChanges round-trips to the after snapshot") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val before = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0),
      (4L, "d", 4.0)).toDF("pk", "s", "v")
    val after = Seq((1L, "a", 1.0), (2L, "B", 2.0), (4L, "d", 9.0),
      (5L, "e", 5.0)).toDF("pk", "s", "v")
    val cs = TableDiff.toChangeSet(before, after, "pk", Seq("s", "v"))
    val rows = cs.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2),
        r.getString(3)))).toMap
    rows shouldBe Map(
      2L -> (("B", 2.0, "U")), // after image
      4L -> (("d", 9.0, "U")),
      5L -> (("e", 5.0, "I")),
      3L -> (("c", 3.0, "D"))) // last before image
    // the round-trip law: apply the derived set onto before == after
    val applied = TableMerge.applyChanges(before, cs, "pk")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet
    applied shouldBe after.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    // identical snapshots produce an empty change set
    TableDiff.toChangeSet(before, before, "pk", Seq("s", "v"))
      .count() shouldBe 0L
    // and payloads never ride the digest join: the status frame is
    // keys-only by construction (covered by the digests-only plan test
    // above, which toChangeSet routes through)
    cs.columns.toSeq shouldBe Seq("pk", "s", "v", "op")
  }
}
