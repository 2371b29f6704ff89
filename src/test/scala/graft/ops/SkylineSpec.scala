package graft.ops

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  private def run(pts: Seq[(Long, Int, Int)]): Set[Long] = {
    import spark.implicits._
    Skyline.paretoMax2(pts.toDF("id", "x", "y"), "x", "y")
      .collect().map(_.getLong(0)).toSet
  }

  private def brute(pts: Seq[(Long, Int, Int)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx >= x && by >= y && (bx > x || by > y) }
    }.map(_._1).toSet

  test("hand case: staircase frontier, dominated row dropped, " +
      "duplicate frontier points both kept") {
    val pts = Seq(
      (1L, 3, 1), (2L, 2, 2), (3L, 1, 3), // the staircase — all frontier
      (4L, 2, 1), // dominated by (3,1) and (2,2)
      (5L, 2, 2)) // exact duplicate of id 2 — mutually non-dominating
    run(pts) shouldBe Set(1L, 2L, 3L, 5L)
  }

  test("equals the brute-force dominance filter on random points, " +
      "and is invariant under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(47)
    (1 to 3).foreach { _ =>
      val pts = (0L until 300L).map(i =>
        (i, rnd.nextInt(40), rnd.nextInt(40)))
      run(pts) shouldBe brute(pts)
      // stage-1 partition-local pruning must not change the answer
      Skyline.paretoMax2(pts.toDF("id", "x", "y").repartition(17),
          "x", "y")
        .collect().map(_.getLong(0)).toSet shouldBe brute(pts)
    }
  }

  test("nulls in either dimension are excluded from the frontier") {
    import spark.implicits._
    val df = Seq((1L, Some(5), Some(5)), (2L, None, Some(9)),
        (3L, Some(9), None), (4L, Some(4), Some(6)))
      .toDF("id", "x", "y")
    Skyline.paretoMax2(df, "x", "y")
      .collect().map(_.getLong(0)).toSet shouldBe Set(1L, 4L)
  }
}
