package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {

  // brute-force as-of: for each left row, argmax over right rows with
  // rt <= lt, ties on rt resolved toward the larger payload-ordering row
  // (matching the operator's deterministic (__t, __side, __ref) ordering)
  private def brute(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, String)])
      : Map[Long, Option[(Long, String)]] =
    left.map { case (lid, k, lt) =>
      val cands = right.filter { case (rk, rt, _) => rk == k && rt <= lt }
      lid -> (if (cands.isEmpty) None
              else Some {
                val m = cands.maxBy { case (_, rt, p) => (rt, p) }
                (m._2, m._3)
              })
    }.toMap

  private def seeded(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val left = (0L until 200L).map(i =>
      (i, rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong))
    val right = (0L until 300L).map(i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, s"p$i"))
    (left, right)
  }

  test("asOf inner matches brute force on seeded random data") {
    import spark.implicits._
    val (l, r) = seeded(7)
    val lf = l.toDF("lid", "k", "lt")
    val rf = r.toDF("k", "rt", "payload")
    val out = TemporalJoin.asOf(lf, rf, "k", "lt", "rt", Seq("payload"))
      .collect()
      .map(x => x.getAs[Long]("lid") ->
        (x.getAs[Long]("matched_rt"), x.getAs[String]("matched_payload")))
      .toMap
    val want = brute(l, r).collect { case (lid, Some(m)) => lid -> m }
    out shouldBe want
  }

  test("asOf outer keeps unmatched left rows with null payload") {
    import spark.implicits._
    val (l, r) = seeded(13)
    val lf = l.toDF("lid", "k", "lt")
    val rf = r.toDF("k", "rt", "payload")
    val out = TemporalJoin.asOf(lf, rf, "k", "lt", "rt", Seq("payload"),
      inner = false)
    out.count() shouldBe l.size
    val matchless = brute(l, r).collect { case (lid, None) => lid }.toSet
    out.filter(col("matched_payload").isNull)
      .collect().map(_.getAs[Long]("lid")).toSet shouldBe matchless
  }

  test("asOf is inclusive: a right row AT the left timestamp matches") {
    import spark.implicits._
    val lf = Seq((1L, 5L, 100L)).toDF("lid", "k", "lt")
    val rf = Seq((5L, 100L, "at"), (5L, 99L, "before")).toDF("k", "rt", "payload")
    val row = TemporalJoin.asOf(lf, rf, "k", "lt", "rt", Seq("payload"))
      .collect().head
    row.getAs[String]("matched_payload") shouldBe "at"
  }

  test("asOf ties between identical-(key,time) right rows pick the max " +
      "payload, invariant under partitioning") {
    import spark.implicits._
    val lf = Seq((1L, 5L, 100L)).toDF("lid", "k", "lt")
    val rf = Seq((5L, 90L, "zz_alpha"), (5L, 90L, "aa_beta"), (5L, 80L, "old"))
      .toDF("k", "rt", "payload")
    (1 to 8 by 7).foreach { parts =>
      val row = TemporalJoin.asOf(lf, rf.repartition(parts), "k", "lt", "rt",
        Seq("payload")).collect().head
      // (rt=90, payload="zz_alpha") > (rt=90, payload="aa_beta") in struct
      // order -> the max wins regardless of layout
      row.getAs[String]("matched_payload") shouldBe "zz_alpha"
    }
  }

  test("asOf accepts a non-orderable (map) payload via the documented " +
      "(time, side)-only fallback ordering") {
    import spark.implicits._
    val lf = Seq((1L, 5L, 100L)).toDF("lid", "k", "lt")
    val rf = Seq((5L, 90L, Map("a" -> 1)), (5L, 80L, Map("b" -> 2)))
      .toDF("k", "rt", "payload")
    val row = TemporalJoin.asOf(lf, rf, "k", "lt", "rt", Seq("payload"))
      .collect().head
    row.getAs[Long]("matched_rt") shouldBe 90L
    row.getAs[Map[String, Int]]("matched_payload") shouldBe Map("a" -> 1)
  }

  test("asOf result is invariant under input partitioning") {
    import spark.implicits._
    val (l, r) = seeded(23)
    def run(parts: Int) = TemporalJoin.asOf(
        l.toDF("lid", "k", "lt").repartition(parts),
        r.toDF("k", "rt", "payload").repartition(parts),
        "k", "lt", "rt", Seq("payload"))
      .collect().map(x => (x.getLong(0), x.getAs[String]("matched_payload")))
      .toSet
    run(1) shouldBe run(7)
  }

  // ------------------------------------------------------------- interval

  private def bruteInterval(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, String)], before: Long, after: Long)
      : Set[(Long, String)] =
    (for {
      (lid, k, ltv) <- left
      (rk, rtv, p) <- right
      if rk == k && rtv >= ltv - before && rtv <= ltv + after
    } yield (lid, p)).toSet

  test("intervalJoin matches the brute-force pair set, no duplicate pairs") {
    import spark.implicits._
    val (l, r) = seeded(31)
    val out = TemporalJoin.intervalJoin(
        l.toDF("lid", "k", "lt"), r.toDF("k", "rt", "payload"),
        "k", "lt", "rt", Seq("payload"), before = 40L, after = 25L)
      .collect().map(x => (x.getAs[Long]("lid"),
        x.getAs[String]("matched_payload")))
    // bag == set: the single-cell right mapping can never emit a pair twice
    out.length shouldBe out.toSet.size
    out.toSet shouldBe bruteInterval(l, r, 40L, 25L)
  }

  test("intervalJoin is bucket-size invariant (bucket only tunes cost)") {
    import spark.implicits._
    val (l, r) = seeded(37)
    def run(bucket: Long) = TemporalJoin.intervalJoin(
        l.toDF("lid", "k", "lt"), r.toDF("k", "rt", "payload"),
        "k", "lt", "rt", Seq("payload"), before = 30L, after = 30L,
        bucketWidth = bucket)
      .collect().map(x => (x.getAs[Long]("lid"),
        x.getAs[String]("matched_payload"))).toSet
    val want = bruteInterval(l, r, 30L, 30L)
    run(7L) shouldBe want
    run(60L) shouldBe want
    run(500L) shouldBe want
  }

  test("intervalJoin window bounds are inclusive on both ends; " +
      "asymmetric windows work") {
    import spark.implicits._
    val lf = Seq((1L, 5L, 100L)).toDF("lid", "k", "lt")
    val rf = Seq((5L, 90L, "at_lo"), (5L, 89L, "below"), (5L, 110L, "at_hi"),
      (5L, 111L, "above"), (6L, 100L, "wrong_key"))
      .toDF("k", "rt", "payload")
    TemporalJoin.intervalJoin(lf, rf, "k", "lt", "rt", Seq("payload"),
        before = 10L, after = 10L)
      .collect().map(_.getAs[String]("matched_payload")).sorted shouldBe
      Array("at_hi", "at_lo")
    // before-only window: nothing after the left time matches
    TemporalJoin.intervalJoin(lf, rf, "k", "lt", "rt", Seq("payload"),
        before = 10L, after = 0L)
      .collect().map(_.getAs[String]("matched_payload")).sorted shouldBe
      Array("at_lo")
  }

  test("intervalJoin handles negative time axes (floor cells, not truncate)") {
    import spark.implicits._
    val lf = Seq((1L, 5L, -100L)).toDF("lid", "k", "lt")
    val rf = Seq((5L, -95L, "in"), (5L, -150L, "out")).toDF("k", "rt", "payload")
    TemporalJoin.intervalJoin(lf, rf, "k", "lt", "rt", Seq("payload"),
        before = 10L, after = 10L)
      .collect().map(_.getAs[String]("matched_payload")) shouldBe Array("in")
  }

  test("validityIntervals: runs compact to change points with half-open " +
      "interval stamps; open run gets -1") {
    import spark.implicits._
    // user 1: a,a,b,a — three runs; user 2: one run
    val df2 = Seq((1L, "a", 10L), (1L, "a", 20L), (1L, "b", 30L),
      (1L, "a", 40L), (2L, "x", 5L)).toDF("k", "v", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    val got = TemporalJoin.validityIntervals(df2, "k", "v", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    got shouldBe Set((1L, "a", 10L, 30L), (1L, "b", 30L, 40L),
      (1L, "a", 40L, -1L), (2L, "x", 5L, -1L))
    // partition invariance
    val got7 = TemporalJoin.validityIntervals(
      df2.repartition(7), "k", "v", "ts")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    got7 shouldBe got
  }

  test("intervalJoin plans an equi-join on (key, cell), never a cartesian") {
    import spark.implicits._
    val (l, r) = seeded(41)
    val plan = TemporalJoin.intervalJoin(
        l.toDF("lid", "k", "lt"), r.toDF("k", "rt", "payload"),
        "k", "lt", "rt", Seq("payload"), before = 30L, after = 30L)
      .queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
