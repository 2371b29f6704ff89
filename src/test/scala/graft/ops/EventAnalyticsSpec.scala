package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  test("funnel requires strictly increasing stage times") {
    import spark.implicits._
    val ev = Seq(
      // user 1: full ordered funnel
      (1L, "signup", 10L), (1L, "view", 20L), (1L, "click", 30L),
      (1L, "purchase", 40L),
      // user 2: purchase BEFORE click — must not count past view
      (2L, "signup", 10L), (2L, "view", 20L), (2L, "purchase", 25L),
      (2L, "click", 30L),
      // user 3: view precedes signup — counts signup only
      (3L, "view", 5L), (3L, "signup", 10L),
      // user 4: never signed up
      (4L, "view", 1L), (4L, "click", 2L), (4L, "purchase", 3L)
    ).toDF("user_id", "event_type", "ts_us")
    val r = EventAnalytics.funnel(ev, "user_id", "event_type", "ts_us",
      Seq("signup", "view", "click", "purchase")).collect()(0)
    r.getLong(0) shouldBe 3 // users 1,2,3 signed up
    r.getLong(1) shouldBe 2 // users 1,2 viewed after signup
    r.getLong(2) shouldBe 2 // users 1,2 clicked after view
    r.getLong(3) shouldBe 1 // only user 1 purchased after click
  }

  test("funnel uses later same-type events when the first is too early") {
    import spark.implicits._
    // view at 5 is before signup, but the view at 15 still qualifies
    val ev = Seq((1L, "view", 5L), (1L, "signup", 10L), (1L, "view", 15L))
      .toDF("user_id", "event_type", "ts_us")
    val r = EventAnalytics.funnel(ev, "user_id", "event_type", "ts_us",
      Seq("signup", "view")).collect()(0)
    (r.getLong(0), r.getLong(1)) shouldBe ((1L, 1L))
  }

  test("dailyRetention counts previous-calendar-day actives only") {
    import spark.implicits._
    val act = Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-02"), // dup row
      (2L, "2024-01-01"), (2L, "2024-01-03"),                     // gap day
      (3L, "2024-01-02"), (3L, "2024-01-03")
    ).toDF("user_id", "d").withColumn("day", to_date(col("d")))
    val r = EventAnalytics.dailyRetention(act, "user_id", "day")
      .collect()
      .map(x => x.getDate(0).toString -> ((x.getLong(1), x.getLong(2))))
      .toMap
    r("2024-01-01") shouldBe ((2L, 0L))
    r("2024-01-02") shouldBe ((2L, 1L)) // user 1 returned; user 3 is new
    r("2024-01-03") shouldBe ((2L, 1L)) // user 3 returned; user 2 gapped
  }

  test("funnelByKeys counts entities per composite key") {
    import spark.implicits._
    val ev = Seq(
      // user 1 session 0: full funnel; session 1: view only
      (1L, 0L, "view", 10L), (1L, 0L, "click", 20L),
      (1L, 1L, "view", 100L),
      // user 2 session 0: click before view — view counts, click doesn't
      (2L, 0L, "click", 5L), (2L, 0L, "view", 10L)
    ).toDF("user_id", "sid", "event_type", "ts_us")
    val r = EventAnalytics.funnelByKeys(ev, Seq("user_id", "sid"),
      "event_type", "ts_us", Seq("view", "click")).collect()(0)
    (r.getLong(0), r.getLong(1)) shouldBe ((3L, 1L))
  }

  test("session funnel composes on the session windows' user exchange") {
    import spark.implicits._
    val ev = Seq((1L, "view", 10L), (1L, "click", 20L), (2L, "view", 5L))
      .toDF("user_id", "event_type", "ts_us")
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val sess = ev
      .withColumn("prev", lag(col("ts_us"), 1).over(wOrd))
      .withColumn("new_s", when(col("prev").isNull ||
        col("ts_us") - col("prev") > 100L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val plan = EventAnalytics.funnelByKeys(sess, Seq("user_id", "sid"),
      "event_type", "ts_us", Seq("view", "click"))
      .queryExecution.executedPlan.toString
    // the (user, sid) funnel windows and collapse must reuse the session
    // windows' hashpartitioning(user_id) — exactly one user exchange
    "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).length shouldBe 1
    "Exchange hashpartitioning\\(user_id#\\d+, sid".r
      .findAllIn(plan).length shouldBe 0
  }

  test("transitionMatrix: counts adjacent pairs per user, rows sum to 1") {
    import spark.implicits._
    // user 1: a->b->a ; user 2: a->b ; transitions: a->b x2, b->a x1
    val ev = Seq((1L, "a", 10L), (1L, "b", 20L), (1L, "a", 30L),
      (2L, "a", 5L), (2L, "b", 15L))
      .toDF("user_id", "t", "us")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = EventAnalytics.transitionMatrix(ev, "user_id", "t", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    got shouldBe Map(("a", "b") -> ((2L, 1.0)), ("b", "a") -> ((1L, 1.0)))
    // a branching row: user 3 a->c makes p(a->b)=2/3, p(a->c)=1/3
    val ev3 = ev.unionByName(Seq((3L, "a", 1L), (3L, "c", 2L))
      .toDF("user_id", "t", "us")
      .withColumn("ts", timestamp_micros(col("us"))))
    val got3 = EventAnalytics.transitionMatrix(ev3, "user_id", "t", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    got3(("a", "b")) shouldBe 2.0 / 3
    got3(("a", "c")) shouldBe 1.0 / 3
    // partition invariance: the (us, type) total order pins the lag
    val gotR = EventAnalytics.transitionMatrix(
      ev3.repartition(7), "user_id", "t", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val gotBase = EventAnalytics.transitionMatrix(ev3, "user_id", "t", "ts")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    gotR shouldBe gotBase
  }

  test("cohortRetention: min-week cohorts, exact week offsets, distinct " +
      "users per cell") {
    import spark.implicits._
    // 2026-01-05 and 2026-01-12 are Mondays. user 1: weeks 0 and 2 from
    // w0; user 2: weeks 0 and 1 from w0; user 3: week 1 only (own cohort)
    val ev = Seq(
      (1L, "2026-01-05 10:00:00"), (1L, "2026-01-07 09:00:00"), // dup week
      (1L, "2026-01-19 10:00:00"),
      (2L, "2026-01-06 10:00:00"), (2L, "2026-01-12 10:00:00"),
      (3L, "2026-01-13 10:00:00"))
      .toDF("user_id", "s").withColumn("ts", to_timestamp(col("s")))
    val got = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        r.getLong(2)).toMap
    got shouldBe Map(
      ("2026-01-05", 0L) -> 2L, // users 1, 2 in their first week
      ("2026-01-05", 1L) -> 1L, // user 2 returns week 1
      ("2026-01-05", 2L) -> 1L, // user 1 returns week 2
      ("2026-01-12", 0L) -> 1L) // user 3's own cohort
  }

  test("funnel plans one exchange: stage windows share the partitioning") {
    import spark.implicits._
    val ev = Seq((1L, "signup", 10L), (1L, "view", 20L))
      .toDF("user_id", "event_type", "ts_us")
    val plan = EventAnalytics.funnel(ev, "user_id", "event_type", "ts_us",
      Seq("signup", "view", "click")).queryExecution.executedPlan.toString
    // one shuffle for the user windows + the final single-row aggregate's
    // exchange; the three stage windows must NOT each re-shuffle, and the
    // per-user collapse must reuse the windows' partitioning
    val shuffles = "Exchange hashpartitioning\\(user_id".r
      .findAllIn(plan).length
    shuffles shouldBe 1
    // the per-user collapse also kills the countDistinct Expand
    plan should not include "Expand"
  }

  test("trailingZScores: hand-computed baselines, NULL on empty/constant, " +
      "keys independent, one exchange") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(
      ("a", 1, 1L), ("a", 2, 2L), ("a", 3, 3L), ("a", 4, 4L), ("a", 5, 100L),
      ("b", 1, 7L), ("b", 2, 7L), ("b", 3, 7L), ("b", 4, 7L) // constant
    ).toDF("k", "t", "n")
    val out = EventAnalytics.trailingZScores(df, "k", "t", "n", lookback = 3)
    val rows = out.collect().map { r =>
      (r.getString(0), r.getInt(1)) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }.toMap
    def zOf(x: Double, base: Seq[Double]): Double = {
      val m = base.sum / base.size
      val m2 = base.map(v => v * v).sum / base.size
      (x - m) / math.sqrt(m2 - m * m)
    }
    rows(("a", 1)) shouldBe None // empty baseline
    rows(("a", 2)) shouldBe None // single-point baseline: zero variance
    rows(("a", 3)).get shouldBe zOf(3, Seq(1, 2)) +- 1e-12
    rows(("a", 4)).get shouldBe zOf(4, Seq(1, 2, 3)) +- 1e-12
    rows(("a", 5)).get shouldBe zOf(100, Seq(2, 3, 4)) +- 1e-12
    // a constant baseline never divides by ~zero
    Seq(2, 3, 4).foreach(t => rows(("b", t)) shouldBe None)
    // the spike's z dwarfs the in-regime rows — the alerting property
    rows(("a", 5)).get should be > 50.0
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.trailingZScores(df, "k", "t", "n", lookback = 1)
    // both window aggregates share ONE Window node over one exchange —
    // a FRESH plan (the collected one's AQE finalization repeats the
    // exchange as a shuffle read in its plan string)
    val plan = EventAnalytics.trailingZScores(df, "k", "t", "n", 3)
      .queryExecution.executedPlan.toString
    "Exchange hashpartitioning\\(k".r.findAllIn(plan).length shouldBe 1
    "Window".r.findAllIn(plan).length shouldBe 1
  }

  test("timeDecayedSum matches a driver mirror; the newest event weighs " +
      "1.0; decay is anchor-relative (shifting all times is a no-op)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    val rows = (0 until 300).map { i =>
      val t = new java.sql.Timestamp(
        base.getTime + rnd.nextInt(96 * 3600) * 1000L + rnd.nextInt(1000))
      (if (i % 3 == 0) "a" else "b", t, rnd.nextDouble() * 100)
    }
    val df = rows.toDF("k", "ts", "v")
    val got = EventAnalytics.timeDecayedSum(df, "k", "ts", "v", 24.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val tmaxMs = rows.map(_._2.getTime).max
    def mirror(k: String): Double = rows.filter(_._1 == k).map { r =>
      r._3 * math.exp(-((tmaxMs - r._2.getTime) * 1000.0) / (24.0 * 3.6e9))
    }.sum
    got("a")._1 shouldBe 100L
    got("a")._2 shouldBe mirror("a") +- 1e-6
    got("b")._2 shouldBe mirror("b") +- 1e-6
    // a single newest event contributes exactly its value
    val one = Seq(("x", base, 7.5)).toDF("k", "ts", "v")
    EventAnalytics.timeDecayedSum(one, "k", "ts", "v", 24.0)
      .head().getDouble(2) shouldBe 7.5 +- 1e-12
    // shift every timestamp by 10 days: unchanged (anchor-relative)
    val shifted = rows.map { case (k, t, v) =>
      (k, new java.sql.Timestamp(t.getTime + 864000000L), v) }
      .toDF("k", "ts", "v")
    val got2 = EventAnalytics.timeDecayedSum(shifted, "k", "ts", "v", 24.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got2("a") shouldBe got("a")._2 +- 1e-9
    an[IllegalArgumentException] should be thrownBy
      EventAnalytics.timeDecayedSum(df, "k", "ts", "v", 0.0)
  }
}
