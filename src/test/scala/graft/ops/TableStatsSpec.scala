package graft.ops

import graft.SparkSpec

class TableStatsSpec extends SparkSpec {

  private lazy val mixed = {
    import spark.implicits._
    Seq(
      (Some(1L), Some(2.5), Some("b")),
      (Some(2L), None, Some("a")),
      (Some(2L), Some(7.5), None),
      (None, Some(2.5), Some("c"))
    ).toDF("k", "v", "s")
  }

  test("exact profile: counts, nulls, ndv, typed min/max") {
    val rows = TableStats.profile(mixed, Seq("k", "v", "s"),
      exactNdv = true).collect()
      .map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    (k.getLong(1), k.getLong(2), k.getLong(3)) shouldBe ((3L, 1L, 2L))
    (k.getDouble(4), k.getDouble(5)) shouldBe ((1.0, 2.0))
    k.isNullAt(6) shouldBe true
    val v = rows("v")
    (v.getLong(1), v.getLong(2), v.getLong(3)) shouldBe ((3L, 1L, 2L))
    (v.getDouble(4), v.getDouble(5)) shouldBe ((2.5, 7.5))
    val s = rows("s")
    (s.getLong(1), s.getLong(2), s.getLong(3)) shouldBe ((3L, 1L, 3L))
    s.isNullAt(4) shouldBe true
    (s.getString(6), s.getString(7)) shouldBe (("a", "c"))
  }

  test("approx profile: HLL ndv within rsd bounds of exact") {
    import spark.implicits._
    val df = (0L until 20000L).map(i => i % 5000).toDF("k")
    val nd = TableStats.profile(df, Seq("k")).collect()(0).getLong(3)
    nd.toDouble shouldBe 5000.0 +- 500.0 // ~3 sigma at rsd 0.05
  }

  test("histogram: equal-width bins, right-edge clamp, null drop") {
    import spark.implicits._
    val df = (Seq(0.0, 1.0, 2.5, 5.0, 7.5, 10.0).map(Option(_)) :+
      Option.empty[Double]).toDF("v")
    val bins = TableStats.histogram(df, "v", 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    // width 2.5: [0,2.5) has 0,1; [2.5,5) has 2.5; [5,7.5) has 5;
    // [7.5,10] has 7.5 and the clamped right edge 10
    bins(0L) shouldBe ((0.0, 2.5, 2L))
    bins(1L) shouldBe ((2.5, 5.0, 1L))
    bins(2L) shouldBe ((5.0, 7.5, 1L))
    bins(3L) shouldBe ((7.5, 10.0, 2L))
  }

  test("histogram with pinned bounds drops out-of-range rows") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 1.0, 9.0, 42.0).toDF("v")
    val bins = TableStats.histogram(df, "v", 2, bounds = Some((0.0, 10.0)))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    bins shouldBe Map(0L -> 2L, 1L -> 1L)
  }

  test("approx mode is Expand-free (one-pass at scale); exact mode is not") {
    val approx = TableStats.profile(mixed, Seq("k", "v", "s"))
      .queryExecution.executedPlan.toString
    approx should not include "Expand"
    val exact = TableStats.profile(mixed, Seq("k", "v", "s"),
      exactNdv = true).queryExecution.executedPlan.toString
    exact should include("Expand")
  }

  test("q129 approximate quantiles honor the GK rank contract against " +
      "the exact distribution") {
    import org.apache.spark.sql.functions.col
    val out = graft.queries.GraftQueries
      .q129ApproxQuantiles(spark, graft.TestSpark.sf0001)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    out should not be empty
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read
      .parquet(s"${graft.TestSpark.sf0001}/events.parquet")
      .select(col("event_type"), col("value"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val byType = ev.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { case (t, q, v) =>
      val xs = byType(t)
      // the sketch returns an actual data point...
      xs.contains(v) shouldBe true
      // ...whose rank is within N/accuracy of the target (+1 for
      // discreteness at the boundary)
      val rank = xs.count(_ <= v).toDouble
      val target = q * xs.length
      math.abs(rank - target) should be <=
        (xs.length.toDouble / graft.queries.GraftQueries.q129Accuracy + 1.0)
    }
  }

  test("joinKeyOverlap: small-cardinality sketches sit in the exact " +
      "regime — subset, disjoint, and partial overlaps are recovered") {
    import spark.implicits._
    def run(a: Seq[Long], b: Seq[Long]): (Long, Long, Long, Long, Long, Long) = {
      val r = TableStats.joinKeyOverlap(
        a.toDF("k"), b.toDF("k"), "k", "k").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))
    }
    // partial overlap with duplicate rows: keys 0..99 vs 50..149 (x2 rows)
    val a = (0L until 100L) ++ (0L until 20L)
    val b = (50L until 150L).flatMap(k => Seq(k, k))
    run(a, b) shouldBe ((120L, 200L, 100L, 100L, 150L, 50L))
    // dim-subset shape: every b key exists in a
    run(0L until 80L, 10L until 30L) shouldBe
      ((80L, 20L, 80L, 20L, 80L, 20L))
    // disjoint: intersection clamps at 0
    run(0L until 40L, 100L until 140L) shouldBe
      ((40L, 40L, 40L, 40L, 80L, 0L))
  }

  private def psi(ref: Seq[(String, Int)], cur: Seq[(String, Int)],
      nBuckets: Int): Map[String, (Long, Long, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    TableStats.psiDrift(ref.toDF("k", "b"), cur.toDF("k", "b"),
        "k", col("b"), nBuckets)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
  }

  test("psiDrift: identical distributions score 0; a full bucket shift " +
      "matches the hand smoothing math; mirror parity on random data") {
    val same = Seq.fill(50)(("a", 0)) ++ Seq.fill(30)(("a", 1))
    val (nr, nc, p0) = psi(same, same, 4)("a")
    nr shouldBe 80L; nc shouldBe 80L
    p0 shouldBe 0.0 +- 1e-12
    // ref all-bucket-0 vs cur all-bucket-1, 2 buckets, 10 rows each:
    // p=(11/12, 1/12), q=(1/12, 11/12); psi = 2 * (10/12) * ln(11)
    val shifted = psi(Seq.fill(10)(("a", 0)), Seq.fill(10)(("a", 1)), 2)
    shifted("a")._3 shouldBe (2 * (10.0 / 12) * math.log(11.0)) +- 1e-12
    // mirror on random multi-key data, incl. keys missing one side
    val rnd = new scala.util.Random(9)
    val ref = (0 until 400).map(_ =>
      (if (rnd.nextBoolean()) "x" else "y", rnd.nextInt(6)))
    val cur = (0 until 300).map(_ =>
      (if (rnd.nextInt(3) == 0) "x" else "y", (rnd.nextInt(6) + 1) % 6))
    val got = psi(ref, cur, 6)
    Seq("x", "y").foreach { k =>
      val cr = (0 until 6).map(b => ref.count(r => r._1 == k && r._2 == b))
      val cc = (0 until 6).map(b => cur.count(r => r._1 == k && r._2 == b))
      val (tr, tc) = (cr.sum, cc.sum)
      val want = (0 until 6).map { b =>
        val p = (cr(b) + 1.0) / (tr + 6); val q = (cc(b) + 1.0) / (tc + 6)
        (p - q) * math.log(p / q)
      }.sum
      got(k)._1 shouldBe tr.toLong
      got(k)._2 shouldBe tc.toLong
      got(k)._3 shouldBe want +- 1e-9
    }
    an[IllegalArgumentException] should be thrownBy psi(same, same, 1)
  }
}
