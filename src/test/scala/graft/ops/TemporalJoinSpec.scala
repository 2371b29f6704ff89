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
}
