package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  // train docs 1-3; eval doc shares the span "x y z" with train doc 1 only
  private def fixture = {
    import spark.implicits._
    val train = Seq(
      (1L, "a b x y z c d x y z"), // "x y z" twice -> 2 spans, 1 gram
      (2L, "p q r s t u v"),
      (3L, "x y w z q")            // no shared 3-gram
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "m n x y z k")).toDF("doc_id", "text")
    (train, eval)
  }

  test("contamination counts occurrences and distinct grams") {
    val (train, eval) = fixture
    val ev = Decontaminate.evalGramDigests(eval, "text", 3)
    val out = Decontaminate.contamination(train, "doc_id", "text", ev, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    out.toSeq shouldBe Seq((1L, 2L, 1L))
  }

  test("clean drops exactly the contaminated docs") {
    val (train, eval) = fixture
    val ev = Decontaminate.evalGramDigests(eval, "text", 3)
    Decontaminate.clean(train, "doc_id", "text", ev, 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(2L, 3L)
  }

  test("matches brute force on seeded random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    def doc() = Seq.fill(5 + rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val train = (0L until 50L).map(i => (i, doc()))
    val eval = (100L until 110L).map(i => (i, doc()))
    val n = 3

    def grams(s: String) = s.split("\\s+").filter(_.nonEmpty)
      .sliding(n).filter(_.size == n).map(_.mkString(" ")).toSeq
    val evalSet = eval.flatMap(e => grams(e._2)).toSet
    val expected = train.map { case (id, txt) =>
      val hits = grams(txt).filter(evalSet.contains)
      id -> ((hits.size.toLong, hits.distinct.size.toLong))
    }.filter(_._2._1 > 0).toMap

    val ev = Decontaminate.evalGramDigests(eval.toDF("doc_id", "text"),
      "text", n)
    val out = Decontaminate.contamination(train.toDF("doc_id", "text"),
        "doc_id", "text", ev, n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    out shouldBe expected

    // clean == train minus the contaminated ids
    Decontaminate.clean(train.toDF("doc_id", "text"), "doc_id", "text", ev, n)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      train.map(_._1).toSet -- expected.keySet
  }

  test("train side joins broadcast: no train-side Exchange before the join") {
    // the membership test must be map-side — every join in the plan is a
    // broadcast join, and no shuffle Exchange feeds a join (the only
    // ShuffleExchange allowed is the final groupBy on contaminated ids)
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec, ShuffledHashJoinExec}
    val (train, eval) = fixture
    val ev = Decontaminate.evalGramDigests(eval, "text", 3)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val plan = try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      Decontaminate.contamination(train, "doc_id", "text", ev, 3)
        .queryExecution.executedPlan
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    plan.collect { case j: SortMergeJoinExec => j } shouldBe empty
    plan.collect { case j: ShuffledHashJoinExec => j } shouldBe empty
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    bhj should not be empty
    // the streamed (train) side reaches the join with no shuffle at all —
    // the membership test is map-side; the only shuffles are the tiny
    // eval-side distinct and the post-join aggregation of contaminated hits
    bhj.foreach { j =>
      val streamed = j.buildSide match {
        case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.left
        case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.right
      }
      streamed.collect { case e: ShuffleExchangeExec => e } shouldBe empty
    }
  }

  test("bloom two-phase == exact contamination (no false negatives leak, " +
      "false positives die in the confirm join)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta")
    def doc() = Seq.fill(5 + rnd.nextInt(12))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val train = (0L until 60L).map(i => (i, doc())).toDF("doc_id", "text")
    val eval = (100L until 112L).map(i => (i, doc())).toDF("doc_id", "text")
    val ev = Decontaminate.evalGramDigests(eval, "text", 3)
    val exact = Decontaminate.contamination(train, "doc_id", "text", ev, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // a deliberately terrible fpp maximizes false positives reaching the
    // confirm join — they must all die there
    for (fpp <- Seq(0.5, 0.01)) {
      val bloom = Decontaminate.contaminationBloom(train, "doc_id", "text",
          ev, 3, fpp = fpp)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      bloom shouldBe exact
    }
    Decontaminate.cleanBloom(train, "doc_id", "text", ev, 3, fpp = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe
      (0L until 60L).toSet -- exact.map(_._1)
  }

  test("bloom prefilter sits BELOW the confirm join — survivors are " +
      "thinned map-side before any exchange") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join}
    val (train, eval) = fixture
    val ev = Decontaminate.evalGramDigests(eval, "text", 3)
    val plan = Decontaminate.contaminationBloom(train, "doc_id", "text",
      ev, 3).queryExecution.optimizedPlan
    def hasBloom(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
        : Boolean =
      p.collect { case f: Filter if f.condition.collectFirst {
        case b: graft.expressions.BloomMightContainLong => b
      }.isDefined => f }.nonEmpty
    val joins = plan.collect { case j: Join => j }
    joins should not be empty
    // the bottom-most join is the confirm join; the bloom probe must
    // survive optimization INSIDE one of its input subtrees, not above it
    val confirm = joins.last
    assert(hasBloom(confirm.left) || hasBloom(confirm.right),
      s"bloom filter not under the confirm join:\n$plan")
  }

  test("contaminationBloom rejects a nonsense fpp") {
    val (train, eval) = fixture
    val ev = Decontaminate.evalGramDigests(eval, "text", 3)
    an[IllegalArgumentException] should be thrownBy
      Decontaminate.contaminationBloom(train, "doc_id", "text", ev, 3,
        fpp = 1.5)
  }

  test("overlapFraction: distinct-gram fraction, zero-overlap docs at 0.0, " +
      "sub-gram docs absent") {
    import spark.implicits._
    val train = Seq(
      (1L, "a b x y z c d x y z"), // grams: 8 raw, 7 distinct ("x y z" twice)
      (2L, "p q r s t u v"),       // zero overlap, 5 distinct grams
      (3L, "x y")                  // < 3 tokens: no 3-grams, absent
    ).toDF("doc_id", "text")
    val ev = Decontaminate.evalGramDigests(
      Seq((100L, "m n x y z k")).toDF("doc_id", "text"), "text", n = 3)
    val out = Decontaminate.overlapFraction(train, "doc_id", "text", ev, n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    out.keySet shouldBe Set(1L, 2L)
    out(1L) shouldBe ((7L, 1L, 1.0 / 7.0)) // "x y z" is the one shared gram
    out(2L) shouldBe ((5L, 0L, 0.0))
  }

  test("overlapFraction matches brute force on a seeded random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def doc(n: Int) = (0 until n).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")
    val trainRows = (1L to 80L).map(i => (i, doc(4 + rnd.nextInt(20))))
    val evalRows = (1L to 10L).map(i => (i, doc(4 + rnd.nextInt(20))))
    def grams(t: String) = t.split("\\s+").filter(_.nonEmpty)
      .sliding(4).filter(_.size == 4).map(_.mkString(" ")).toSet
    val evalGrams = evalRows.flatMap(r => grams(r._2)).toSet
    val want = trainRows.map { case (id, t) =>
      val g = grams(t)
      id -> ((g.size.toLong, g.count(evalGrams).toLong,
        g.count(evalGrams).toDouble / g.size))
    }.filter(_._2._1 > 0).toMap
    val ev = Decontaminate.evalGramDigests(
      evalRows.toDF("doc_id", "text"), "text", n = 4)
    val got = Decontaminate.overlapFraction(
        trainRows.toDF("doc_id", "text"), "doc_id", "text", ev, n = 4)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    got shouldBe want
  }
}
