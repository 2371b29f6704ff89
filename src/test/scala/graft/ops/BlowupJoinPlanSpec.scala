package graft.ops

import graft.{GraftSession, SparkSpec, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}

/** Plan-shape guard for the blow-up joins (VERDICT r11 task 3): the
  * round-11 SMJ→SHJ re-plan lives in a session conf
  * (`GraftSession.ShjThresholdKey`), so nothing would FAIL if an operator
  * ran without it — the candidate-verify / wedge-closing joins would
  * silently revert to sort-merge-with-spill, the exact plan family the
  * re-plan retired (q92 sf1 44.7→27.6 s). These cases pin the final
  * adaptive plan under the conf, and the one-time warning that fires
  * without it.
  *
  * Broadcast is disabled in the test session on purpose: at fixture scale
  * every build side broadcasts, which would hide the very conversion
  * under test — here AQE must pick the shuffled-hash build from actual
  * map-output sizes, the mid-scale regime the 100 TB plan relies on. */
class BlowupJoinPlanSpec extends SparkSpec {

  /** Every physical node of the FINAL (post-execution) plan, expanding
    * adaptive wrappers and materialized query stages — `collect` alone
    * stops at the `AdaptiveSparkPlanExec` / `QueryStageExec` leaves. */
  private def finalNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => a +: finalNodes(a.executedPlan)
      case q: QueryStageExec => q +: finalNodes(q.plan)
      case n => Seq(n)
    }

  private def shjSession() = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set(GraftSession.ShjThresholdKey, (128L << 20).toString)
    // force the non-broadcast regime (see class doc)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  private def assertHashBuilt(df: DataFrame, what: String): Unit = {
    df.collect() // finalize AQE on the dataframe's own query execution
    val nodes = finalNodes(df.queryExecution.executedPlan)
    withClue(s"$what final adaptive plan: ") {
      nodes.collect { case j: SortMergeJoinExec => j } shouldBe empty
      nodes.collect { case j: ShuffledHashJoinExec => j } should not be empty
    }
  }

  test("dedup attach joins hash-build (never sort-merge) under the " +
      "GraftSession SHJ conf") {
    val s = shjSession()
    val docs = s.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
    assertHashBuilt(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 1,
        threshold = 0.9, blocking = "prefix"),
      "ngramJaccardPairs candidate-verify/attach")
  }

  test("q92 wedge-closing join hash-builds (never sort-merge) under the " +
      "GraftSession SHJ conf") {
    val s = shjSession()
    val df = graft.queries.GraftQueries
      .all("q92_triangles")(s, TestSpark.sf0001)
    df.collect()
    val nodes = finalNodes(df.queryExecution.executedPlan)
    // scope to the blow-up joins: the wedge join (key s) and the closing
    // join (keys a,b). The O(n) per-node count attach join legitimately
    // stays SMJ — its logical child is an Aggregate, not a query stage,
    // so AQE's runtime hint can't apply, and it's not a blow-up.
    def keyNames(j: org.apache.spark.sql.execution.joins.BaseJoinExec) =
      (j.leftKeys ++ j.rightKeys).flatMap(_.references.map(_.name)).toSet
    val blowupKeys = Set("s", "a", "b")
    val blowupSmj = nodes.collect {
      case j: SortMergeJoinExec if (keyNames(j) & blowupKeys).nonEmpty => j
    }
    val closingShj = nodes.collect {
      case j: ShuffledHashJoinExec
        if Set("a", "b").subsetOf(keyNames(j)) => j
    }
    withClue("triangle wedge/closing joins in the final adaptive plan: ") {
      blowupSmj shouldBe empty
      closingShj should not be empty
    }
  }

  test("above the edge threshold the closing join hash-builds via the " +
      "static hint EVEN WITHOUT the AQE conf (the sf1 regime)") {
    // r12 finding: the AQE conversion needs every map partition of BOTH
    // sides under its threshold, and the wedge side's partitions at sf1
    // are GB-scale — so q92/q97 ran all-SMJ at exactly the scale the
    // re-plan exists for. Above spark.graft.graph.shjForceEdges the
    // build side (ids-only, too big to broadcast) gets a shuffle_hash
    // hint; here the threshold is lowered to 1 and the AQE conf left
    // UNSET so only the hint can produce the hash build.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.graft.graph.shjForceEdges", "1")
    try {
      val df = graft.queries.GraftQueries
        .all("q92_triangles")(s, TestSpark.sf0001)
      df.collect()
      val nodes = finalNodes(df.queryExecution.executedPlan)
      def keyNames(j: org.apache.spark.sql.execution.joins.BaseJoinExec) =
        (j.leftKeys ++ j.rightKeys).flatMap(_.references.map(_.name)).toSet
      val closing = nodes.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if Set("a", "b").subsetOf(keyNames(j)) => j
      }
      withClue("forced closing join without the AQE conf: ") {
        closing should not be empty
        closing.collect { case j: SortMergeJoinExec => j } shouldBe empty
      }
    } finally s.conf.unset("spark.graft.graph.shjForceEdges")
  }

  test("the closing-join hint boundary derives from the session's " +
      "broadcast threshold: a raised threshold broadcasts where the " +
      "hint would force SHJ (r12 task 3)") {
    // Same graph, three sessions, no explicit shjForceEdges conf:
    //  (a) broadcast disabled → build side can never broadcast → the
    //      derived rule fires the hint → ShuffledHashJoin;
    //  (b) broadcast threshold raised above m·16 B → broadcast wins →
    //      BroadcastHashJoin on the closing join, NO forced shuffle
    //      build (the r12 constant-cutoff bug: 2M edges assumed the
    //      10 MB default, so a 128 MB-threshold session got a forced
    //      shuffle build exactly where broadcast wins).
    def closingJoins(s: org.apache.spark.sql.SparkSession) = {
      val df = graft.queries.GraftQueries
        .all("q92_triangles")(s, TestSpark.sf0001)
      df.collect()
      def keyNames(j: org.apache.spark.sql.execution.joins.BaseJoinExec) =
        (j.leftKeys ++ j.rightKeys).flatMap(_.references.map(_.name)).toSet
      finalNodes(df.queryExecution.executedPlan).collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
          if Set("a", "b").subsetOf(keyNames(j)) => j
      }
    }
    val noBc = spark.newSession()
    noBc.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val forced = closingJoins(noBc)
    withClue("broadcast disabled — derived rule must force the hash build: ") {
      forced should not be empty
      forced.collect { case j: SortMergeJoinExec => j } shouldBe empty
      forced.collect { case j: ShuffledHashJoinExec => j } should not be empty
    }
    val bigBc = spark.newSession()
    bigBc.conf.set("spark.sql.autoBroadcastJoinThreshold", (128L << 20).toString)
    val bcast = closingJoins(bigBc)
    withClue("raised broadcast threshold — broadcast must win, no forced " +
        "shuffle build: ") {
      bcast should not be empty
      bcast.collect { case j: ShuffledHashJoinExec => j } shouldBe empty
      bcast.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      } should not be empty
    }
  }

  test("blow-up ops warn ONCE (per JVM) under a session missing the " +
      "SHJ conversion, never under GraftSession's conf") {
    GraftSession.resetShjWarning()
    try {
      // the shared test session deliberately lacks the conf
      GraftSession.runtimeShjEnabled(spark) shouldBe false
      GraftSession.runtimeShjEnabled(shjSession()) shouldBe true
      // Spark accepts unit-suffixed byte strings for this conf — a
      // session configured '128m' carries the conversion and must not
      // trip the spurious warning (ADVICE r12)
      val unitConf = spark.newSession()
      unitConf.conf.set(GraftSession.ShjThresholdKey, "128m")
      GraftSession.runtimeShjEnabled(unitConf) shouldBe true
      GraftSession.warnIfNoRuntimeShj(unitConf, "spec") shouldBe false
      GraftSession.warnIfNoRuntimeShj(spark, "spec") shouldBe true
      GraftSession.warnIfNoRuntimeShj(spark, "spec") shouldBe false // latched
      GraftSession.resetShjWarning()
      GraftSession.warnIfNoRuntimeShj(shjSession(), "spec") shouldBe false
      // still armed after a conf-bearing call: a later bare session warns
      GraftSession.warnIfNoRuntimeShj(spark, "spec") shouldBe true
    } finally GraftSession.resetShjWarning()
  }
}
