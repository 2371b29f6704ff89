package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executor-loss demonstration for [[Graft.materialize]] strategies —
  * the multi-executor counterpart of MaterializeSpec (which covers
  * strategy selection and failure modes on `local[*]`, where executor
  * loss cannot happen).
  *
  * Runs a 5-iteration PageRank on a ring graph under
  * `local-cluster[2,1,1024]` (two REAL executor JVMs), kills executor 0
  * through the standalone backend after the second iteration's
  * materialization, and finishes the loop:
  *   - `reliable` (durable `checkpoint`): the remaining executor
  *     recomputes from the checkpoint files — the run COMPLETES and the
  *     ring's symmetry check holds (all ranks equal). Prints `COMPLETED`.
  *   - `local` (`localCheckpoint`): iteration state lived only in the
  *     dead executor's block store; the truncated lineage is
  *     unrecoverable and the job fails (`Checkpoint block ... not
  *     found`). Prints `FAILED_AS_EXPECTED` — this is the documented
  *     reason `local` is a single-JVM default, not a cluster setting.
  *
  * Launched by MaterializeClusterSpec in a separate JVM (one
  * SparkContext per JVM; the test suite's shared `local[*]` session
  * must keep running). Exit code 0 iff the strategy behaved as
  * documented.
  */
object ClusterFailureDemo {

  def main(args: Array[String]): Unit = {
    val strategy = args.headOption.getOrElse("reliable")
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .appName(s"graft-failure-$strategy")
      .config(Graft.MaterializeKey, strategy)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      // the forked executor JVMs need the engine classes
      .config("spark.executor.extraClassPath", sys.props("java.class.path"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (strategy == "reliable")
      spark.sparkContext.setCheckpointDir(
        s"/tmp/graft-cluster-ck-${System.nanoTime()}")
    import Graft.MaterializeOps

    // wait for both executors before placing any blocks, so iteration
    // state provably straddles the executor that dies
    val deadline = System.currentTimeMillis() + 60000
    while (spark.sparkContext.statusTracker.getExecutorInfos.length < 3 &&
        System.currentTimeMillis() < deadline) Thread.sleep(200)
    require(spark.sparkContext.statusTracker.getExecutorInfos.length >= 3,
      "local-cluster executors did not come up") // driver + 2 executors

    val n = 100
    // ring: i -> (i+1) % n; by symmetry every PageRank is exactly 1/n
    val edges = spark.range(n)
      .select(col("id").as("src"), ((col("id") + 1) % n).as("dst"))
      .repartition(4).materialized
    var ranks = spark.range(n)
      .select(col("id").as("src"), lit(1.0 / n).as("rank"))
      .repartition(4).materialized
    val outcome =
      try {
        for (i <- 1 to 5) {
          // ring out-degree is 1: contribution = full rank along the edge
          ranks = edges.join(ranks, "src")
            .groupBy(col("dst").as("src"))
            .agg(sum(col("rank")).as("contrib"))
            .select(col("src"),
              (lit(0.15 / n) + lit(0.85) * col("contrib")).as("rank"))
            .materialized
          if (i == 2) {
            // standalone app executor ids are "0"/"1"; kill one (no
            // replacement) through the backend, like a preempted container
            if (!spark.sparkContext.killExecutors(Seq("0")))
              spark.sparkContext.killExecutors(Seq("1"))
            Thread.sleep(3000) // let the loss propagate to the block master
          }
        }
        val rows = ranks.collect()
        val vals = rows.map(_.getDouble(1))
        require(rows.length == n, s"expected $n ranks, got ${rows.length}")
        require(vals.max - vals.min < 1e-12,
          s"ring symmetry broken: spread ${vals.max - vals.min}")
        "COMPLETED"
      } catch {
        case e: Throwable =>
          // walk the cause chain: the signature of unrecoverable local
          // checkpoint state is a lost RDD/checkpoint block surfacing as
          // the aborted job's task failure reason
          val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
            .take(10).map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
          println(s"DEMO_FAILURE_DETAIL=${msgs.replaceAll("\\s+", " ").take(400)}")
          if (msgs.contains("Checkpoint block") ||
              msgs.contains("block") || msgs.contains("Block"))
            "FAILED_AS_EXPECTED"
          else throw e
      }
    println(s"DEMO_OUTCOME=$outcome strategy=$strategy")
    spark.stop()
    val ok = (strategy, outcome) match {
      case ("reliable", "COMPLETED") => true
      case ("local", "FAILED_AS_EXPECTED") => true
      case _ => false
    }
    sys.exit(if (ok) 0 else 1)
  }
}
