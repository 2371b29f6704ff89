package graft

import org.apache.spark.sql.SparkSession

/** Opinionated session factory: the configs this engine assumes at scale.
  *
  * These mirror what a 1000-executor deployment would set cluster-side;
  * locally they keep partition counts matched to cores instead of the
  * 200-partition default.
  *
  * Cluster deployments should additionally set `spark.graft.materialize`
  * (see [[Graft.materialize]]): the engine's multi-reuse intermediates
  * default to `localCheckpoint` — correct and fastest single-JVM, but not
  * executor-loss tolerant; set `reliable` (+ a durable
  * `SparkContext.setCheckpointDir`) or `replicated` on a real cluster.
  */
object GraftSession {

  def builder(master: String = "local[*]",
      shufflePartitions: Int = Runtime.getRuntime.availableProcessors())
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions) // vec_dot & co in SQL
      // data-scale override (same env Verify honors): at 10x fixtures the
      // heavyweight shuffles want partitions sized to the DATA, not the
      // core count — AQE coalesces the small queries back down for free
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS",
          shufflePartitions.toString))
      // AQE: runtime coalescing, skew-join splitting, plan re-optimization
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // scans: 128m splits; small-file coalescing happens via AQE
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
