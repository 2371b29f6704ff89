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
      // runtime SMJ -> shuffled-hash conversion from ACTUAL map-output
      // sizes (off by default): candidate-verify and wedge-closing joins
      // stream a blow-up side against a corpus-sized build side, and the
      // sort-merge sort on the blow-up grows strictly faster than the
      // data. With this set, AQE hash-builds any side whose largest
      // build partition fits 128 MB — and still prefers broadcast below
      // the broadcast threshold — so toy corpora broadcast, mid-scale
      // hash-builds, and only genuinely unbuildable sides sort-merge.
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        (128L << 20).toString)
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
