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
  *
  * Env overrides (both validated up front — a typo fails HERE with the
  * variable named, not later inside Spark with an opaque parse error):
  *   - `SPARK_GRAFT_SHUFFLE_PARTITIONS` — data-scale shuffle sizing;
  *     takes precedence over the `shufflePartitions` argument by design
  *     (the argument encodes the core count, the env encodes the DATA —
  *     at 10x fixtures the heavyweight shuffles want ~160k-row task
  *     sorts, and AQE coalesces the small queries back down for free).
  *   - `SPARK_GRAFT_SHJ_THRESHOLD_MB` — per-partition build cap for the
  *     AQE runtime SMJ→shuffled-hash conversion (default 128).
  */
object GraftSession {

  /** The key behind [[runtimeShjEnabled]] / the blow-up-join re-plan. */
  val ShjThresholdKey = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

  private def envPosInt(name: String): Option[Int] =
    sys.env.get(name).map { v =>
      val n =
        try v.trim.toInt
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$name must be a positive integer, got '$v'")
        }
      require(n > 0, s"$name must be positive, got $n")
      n
    }

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
        envPosInt("SPARK_GRAFT_SHUFFLE_PARTITIONS")
          .getOrElse(shufflePartitions).toString)
      // AQE: runtime coalescing, skew-join splitting, plan re-optimization
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime SMJ -> shuffled-hash conversion from ACTUAL map-output
      // sizes (off by default): candidate-verify and wedge-closing joins
      // stream a blow-up side against a corpus-sized build side, and the
      // sort-merge sort on the blow-up grows strictly faster than the
      // data. With this set, AQE hash-builds any side whose largest
      // build partition fits the threshold — and still prefers broadcast
      // below the broadcast threshold — so toy corpora broadcast,
      // mid-scale hash-builds, and only genuinely unbuildable sides
      // sort-merge. HEAP SIZING: the threshold caps the SERIALIZED
      // map-output per build partition; the in-memory hash relation runs
      // ~2-4x that, times concurrently-building tasks — at the 128 MB
      // default budget ~0.5 GB/core of headroom (the sf1 bench needs
      // SPARK_DRIVER_MEM=64g on 32 cores; NOTES_r11 §8). Shrink via
      // SPARK_GRAFT_SHJ_THRESHOLD_MB on tight heaps — SMJ-with-spill is
      // the graceful floor, not a failure.
      .config(ShjThresholdKey,
        (envPosInt("SPARK_GRAFT_SHJ_THRESHOLD_MB").getOrElse(128).toLong
          << 20).toString)
      // scans: 128m splits; small-file coalescing happens via AQE
      .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Whether `spark` carries the runtime SMJ→SHJ conversion the blow-up
    * joins (dedup candidate-verify/attach, wedge closing, simhash probe
    * expansion) are planned around. False on a foreign session → those
    * joins silently revert to sort-merge-with-spill on their candidate
    * blow-ups (the plan family round 11 retired). */
  def runtimeShjEnabled(spark: SparkSession): Boolean =
    spark.conf.getOption(ShjThresholdKey).exists(v => parseBytes(v) > 0)

  /** Spark byte-size conf values accept unit suffixes ('128m', '1g') as
    * well as bare byte counts — a bare `toLong` would mis-read a
    * unit-suffixed session as "conf absent" (ADVICE r12). Unparseable →
    * -1 (treated as disabled, matching Spark's own sentinel). */
  private[graft] def parseBytes(v: String): Long =
    try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(v.trim)
    catch { case scala.util.control.NonFatal(_) => -1L }

  private val shjWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** One-time (per JVM) warning when a blow-up-path operator runs under a
    * session missing the SHJ conversion — the conf is session-level, so
    * nothing else would surface the silent plan regression. Returns
    * whether the warning FIRED (false = conf present or already warned),
    * so the path is spec-testable without log capture. */
  def warnIfNoRuntimeShj(spark: SparkSession, site: String): Boolean = {
    if (runtimeShjEnabled(spark)) false
    else if (shjWarned.compareAndSet(false, true)) {
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$site: session lacks $ShjThresholdKey — candidate/wedge blow-up " +
          "joins will sort-merge (and spill) instead of hash-building; " +
          "build the session via GraftSession.builder() or set the conf")
      true
    } else false
  }

  /** Test seam: re-arm the one-time warning latch. */
  private[graft] def resetShjWarning(): Unit = shjWarned.set(false)
}
