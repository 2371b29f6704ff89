package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Engine-wide helpers. The one that matters at scale: the shared
  * materialization point for every multi-reuse / lineage-cut intermediate
  * frame (oriented edge lists, shingle sets, candidate pair frames,
  * connected-components round state, streaming index state).
  *
  * Why a strategy switch: `localCheckpoint(true)` — the local default —
  * stores the truncated lineage's blocks on EXECUTORS ONLY. On a
  * single-JVM local[n] session that is free and fast, but on a
  * 1000-executor cluster one lost executor makes the truncated lineage
  * unrecoverable and fails the whole job — a 5-iteration PageRank or a
  * 40M-candidate dedup verify must not die because one container was
  * preempted. The cluster-side answers are a reliable `checkpoint()` to
  * durable storage (survives any loss; pays one write+read of the frame)
  * or a 2x-replicated persist (survives single loss; keeps lineage, so
  * plan nesting still grows under iteration — prefer `reliable` for
  * unbounded round counts).
  *
  * Configured per session via `spark.graft.materialize`:
  *   - `local` (default): `localCheckpoint(true)` — single-JVM / demo
  *   - `reliable`: `checkpoint(true)` — requires
  *     `SparkContext.setCheckpointDir` to point at durable shared storage
  *     (HDFS/object store on a cluster)
  *   - `replicated`: eager `persist(MEMORY_AND_DISK_2)` — no lineage cut,
  *     single-loss tolerant, no durable-storage round trip
  */
object Graft {

  /** Session config key selecting the materialization strategy. */
  val MaterializeKey = "spark.graft.materialize"

  /** Materialize `df` eagerly for multi-reuse, per the session's
    * [[MaterializeKey]] strategy. Always returns a frame whose consumers
    * will NOT recompute the upstream plan. */
  def materialize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // capStats on both checkpoint variants: checkpoint PRESERVES the
    // logical plan's statistics snapshot. Small frames must KEEP their
    // real sizes (that's what lets Catalyst broadcast a materialized
    // candidate frame — dropping stats outright regressed the dedup
    // joins 3-5x, measured), but size stats compose multiplicatively
    // through joins, so an iterative fixpoint that materializes a
    // self-join each round SQUARES sizeInBytes (bits double) until stats
    // computation itself hangs the driver in billion-bit BigInt math
    // (~25 rounds; bit the q130 h-index fixpoint live). The cap keeps
    // real sizes below it and clamps the blowup above it.
    spark.conf.get(MaterializeKey, "local") match {
      case "local" =>
        org.apache.spark.sql.GraftSqlBridge.capStats(
          df.localCheckpoint(eager = true))
      case "reliable" =>
        require(spark.sparkContext.getCheckpointDir.isDefined,
          s"$MaterializeKey=reliable needs SparkContext.setCheckpointDir " +
            "pointed at durable shared storage")
        org.apache.spark.sql.GraftSqlBridge.capStats(
          df.checkpoint(eager = true))
      case "replicated" =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        p.count() // eager: parity with the checkpoint variants
        p
      case other => throw new IllegalArgumentException(
        s"$MaterializeKey must be local|reliable|replicated, got '$other'")
    }
  }

  /** Chainable syntax: `df.materialized` ≡ [[materialize]](df). */
  implicit class MaterializeOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = materialize(df)
  }
}
