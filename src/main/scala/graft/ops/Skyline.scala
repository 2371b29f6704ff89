package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skyline (Pareto-frontier) selection: the rows not strictly dominated
  * on two maximize-dimensions — the multi-criteria curation pick ("keep
  * documents on the quality/recency frontier", "orders on the
  * value/freshness frontier") that no single ORDER BY can express.
  *
  * Exactness at scale comes from two properties of dominance:
  *
  *   1. the classic 2-D sweep: group to one row per distinct x with its
  *      max y; an (x, maxY) combination survives iff its y strictly
  *      exceeds the running max-y over all STRICTLY larger x. The sweep
  *      runs on the x-DISTINCT aggregate, not the raw rows.
  *   2. frontier-of-frontiers composition: dominance is transitive, so
  *      the global frontier equals the frontier of the union of
  *      partition-local frontiers. Stage 1 prunes each partition to its
  *      local frontier with a partition-keyed window (fully parallel,
  *      no global sort of raw rows); stage 2 runs the same sweep
  *      globally on the tiny surviving set.
  *
  * Ties: rows with IDENTICAL (x, y) do not strictly dominate each other —
  * all are kept (the SQL NOT EXISTS dominance oracle agrees by the same
  * definition). Nulls in either dimension are not ordered under
  * dominance and are dropped up front.
  */
object Skyline {

  /** The Pareto frontier of `df` maximizing both `xCol` and `yCol`
    * (numeric). Returns the full original rows of the frontier. */
  def paretoMax2(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val clean = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
    val local = localFrontiers(clean, xCol, yCol)
    // using-column joins front-load the join keys; restore input order
    frontier(local, Seq.empty, xCol, yCol)
      .select(clean.columns.map(col): _*)
  }

  /** Stage 1 of [[paretoMax2]]: the union of the 64 hash-group local
    * frontiers — the stage-2 input whose smallness IS the composition's
    * scale claim (package-visible so the x_skyline bench row can log it).
    * Stage-1 groups come from a row-DETERMINISTIC hash of the dimension
    * values, not `spark_partition_id()`: the pid is not stable across the
    * semi join's two evaluations of the frame (AQE re-coalesces each
    * execution independently), and the composition law holds for ANY
    * grouping — a value hash also makes the result provably independent
    * of input partitioning. */
  private[graft] def localFrontiers(clean: DataFrame, xCol: String,
      yCol: String): DataFrame =
    frontier(
      clean.withColumn("__grp", pmod(xxhash64(col(xCol), col(yCol)),
        lit(64L))),
      Seq("__grp"), xCol, yCol).drop("__grp")

  /** One sweep: per-(parts, x) max y, running max over strictly larger x
    * within `parts`, semi-join the surviving (x, y) combinations back. */
  private def frontier(df: DataFrame, partCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val parts = partCols.map(col)
    val perx = df.groupBy(parts :+ col(xCol): _*)
      .agg(max(col(yCol)).as(yCol))
    val base =
      if (partCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(parts: _*)
    val w = base.orderBy(col(xCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val keep = perx
      .withColumn("__cm", max(col(yCol)).over(w))
      // dominated iff some strictly-larger x reaches y >= ours (strict
      // x makes that dominance); same-x strict-y dominance is enforced
      // by the per-x max + the (x, y) semi join
      .filter(col("__cm").isNull || col(yCol) > col("__cm"))
      .select((partCols :+ xCol :+ yCol).map(col): _*)
    df.join(broadcast(keep), partCols :+ xCol :+ yCol, "leftsemi")
  }
}
