package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column <-> Expression conversions
  * (the classic `new Column(expr)` constructor is gone in the split
  * Connect/Classic API). Lives in the sql package on purpose. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** [[Observation]] result with a BOUNDED wait. `Observation.get` blocks
    * forever on the async ExecutionListenerBus — a dropped event
    * (queue-full under load) would hang the caller; `getOrEmpty` is
    * `private[sql]`, hence this bridge. Polls until the metrics row
    * lands or `timeoutMs` elapses; `None` on timeout. */
  def observationResultWithin(obs: Observation,
      timeoutMs: Long): Option[Map[String, Any]] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var m = obs.getOrEmpty
    while (m.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(5); m = obs.getOrEmpty
    }
    if (m.isEmpty) None else Some(m.toMap)
  }

  /** Free the storage behind a [[graft.Graft.materialize]]d frame once an
    * iterative fixpoint has replaced it. `localCheckpoint`/`checkpoint`
    * return a `LogicalRDD` whose blocks live in the block manager until
    * GC + ContextCleaner get around to them — a 38-round fixpoint that
    * materializes per round otherwise leaves 38 generations of dead
    * blocks accumulating, and across a long-lived session (a bench
    * suite, a streaming driver) that turns into old-gen churn and
    * block-manager pressure charged to whatever runs NEXT. No-op for
    * frames that are not materialize-backed; `persist`-backed frames
    * (the `replicated` strategy) unpersist through the Dataset API. */
  def unpersistMaterialized(df: DataFrame): Unit = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: execution.LogicalRDD => l.rdd.unpersist(blocking = false)
      case _ => ds.unpersist(blocking = false)
    }
  }

  /** CAP the statistics snapshot `checkpoint`/`localCheckpoint` preserve
    * on the returned `LogicalRDD`. The preserved snapshot is load-bearing
    * AND dangerous:
    *
    *  - load-bearing: a small materialized frame's real size is what
    *    lets Catalyst broadcast it (dropping stats entirely regressed
    *    the dedup candidate joins 3-5x — measured);
    *  - dangerous: size stats compose MULTIPLICATIVELY through joins, so
    *    an iterative fixpoint that materializes a self-join each round
    *    SQUARES sizeInBytes — the BigInt's bit count doubles per round,
    *    and around round ~25 the driver disappears into billion-bit
    *    Toom-Cook multiplications inside SizeInBytesOnlyStatsPlanVisitor
    *    (observed live: q130's h-index fixpoint at sf0.1).
    *
    * Values at or under the cap pass through untouched (broadcast
    * decisions keep their real sizes); anything above clamps to the cap,
    * so per-round stats bits stay bounded forever. The cap defaults to
    * Long.MaxValue — the same "huge/unknown" every un-stat'd plan gets. */
  def capStats(df: DataFrame,
      cap: BigInt = BigInt(Long.MaxValue)): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.queryExecution.analyzed match {
      case l: execution.LogicalRDD =>
        val st = l.stats
        val needsCap = st.sizeInBytes > cap ||
          st.rowCount.exists(_ > cap)
        if (!needsCap) df
        else {
          val capped = st.copy(
            sizeInBytes = st.sizeInBytes.min(cap),
            rowCount = st.rowCount.map(_.min(cap)))
          // constraints carried over — only the runaway sizes change
          val nl = new execution.LogicalRDD(l.output, l.rdd,
            l.outputPartitioning, l.outputOrdering, l.isStreaming,
            l.stream)(ds.sparkSession, Some(capped), Some(l.constraints))
          classic.Dataset.ofRows(ds.sparkSession, nl)
        }
      case _ => df
    }
  }
}
