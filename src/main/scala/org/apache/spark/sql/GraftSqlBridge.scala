package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column <-> Expression conversions
  * (the classic `new Column(expr)` constructor is gone in the split
  * Connect/Classic API). Lives in the sql package on purpose. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Rebuild `df` as a bare scan of its (already computed) internal RDD,
    * DISCARDING the logical-plan statistics snapshot `checkpoint`/
    * `localCheckpoint` preserve. The preserved snapshot is the bug: size
    * stats compose MULTIPLICATIVELY through joins, so an iterative
    * fixpoint that materializes `f(x) = g(x join x)` each round squares
    * `sizeInBytes` per round — the BigInt's bit count DOUBLES, and
    * around round ~25 the driver disappears into billion-bit Toom-Cook
    * multiplications inside `SizeInBytesOnlyStatsPlanVisitor` (observed:
    * q130's h-index fixpoint at sf0.1 hung the bench for hours in
    * exactly that stack). A fresh `LogicalRDD` falls back to
    * `defaultSizeInBytes` — constant per round; AQE re-plans joins from
    * REAL runtime sizes anyway, which is where materialized-frame join
    * strategy belongs. */
  def dropStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema)
  }
}
