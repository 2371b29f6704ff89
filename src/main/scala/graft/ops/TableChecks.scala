package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints over tables — the expectations
  * gate a pipeline runs before promoting a snapshot (the Deequ/dbt-test
  * shape): primary-key uniqueness, referential containment, null and
  * predicate checks. Every check returns one `(chk, violations)` row so a
  * suite is a `unionAll` and the gate is `violations == 0`.
  *
  * Scale shape: the aggregate checks are single-pass map-side-combinable
  * scans of the checked columns only; `fkContainment` is a left-anti
  * equi-join on the key alone (ids-only, AQE free to broadcast a small
  * parent) — never a row-by-row lookup. All counts are exact longs.
  */
object TableChecks {

  private def row(label: String, violations: Column, df: DataFrame) =
    df.agg(violations.as("violations"))
      .select(lit(label).as("chk"), col("violations"))

  /** Duplicate or null key tuples: rows minus distinct non-null key
    * tuples — a null key counts as a violation (it can't identify a
    * row), matching the SQL PRIMARY KEY contract. */
  def pkUnique(df: DataFrame, keyCols: Seq[String],
      label: String): DataFrame =
    row(label,
      count(lit(1)) -
        count_distinct(col(keyCols.head), keyCols.tail.map(col): _*), df)

  /** Child rows whose non-null key has no parent — referential
    * containment as a keys-only anti join (null keys are `notNull`'s
    * business, not containment's). Both keys are renamed to reserved
    * names before the join so the common case of identical FK/PK column
    * names can't hit an ambiguous-reference error. */
  def fkContainment(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, label: String): DataFrame =
    row(label, count(lit(1)),
      child.select(col(childKey).as("__ck")).filter(col("__ck").isNotNull)
        .join(parent.select(col(parentKey).as("__pk")).distinct(),
          col("__ck") === col("__pk"), "left_anti"))

  /** Null values in a required column. */
  def notNull(df: DataFrame, c: String, label: String): DataFrame =
    row(label, count(when(col(c).isNull, 1)), df)

  /** Rows failing an acceptance predicate (a null predicate result fails
    * — unknown is not accepted). */
  def satisfies(df: DataFrame, accept: Column, label: String): DataFrame =
    row(label, count(when(!coalesce(accept, lit(false)), 1)), df)
}
