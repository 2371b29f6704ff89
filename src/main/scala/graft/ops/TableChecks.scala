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

  /** k-anonymity audit (Sweeney 2002): every quasi-identifier group with
    * fewer than `k` rows — the combinations that re-identify individuals
    * by attribute intersection alone, the privacy gate a training corpus
    * with user-derived metadata runs before release. Returns the violating
    * groups themselves, `(quasiCols..., group_n)`, not just a count:
    * remediation (suppress / generalize / drop) needs the group identity.
    * Null attribute values form groups of their own (SQL GROUP BY
    * semantics — a null quasi tuple re-identifies like any other rare
    * tuple).
    *
    * Scale shape: one map-side-combinable count shuffle on the quasi
    * tuple; the output is bounded by the number of SMALL groups, which is
    * what makes auditing a 100 TB corpus tractable — the well-populated
    * mass aggregates away map-side and filters out. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(k > 1, s"k must be > 1 (k=1 is vacuous), got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .filter(col("group_n") < k)
  }
}
