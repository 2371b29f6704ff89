package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single right
  * row with the greatest right-time <= the left row's time, within the same
  * equality key — the classic "latest quote at or before the trade"
  * operator.
  *
  * Implemented as union + ordered carry-forward, NOT as a range join: both
  * sides are tagged and unioned, then `last(<right payload>, ignoreNulls)`
  * runs over a (key, time)-ordered window. The whole operator is ONE
  * shuffle on the key followed by a single sort-merge pass; per-row state
  * is one carried struct. The naive formulation — an inequality join
  * `l.key = r.key AND l.t >= r.t` plus an argmax — degenerates to a per-key
  * cartesian product before filtering (every left row pairs with ALL
  * earlier right rows), which is quadratic in the per-key row count and
  * would not survive 100 TB; the merge formulation is linear.
  *
  * Determinism: ordering is (time, side, payload), so right rows at the
  * exact left timestamp ARE visible (inclusive <=, matching SQL ASOF JOIN
  * semantics) and ties between identical-time right rows resolve by
  * payload order rather than partition layout — the MAXIMUM payload
  * struct wins (SQL ASOF JOIN leaves this row unspecified; we pin a
  * total order so reruns and oracle comparisons are stable). This
  * payload tie-break requires every `rightPayload` column to be
  * orderable; a non-orderable payload (e.g. a map column) falls back to
  * (time, side) ordering, where a duplicate-(key, time) tie is broken by
  * partition layout instead — deterministic per layout, not per logical
  * content. Dedupe the right side per (key, time) first if that matters.
  */
object TemporalJoin {

  /** @param left         probe side (all its columns are preserved)
    * @param right        reference side
    * @param keyCol       equality key present on both sides
    * @param leftTimeCol  event-time column on `left`
    * @param rightTimeCol event-time column on `right`
    * @param rightPayload columns of `right` to attach, emitted as
    *                     `matched_<name>`; the match's time is always
    *                     emitted as `matched_<rightTimeCol>`
    * @param inner        true drops left rows with no at-or-before match
    *                     (ASOF inner); false keeps them with null payload
    *                     (ASOF left-outer)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      rightPayload: Seq[String], inner: Boolean = true): DataFrame = {
    val payloadCols = (rightTimeCol +: rightPayload.filterNot(_ == rightTimeCol))
    val refStruct = struct(payloadCols.map(col): _*)
    val refType = right.select(refStruct).schema.head.dataType

    val leftStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val leftType = left.select(leftStruct).schema.head.dataType

    // Identical shapes so the union is by position: (key, time, side, ref, row)
    val taggedRight = right.select(
      col(keyCol).as("__k"), col(rightTimeCol).as("__t"),
      lit(0).as("__side"), refStruct.as("__ref"),
      lit(null).cast(leftType).as("__row"))
    val taggedLeft = left.select(
      col(keyCol).as("__k"), col(leftTimeCol).as("__t"),
      lit(1).as("__side"), lit(null).cast(refType).as("__ref"),
      leftStruct.as("__row"))

    // payload tie-break only when the struct is orderable — a map-typed
    // payload would otherwise fail analysis on the orderBy
    val orderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(refType)
    val ordering =
      if (orderable) Seq(col("__t"), col("__side"), col("__ref"))
      else Seq(col("__t"), col("__side"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = taggedRight.unionByName(taggedLeft)
      .withColumn("__m", last(col("__ref"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val kept = if (inner) carried.filter(col("__m").isNotNull) else carried
    val leftOut = left.columns.toIndexedSeq.map(c => col(s"__row.$c").as(c))
    val matchOut = payloadCols.map(c => col(s"__m.$c").as(s"matched_$c"))
    kept.select(leftOut ++ matchOut: _*)
  }

  /** Interval (range) join: all (left, right) pairs sharing `keyCol` with
    * `right.time` inside `[left.time - before, left.time + after]` —
    * the "events near other events" operator (errors vs the clicks around
    * them, trades vs nearby quotes). Window and bucket are in the time
    * axis's own units: epoch MILLIS when the columns are timestamps,
    * verbatim when they are numeric.
    *
    * The naive formulation — equi-join on the key with the range as a
    * post-join filter — materializes the per-key CARTESIAN before
    * filtering: a key with n left and m right rows costs n·m regardless of
    * how narrow the window is, which is the canonical range-join scale
    * killer. This implementation quantizes time into `bucketWidth` cells
    * and joins on `(key, cell)`:
    *
    *   - each LEFT row explodes to the cells its window overlaps —
    *     `(before + after) / bucketWidth + 1` cells, a constant chosen by
    *     the bucket sizing, not data;
    *   - each RIGHT row maps to exactly ONE cell (no duplication — and
    *     therefore no pair is produced twice, no dedup pass needed);
    *   - the exact window predicate filters the joined candidates.
    *
    * Work is proportional to true-pairs + near-miss candidates in
    * adjoining cells instead of the per-key cartesian. `bucketWidth`
    * trades left-side duplication against candidate precision; the
    * default — the window width — caps duplication at 2 cells per left
    * row. Both sides shuffle on (key, cell), so a hot (key, window) burst
    * splits across cells rather than landing on one reducer; AQE
    * skew-split covers what remains.
    *
    * Output: every `left` column, then `rightPayload` columns as
    * `matched_<name>` (the match's time always included), one row per
    * matching pair. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTimeCol: String, rightTimeCol: String, rightPayload: Seq[String],
      before: Long, after: Long, bucketWidth: Long = 0L): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0,
      s"window must be non-negative and non-empty, got [-$before, +$after]")
    val bucket = if (bucketWidth > 0) bucketWidth else before + after
    val payloadCols = rightTimeCol +: rightPayload.filterNot(_ == rightTimeCol)

    // timestamps become epoch millis; numeric time axes pass through
    def axis(df: DataFrame, c: String): Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_millis(col(c))
        case _ => col(c).cast("long")
      }
    val lt = axis(left, leftTimeCol)
    val rt = axis(right, rightTimeCol)
    // floorDiv, not /: epoch millis are negative before 1970 and SQL integer
    // division truncates toward zero, which would misalign those cells
    def cell(ts: Column) = floor(ts.cast("double") / bucket).cast("long")

    val leftB = left
      .withColumn("__lt", lt)
      .withColumn("__cell",
        explode(sequence(cell(col("__lt") - before),
          cell(col("__lt") + after))))
    val rightB = right
      .select((keyCol +: payloadCols).distinct.map(col): _*)
      .withColumn("__rt", rt)
      .withColumn("__cell", cell(col("__rt")))
      .select(col(keyCol).as("__rk"), col("__cell"), col("__rt"),
        struct(payloadCols.map(col): _*).as("__ref"))

    leftB
      .join(rightB, col(keyCol) === col("__rk") &&
        leftB("__cell") === rightB("__cell"))
      .filter(col("__rt") >= col("__lt") - before &&
        col("__rt") <= col("__lt") + after)
      .select(left.columns.toIndexedSeq.map(col) ++
        payloadCols.map(c => col(s"__ref.$c").as(s"matched_$c")): _*)
  }

  /** Change-point compaction into validity intervals — the SCD2 dimension
    * build: per key, keep one row per run of equal `valueCol` values in
    * `tsCol` order (ties broken by value — total within the projected
    * columns) and stamp it [valid_from, valid_to) from the run's first
    * time to the next run's first time; the open current run gets
    * valid_to = -1. Times are epoch micros (longs), so results are
    * integer-exact. One key shuffle; both windows (the lag change flag
    * and the lead over surviving change points) reuse the same
    * partitioning — a repeated-state history compacts to its change
    * count, the CDC-to-dimension step of warehouse pipelines. */
  def validityIntervals(df: DataFrame, keyCol: String, valueCol: String,
      tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("__us"), col(valueCol))
    df.select(col(keyCol), col(valueCol), unix_micros(col(tsCol)).as("__us"))
      .withColumn("__prev", lag(col(valueCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(valueCol))
      .withColumn("valid_to", coalesce(lead(col("__us"), 1).over(w),
        lit(-1L)))
      .select(col(keyCol), col(valueCol), col("__us").as("valid_from"),
        col("valid_to"))
  }
}
