package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE INTO as a relational operator: apply a change set tagged with
  * insert/update/delete operations to a base snapshot — the batch CDC
  * apply step ([[graft.index.VectorIndex.upsert]] is its index-side
  * sibling; [[TableDiff]] produces such change sets, this consumes
  * them).
  *
  * Scale shape: ONE keys-only anti join removes the touched base rows
  * (the change set is usually tiny next to the snapshot — AQE broadcasts
  * it), then surviving inserts/updates union in map-side. No full-outer
  * join, no window; the snapshot is never shuffled when the anti join
  * broadcasts.
  */
object TableMerge {

  /** Apply `changes` (base schema + `opCol` ∈ {"I","U","D"}) to `base`.
    * Upsert semantics: any key present in the change set leaves the base
    * (regardless of op), then I/U rows come in with their new payload —
    * so an "I" on an existing key behaves as an update rather than
    * duplicating it, and a "D" on a missing key is a no-op. The change
    * set must carry one row per key (enforce upstream; last-writer-wins
    * needs an ordering this batch operator doesn't impose). A NULL or
    * unrecognized op fails the job — a malformed change set must not be
    * silently absorbed (NULL would be filtered away, any other string
    * treated as an upsert). */
  def applyChanges(base: DataFrame, changes: DataFrame, pkCol: String,
      opCol: String = "op"): DataFrame = {
    // every change row flows through this filter, so the when-chain
    // validates the whole set row-by-row with no extra pass
    val op = when(col(opCol).isin("I", "U", "D"), col(opCol))
      .otherwise(raise_error(concat(
        lit(s"TableMerge.applyChanges: $opCol must be one of I/U/D, got "),
        coalesce(col(opCol).cast("string"), lit("NULL")))))
    val untouched = base.join(
      changes.select(col(pkCol).as("__mk")).distinct(),
      base(pkCol) === col("__mk"), "left_anti")
    untouched.unionByName(
      changes.filter(op =!= "D").drop(opCol))
  }
}
