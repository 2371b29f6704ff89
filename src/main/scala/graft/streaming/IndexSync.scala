package graft.streaming

import graft.index.VectorIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming analog of the reference's delta-sync index pipeline
  * (`Nomic MultiModal Retrieval.py:278, 315-323`): the embeddings table's
  * change feed (emulated: an append stream of `(pk, ..., vector, version)`
  * rows — no Delta jars in this environment) drives incremental index
  * refresh via `foreachBatch` upserts.
  *
  * `Trigger.AvailableNow` reproduces the reference's `pipeline_type =
  * "TRIGGERED"` exactly: process all pending changes, then stop. A
  * processing-time trigger turns the same pipeline into the service's
  * CONTINUOUS mode — one flag, not a rewrite.
  */
object IndexSync {

  /** Start syncing `index` from an append stream of embedding rows.
    * Each micro-batch is one TRIGGERED refresh (upsert by pk). */
  def start(index: VectorIndex, changes: DataFrame, checkpoint: String,
      triggered: Boolean = true): StreamingQuery = {
    val writer = changes.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      // version column (if present) stays: upsert uses it to keep only the
      // latest row when one micro-batch carries several versions of a pk
      .foreachBatch { (batch: DataFrame, _: Long) =>
        index.upsert(batch); ()
      }
    (if (triggered) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
