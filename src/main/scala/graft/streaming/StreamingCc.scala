package graft.streaming

import graft.Graft.MaterializeOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Streaming near-dup state maintenance: the component map as STREAMING
  * STATE. Each micro-batch of new candidate pairs folds into the running
  * `(id, rep)` map via [[graft.ops.Dedup.mergeComponents]] — the existing
  * map replays as star edges, so the state (and every batch's work) is
  * component-map-sized, never pair-HISTORY-sized. This is the continuous
  * form of the daily incremental dedup: a year of ingested pair batches
  * never gets re-scanned.
  *
  * Batching-insensitive by construction: `mergeComponents` makes the map
  * a pure function of the UNION of all pairs ever seen (star edges
  * preserve connectivity exactly; reps stay component minima), so the
  * drained state is bit-identical to a from-scratch
  * [[graft.ops.Dedup.componentMap]] over the same pairs no matter how the
  * stream sliced them into micro-batches — which is exactly what the
  * q146 oracle (and the multi-batch spec) check.
  *
  * Batch-size safety: `Trigger.AvailableNow` can drain an entire backlog
  * as ONE corpus-sized batch; `mergeComponents` guards its own broadcast
  * assumption (endpoint set over `maxBroadcastIds` falls back to the
  * shuffle-sized from-scratch rebuild), so no size contract leaks to
  * this caller.
  */
object StreamingCc {

  /** Start the folding query over an `(id_a, id_b)` pair stream; returns
    * the running query and an accessor for the current `(id, rep)`
    * state. `triggered = true` drains everything available and stops
    * (the TRIGGERED daily-batch mode); `false` keeps folding as batches
    * arrive (CONTINUOUS mode — the IndexSync one-flag convention). */
  def start(pairStream: DataFrame, triggered: Boolean = true)
      : (org.apache.spark.sql.streaming.StreamingQuery, () => DataFrame) = {
    val spark = pairStream.sparkSession
    import spark.implicits._
    // @volatile: written on the micro-batch thread, read through the
    // accessor from the caller thread — continuous mode has no other
    // happens-before edge between the two.
    @volatile var state = Seq.empty[(Long, Long)].toDF("id", "rep")
    val writer = pairStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        state = graft.ops.Dedup.mergeComponents(state, batch).materialized
        ()
      }
    val q = (if (triggered) writer.trigger(Trigger.AvailableNow())
      else writer).start()
    (q, () => state)
  }

  /** Drain the stream with `Trigger.AvailableNow` and return the final
    * `(id, rep)` state. */
  def drainComponentMap(pairStream: DataFrame): DataFrame = {
    val (q, state) = start(pairStream, triggered = true)
    q.awaitTermination()
    state()
  }
}
