package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingest form of
  * [[graft.ops.Dedup.exactByFingerprint]]: emit the FIRST occurrence of
  * each content fingerprint, drop the rest.
  *
  * Scale notes: state is keyed by the 16-byte md5 digest, never the text;
  * `dropDuplicatesWithinWatermark` lets the state store evict fingerprints
  * older than the watermark horizon, so state size is bounded by the
  * dedup window (unbounded-history dedup on an infinite stream cannot
  * bound state — choosing the horizon IS the design decision, the same
  * trade every streaming ingest pipeline makes).
  *
  * The deterministic-sampling operator composes with streams for free:
  * [[graft.ops.Sampling.hashSample]] is a stateless scan filter, so the
  * same call works on a streaming DataFrame unchanged (spec-verified).
  */
object StreamingDedup {

  /** First-occurrence dedup by md5(textCol) within the watermark horizon.
    * `tsCol` must be the stream's event-time column. */
  def exactByFingerprint(stream: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      // unhex: key state on the raw 16-byte digest, not md5()'s 32-char hex
      // rendering — half the per-key state bytes for the same identity
      .withColumn("__fp", unhex(md5(col(textCol))))
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming NEAR-dup by 64-bit SimHash: emit the first document per
    * simhash signature within the watermark horizon — whitespace/typo-level
    * rewrites that leave the token sign-sum unchanged dedup with it, which
    * exact fingerprinting misses. State is ONE LONG per surviving
    * signature (vs 16 digest bytes for [[exactByFingerprint]]).
    *
    * This is signature-equality dedup (hamming radius 0) — the streaming
    * point of the batch family's curve, not a replacement for
    * [[graft.ops.Dedup.simhashPairs]]'s radius-k pairing: a banded
    * radius-k would need a state key per chunk AND cross-row candidate
    * state that `dropDuplicatesWithinWatermark` cannot express; run the
    * batch operator over the landed data for radius > 0. Semantics match
    * batch first-occurrence-per-signature exactly (spec-verified). */
  def nearDupBySimhash(stream: DataFrame, tsCol: String, textCol: String,
      watermark: String = "2 hours"): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .withColumn("__sig",
        graft.ops.Dedup.simhash(
          graft.functions.TextFunctions.tokens(col(textCol))))
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
}
