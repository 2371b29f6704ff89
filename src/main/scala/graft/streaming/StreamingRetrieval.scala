package graft.streaming

import graft.functions.VectorFunctions.cosineUnit
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous retrieval: a STREAM of query vectors served against the
  * static IVF-indexed corpus — the online half of the reference's
  * similarity search (`Nomic MultiModal Retrieval.py:380-390`), the shape
  * of a live retrieval/QA endpoint or an online hard-negative miner fed by
  * a training loop.
  *
  * Scale design, stage by stage:
  *   - routing is STATELESS: each streamed query ranks the broadcast
  *     centroid matrix (the same codegen'd array_sort as the batch
  *     [[graft.ops.SimilaritySearch.knnJoinIvf]]) and explodes to its
  *     `nProbe` (query, cell) rows — per-row work, no state store;
  *   - scoring is a STATELESS stream-static equi-join on `cell`: only the
  *     probed cells' corpus rows are scored per query, ~nProbe/nCells of
  *     the corpus, and the join carries no watermark or state because the
  *     static side never changes within a batch (re-index = restart, the
  *     same contract as the reference's TRIGGERED index);
  *   - only the top-k is STATEFUL: the [[graft.expressions.VecTopK]]
  *     bounded-heap aggregate keeps O(k) entries per query in the state
  *     store — state is k·(queries seen this run), never corpus-sized,
  *     and partial aggregation bounds what the one exchange ships exactly
  *     as in the batch path. There is no watermark eviction (a global
  *     aggregate can't know a query is done), so a long-lived deployment
  *     bounds the run — window the endpoint by restart/checkpoint
  *     rotation, the same lifecycle as the re-index contract below — or
  *     drains finite batches (AvailableNow), as the gate and bench do.
  *
  * Result (streaming, complete/update mode): `(query_id, top)` where
  * `top` is the rank-ordered `array<struct<id, score>>` — `inline` /
  * `posexplode` it sink-side. With `nProbe >= nCells` the drained result
  * provably equals the exact batch kNN join (q89 oracles it against the
  * same SQL as q54). */
object StreamingRetrieval {

  def knnStream(queries: DataFrame, indexed: DataFrame,
      centroids: Array[Array[Float]], qPk: String, cPk: String,
      vecCol: String, k: Int, nProbe: Int = -1): DataFrame = {
    require(queries.isStreaming,
      "knnStream expects a streaming query relation; use " +
        "SimilaritySearch.knnJoinIvf for batch retrieval")
    require(!indexed.isStreaming,
      "knnStream expects a BATCH indexed corpus: a streaming side would " +
        "turn the stateless stream-static cell join into an unbounded " +
        "stream-stream join; sync the index with IndexSync and restart " +
        "(the TRIGGERED re-index contract)")
    // unspecified probe count derives the operatingPoint fraction from
    // the built cell count, like every batch IVF path since round 11
    val probe = graft.ops.SimilaritySearch
      .resolveProbe(nProbe, centroids.length)
    val probed = graft.ops.SimilaritySearch.ivfRoute(queries, centroids,
      vecCol, probe, col(qPk), col(vecCol) -> "__qv")
    val scored = probed
      .join(indexed.select(col(cPk).as("__cid"), col("cell"),
        col(vecCol).as("__cv")), Seq("cell"))
      .select(col("query_id"), col("__cid"),
        cosineUnit(col("__cv"), col("__qv")).as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.expressions.SketchExpressions
        .vecTopK(col("__cid"), col("score"), k).as("top"))
  }
}
