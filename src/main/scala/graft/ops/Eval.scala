package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality evaluation — the harness every retrieval/ANN change is
  * judged by: given a ground-truth ranking and a system ranking per
  * query, compute recall@k, MRR, and binary NDCG@k. Runs AS a query (one
  * equi-join + two partial aggregates), so evaluating a million queries
  * against a 100 TB corpus's ground truth is just another distributed
  * job, not a driver-side script.
  */
object Eval {

  /** Per-query ranking metrics. Both inputs are `(qCol, idCol, rankCol)`
    * frames (ranks 1-based; rows with rank > k are ignored):
    *
    *  - `recall`  — |expected ∩ actual| / min(k, |expected|)
    *  - `mrr`     — 1 / (actual rank of the FIRST relevant hit), 0 if the
    *                actual list contains no expected item
    *  - `ndcg`    — binary-relevance DCG over the actual list's hit
    *                positions (`Σ 1/log2(rank+1)`), normalized by the
    *                ideal DCG for min(k, |expected|) relevant items
    *
    * Queries present in `expected` but absent from `actual` score 0 on
    * all three (the system returned nothing — that IS the score).
    * Output: `(qCol, n_hit, recall, mrr, ndcg)`. */
  def rankingMetrics(expected: DataFrame, actual: DataFrame,
      qCol: String, idCol: String, rankCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val e = expected.filter(col(rankCol) <= k)
      .select(col(qCol).as("q"), col(idCol).as("id"))
    val nE = e.groupBy(col("q")).agg(count(lit(1)).as("n_exp"))
    val a = actual.filter(col(rankCol) <= k)
      .select(col(qCol).as("q"), col(idCol).as("id"),
        col(rankCol).cast("double").as("arank"))
    val hits = e.join(a, Seq("q", "id"))
      .groupBy(col("q"))
      .agg(count(lit(1)).as("n_hit"),
        min(col("arank")).as("first_hit"),
        sum(lit(1.0) / log2(col("arank") + 1)).as("dcg"))
    val ideal = least(lit(k), col("n_exp")).cast("int")
    val idcg = aggregate(sequence(lit(1), ideal), lit(0.0),
      (acc, i) => acc + lit(1.0) / log2(i.cast("double") + 1))
    nE.join(hits, Seq("q"), "left")
      .select(col("q").as(qCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          least(lit(k), col("n_exp"))).as("recall"),
        coalesce(lit(1.0) / col("first_hit"), lit(0.0)).as("mrr"),
        (coalesce(col("dcg"), lit(0.0)) / idcg).as("ndcg"))
  }
}
