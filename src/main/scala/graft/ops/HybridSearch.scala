package graft.ops

import graft.functions.TextFunctions
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid (keyword + vector) retrieval — the reference declares but disables
  * this (`query_type="hybrid"` commented at `Nomic MultiModal
  * Retrieval.py:386-387`); we implement it.
  *
  * Keyword side: BM25 over whitespace tokens (doc frequencies computed with
  * one aggregation; the tiny query-term DF map is broadcast back). Vector
  * side: exact cosine. Fusion: reciprocal-rank fusion
  * `1/(k0 + rank)` summed over both rankings — the standard service-side
  * formula, rank-based so the two score scales never need calibration.
  */
object HybridSearch {

  /** BM25 scores for one query string over a text corpus. Returns
    * `(pk, bm25)` for docs matching at least one term. */
  def bm25(corpus: DataFrame, pk: String, textCol: String, query: String,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val terms = query.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
    // not persisted here: tokenization is recomputed once by the stats job
    // and once by the caller's final action — cheaper than leaking a cached
    // corpus copy per query (callers doing many queries should persist the
    // tokenized corpus themselves)
    val toks = corpus.select(col(pk).as("id"),
      TextFunctions.tokens(lower(col(textCol))).as("toks"))
      .withColumn("dl", size($"toks").cast("double"))
    // corpus size, avg doc length and every term's doc frequency in ONE
    // aggregation job (a count() per term would launch a job per term)
    val statCols = count(lit(1)).cast("double").as("n") +:
      avg($"dl").as("avgdl") +:
      terms.toSeq.map(t => sum(when(array_contains($"toks", t), 1L)
        .otherwise(0L)).cast("double").as(s"df"))
    val stats = toks.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getDouble(0)
    val avgdl = stats.getDouble(1)
    val dfs = terms.zipWithIndex.map { case (t, i) =>
      t -> stats.getDouble(2 + i)
    }.toMap
    val scoreCols = terms.flatMap { t =>
      val df = dfs(t)
      if (df == 0) None
      else {
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        val tf = size(filter($"toks", x => x === t)).cast("double")
        Some(lit(idf) * tf * (k1 + 1.0) /
          (tf + lit(k1) * (lit(1.0 - b) + lit(b) * $"dl" / avgdl)))
      }
    }
    val total = if (scoreCols.isEmpty) lit(0.0) else scoreCols.reduce(_ + _)
    toks.withColumn("bm25", total).filter($"bm25" > 0).select($"id", $"bm25")
  }

  /** Reciprocal-rank fusion of a keyword ranking and a vector ranking.
    * `corpus` must carry both `textCol` and unit-norm `vecCol`.
    *
    * Scale shape: each side is first truncated to a bounded candidate pool
    * via `orderBy().limit()` (TakeOrderedAndProject — per-partition heaps,
    * never a global single-partition window over the corpus); the global
    * rank window then runs over <= 2*candN rows regardless of corpus size. */
  def search(corpus: DataFrame, pk: String, textCol: String, vecCol: String,
      query: String, queryVec: Array[Float], k: Int = 5,
      k0: Double = 60.0): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val candN = math.max(k * 10, 100)
    val kw = bm25(corpus, pk, textCol, query)
      .orderBy(desc("bm25"), $"id").limit(candN)
      .withColumn("kw_rank", row_number().over(Window.orderBy(desc("bm25"), $"id")))
    val vs = corpus.select(col(pk).as("id"),
        cosineUnit(col(vecCol), vecLit(queryVec)).as("vscore"))
      .orderBy(desc("vscore"), $"id").limit(candN)
      .withColumn("v_rank", row_number().over(Window.orderBy(desc("vscore"), $"id")))
    kw.join(vs, Seq("id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(k0) + $"kw_rank"), lit(0.0)) +
        coalesce(lit(1.0) / (lit(k0) + $"v_rank"), lit(0.0)))
      .orderBy(desc("rrf"), $"id")
      .limit(k)
  }
}
