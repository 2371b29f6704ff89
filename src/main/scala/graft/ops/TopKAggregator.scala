package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact top-k aggregator: a bounded min-heap per group, merged
  * associatively (SURVEY §7 step 9's single-pass heap).
  *
  * Scale contrast with the window formulation: `row_number over
  * (partition by query)` shuffles EVERY scored row to its query's
  * partition before ranking; this aggregator reduces map-side to k rows
  * per (partition, query), so the shuffle carries O(k * partitions) rows
  * per query instead of O(corpus). Same result, verified by spec.
  */
object TopKAggregator {

  case class Scored(id: Long, score: Double)

  /** Keep the k largest by (score, then smaller id on ties — matching the
    * deterministic ordering used across the engine). */
  class TopK(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private def lt(a: Scored, b: Scored): Boolean =
      a.score < b.score || (a.score == b.score && a.id > b.id)

    override def zero: List[Scored] = Nil

    override def reduce(buf: List[Scored], x: Scored): List[Scored] =
      insert(buf, x)

    override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
      b.foldLeft(a)(insert)

    // buf kept ascending (worst first), length <= k: a full-list sort per
    // insert was O(k log k) per row; ordered insertion touches only the
    // prefix below x — O(k) worst case, O(1) for the common below-floor row
    private def insert(buf: List[Scored], x: Scored): List[Scored] = {
      def place(rest: List[Scored]): List[Scored] = rest match {
        case h :: t if lt(h, x) => h :: place(t)
        case _ => x :: rest
      }
      if (buf.length < k) place(buf)
      else if (lt(x, buf.head)) buf
      else place(buf.tail)
    }

    override def finish(buf: List[Scored]): Seq[Scored] = buf.reverse

    override def bufferEncoder: Encoder[List[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Multi-query exact k-NN via aggregation: input rows
    * `(query_id, corpus_id, score)`, output one row per (query, hit, rank).
    * Uses the [[TopK]] Aggregator through `KeyValueGroupedDataset.agg`, so
    * Spark performs map-side partial aggregation: each map partition
    * reduces to at most k rows per query BEFORE the shuffle (mapGroups
    * would move the whole scored relation). */
  def knnAggregate(scored: Dataset[(Long, Long, Double)], k: Int)
      : Dataset[(Long, Long, Double, Int)] = {
    val spark = scored.sparkSession
    import spark.implicits._
    scored
      .map { case (qid, id, s) => (qid, Scored(id, s)) }
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new TopK(k).toColumn)
      .flatMap { case (qid, hits) =>
        hits.zipWithIndex.map { case (h, i) => (qid, h.id, h.score, i + 1) }
      }
  }
}
