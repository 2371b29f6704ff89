package graft.ops

import graft.Graft.MaterializeOps
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning over a corpus (Sennrich et al. 2016)
  * — the tokenizer-training step of an LLM data pipeline, run at corpus
  * scale: count adjacent symbol pairs, merge the most frequent pair
  * everywhere, repeat.
  *
  * The scale trick is classic BPE practice: train on the WORD VOCABULARY
  * with frequencies, not the raw token stream. One corpus-wide
  * `groupBy(word)` collapses 100 TB of text to a vocabulary-bounded frame
  * (Heaps' law: ~millions of rows), and every subsequent iteration is
  * vocabulary-bounded too — one pair-count shuffle (map-side combinable,
  * keys are symbol pairs) + one map-only merge rewrite per iteration,
  * with the frame materialized between iterations (the PageRank lazy-
  * chain discipline). The per-iteration argmax row is the ONLY thing the
  * driver sees.
  *
  * Merging is greedy leftmost-first over each word (the reference BPE
  * application order), expressed as a codegen'd `aggregate` fold: the
  * accumulator appends the symbol, or replaces its own tail when
  * (tail, current) is the merge pair — "aaa" under (a,a) becomes
  * [aa, a], never [a, aa].
  */
object BpeTrain {

  /** Greedy leftmost, non-overlapping application of one merge. */
  private[graft] def mergeAdjacent(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(size(acc) > 0 && element_at(acc, -1) === l && x === r,
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Corpus-wide BPE token frequencies after APPLYING a learned merge
    * table — the tokenizer-application step that follows [[merges]]
    * (learn once, encode everything): `(token, n)` where `n` is the
    * token's total occurrence count across the corpus.
    *
    * Same scale shape as training: the corpus collapses to the
    * word-frequency vocabulary in ONE `groupBy(word)` shuffle, the whole
    * rank-ordered merge list is applied as a chained map-only fold over
    * that vocabulary-bounded frame (k merges = k nested codegen
    * `aggregate` folds in ONE projection — no per-merge shuffle, unlike
    * training where each rank needs a fresh global pair count), and one
    * final map-side-combinable `groupBy(token)` emits the frequencies.
    * The merge table itself is driver-side config (the tokenizer file a
    * real pipeline ships), bounded by `numMerges`, never corpus-sized. */
  def tokenFrequencies(df: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val syms0 = filter(split(col("w"), ""), x => x =!= "")
    // rank order matters: later merges see the symbols earlier ones built
    val encoded = merges.foldLeft(syms0) { case (c, (l, r)) =>
      mergeAdjacent(c, l, r) }
    vocab.select(explode(encoded).as("token"), col("f"))
      .groupBy(col("token")).agg(sum(col("f")).as("n"))
  }

  /** The first `numMerges` learned merges as
    * `(rank, left_sym, right_sym, pair_count)` — rank 1 is the first
    * (highest-count) merge; ties break to the lexicographically smallest
    * (left, right) pair so the learned table is deterministic. Stops
    * early if the vocabulary runs out of adjacent pairs. */
  def merges(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("f"))
      .select(filter(split($"w", ""), x => x =!= "").as("syms"), $"f")
      .materialized
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= numMerges && !exhausted) {
      // guard the 1-symbol words: sequence(1, 0) would run DESCENDING
      val adjacent = when(size($"syms") > 1, transform(
          sequence(lit(1), size($"syms") - 1), i => struct(
            element_at($"syms", i).as("l"),
            element_at($"syms", i + lit(1)).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val pairs = vocab.select($"f", explode(adjacent).as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"f").as("c"))
      val top = pairs.orderBy(desc("c"), asc("l"), asc("r")).limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        out += ((rank, l, r, c))
        val next = vocab
          .withColumn("syms", mergeAdjacent($"syms", l, r))
          .materialized
        // previous round's vocab is dead once the rewrite materialized
        // (the iterative stale-state rule GraphOps/Dedup follow)
        org.apache.spark.sql.GraftSqlBridge.unpersistMaterialized(vocab)
        vocab = next
        rank += 1
      }
    }
    out.toSeq.toDF("rank", "left_sym", "right_sym", "pair_count")
  }
}
