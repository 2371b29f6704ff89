package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicated-span detection at word granularity — the "exact
  * substring dedup" family (Lee et al. 2022, *Deduplicating Training Data
  * Makes Language Models Better*), re-expressed relationally: a span is a
  * contiguous window of `n` whitespace tokens, and a span is *duplicated*
  * when it occurs in more than one distinct document.
  *
  * The paper builds a corpus-wide suffix array; the Spark-native shape is
  * an n-gram inverted index: tokenize -> slide an n-window (all inside one
  * projection, no shuffle) -> hash each span to a 16-byte md5 digest ->
  * ONE shuffle on the digest (never the span text) with map-side partial
  * aggregation -> join span occurrences back to the duplicated-digest set.
  * Shuffled bytes per span are constant (16 B + id) regardless of n, the
  * digest keys are uniform (no skew salt needed), and the output is a
  * per-document count, so nothing document-sized crosses an exchange.
  */
object SpanDedup {

  /** Per-document count of n-token span occurrences whose span also appears
    * in at least one OTHER document. Documents with no duplicated span are
    * absent from the output (count 0). Output: (<idCol>, n_dup_spans). */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"span length must be >= 1, got $n")
    // wordShingles let-binds the token array, so the tokenizing regex runs
    // once per row — inlining the slice over a raw `split` here re-split
    // the text per SPAN (no CSE inside HOF lambdas; measured 6x on q39)
    val spans = transform(
      graft.functions.TextFunctions.wordShingles(col(textCol), n),
      g => md5(g.cast("binary")))

    // grams feeds BOTH the duplicated-digest aggregation and the occurrence
    // join below; the agg side's map-side partial agg makes the two subplans
    // differ, so ReuseExchange cannot dedupe them — localCheckpoint so the
    // tokenize+slide+md5+explode pipeline runs once, not twice.
    val grams = df.select(col(idCol), explode(spans).as("__g"))
      .localCheckpoint(true)
    val dup = grams.groupBy(col("__g"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .filter(col("__nd") > 1)
      .select(col("__g"))
    grams.join(dup, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dup_spans"))
  }
}
