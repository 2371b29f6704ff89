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
  * an n-gram inverted index over a SINGLE corpus scan: tokenize -> slide an
  * n-window -> hash each span to a 16-byte md5 digest (all inside one
  * projection, no shuffle) -> aggregate occurrences per (digest, doc) with
  * map-side partial agg -> count documents per digest with a window over
  * the digest partitioning -> per-document sum of qualifying occurrences.
  * Shuffled bytes per span are constant (16 B + id + count) regardless of
  * n, the digest keys are uniform (no skew salt needed), and nothing
  * document-sized crosses an exchange. No self-join and no checkpoint: an
  * earlier two-pass formulation (agg + join back to the gram relation)
  * either re-tokenized the corpus twice or had to materialize the exploded
  * grams — corpus-sized state pinned in the block manager and a lineage
  * cut that forfeits fault tolerance, the wrong trade at 100 TB where
  * re-scanning is the cheap currency.
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

    // one row per (digest, doc) after the partial agg — strictly fewer rows
    // than span occurrences cross the first exchange
    val occ = df.select(col(idCol), explode(spans).as("__g"))
      .groupBy(col("__g"), col(idCol))
      .agg(count(lit(1)).as("__occ"))
    // documents-per-digest via a window on the digest partitioning: the
    // (g, doc) rows are already distinct, so a plain count IS the distinct
    // document count — no second corpus scan, no self-join
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__g"))
    occ.withColumn("__nd", count(lit(1)).over(w))
      .filter(col("__nd") > 1)
      .groupBy(col(idCol))
      .agg(sum(col("__occ")).as("n_dup_spans"))
  }
}
