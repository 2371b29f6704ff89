package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index construction: term → (document frequency, sorted postings
  * list). The retrieval primitive under BM25/hybrid search (the reference
  * serves its index as a managed black box, `Nomic MultiModal
  * Retrieval.py:315-323`; this is the relational build for the text half).
  *
  * Scale shape: the naive one-pass formulation (`groupBy(term).agg(
  * collect_list(id))`, filter df afterwards) materializes the postings of
  * every stopword before discarding them — at 100 TB the head terms appear
  * in nearly every document and a single `collect_list` state holds
  * billions of ids. This build is two-pass instead:
  *
  *   1. df-only aggregation (a count — map-side combinable, constant state
  *      per term) and a df-band filter;
  *   2. semi-join of the postings back to the surviving terms, then the
  *      bounded `collect_set` (≤ maxDf ids per term by construction).
  *
  * Both passes shuffle on `term`, so the second reuses the first's
  * partitioning; the collect state is capped by `maxDf`, not by corpus
  * size. Postings ship as a comma-joined string of sorted ids — engine-
  * portable (array hashing differs across engines) and the on-disk format
  * real systems use for posting files.
  */
object InvertedIndex {

  /** Substring search through a TRIGRAM index (the code-search /
    * infix-LIKE shape: `WHERE text LIKE '%needle%'` cannot use a token
    * index, and a full scan per query is the thing a 100 TB corpus
    * can't afford). Candidate generation: a document qualifies only if
    * it contains EVERY trigram of the needle — lossless for needles of
    * ≥ 3 chars (a matching document literally contains each of them),
    * so the final codegen `contains` verify only REMOVES
    * coincidental-trigram rows, never adds. Plan: one distinct
    * (doc, trigram) explode, a semi-ish join against the needle's
    * trigram list, and a count-equality gate (`n_hits = n_needle_grams`
    * — the standard postings-intersection-as-groupBy), then the exact
    * verify on the candidate-bounded row set. Output: `(idCol)` rows
    * whose `textCol` contains `needle`. */
  def substringSearch(df: DataFrame, idCol: String, textCol: String,
      needle: String): DataFrame = {
    require(needle.length >= 3,
      s"needle must be >= 3 chars for trigram candidacy, got '$needle'")
    val spark = df.sparkSession
    import spark.implicits._
    val grams = needle.sliding(3).toSeq.distinct
    val docGrams = df
      .select(col(idCol), explode(array_distinct(transform(
          sequence(lit(1), greatest(length(col(textCol)) - 2, lit(0))),
          i => col(textCol).substr(i, lit(3))))).as("g"))
    // candidate = doc carrying ALL needle trigrams: broadcast the needle's
    // gram list, count-equality gate (postings intersection as a groupBy)
    val cands = docGrams
      .join(broadcast(grams.toDF("g")), "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("nh"))
      .filter(col("nh") === grams.size)
      .select(col(idCol))
    // exact verify on the candidate-bounded row set
    df.join(cands, idCol)
      .filter(col(textCol).contains(needle))
      .select(col(idCol))
  }

  /** Build the index over `terms`, an array<string> column of the tokens /
    * n-grams to post (e.g. [[graft.functions.TextFunctions.wordShingles]]).
    * Output: (term, df, postings) for terms whose document frequency lies
    * in [minDf, maxDf] — the classic band that drops hapaxes (noise) and
    * stopwords (unbounded postings) in one gate.
    */
  def build(df: DataFrame, idCol: String, terms: Column,
      minDf: Long, maxDf: Long): DataFrame = {
    // Per-document term set: dedup map-side (array_distinct BEFORE explode)
    // so a term occurring 1k times in one doc ships once, not 1k times.
    val docTerms = df
      .select(col(idCol), explode(array_distinct(terms)).as("term"))

    val dfCounts = docTerms.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df").between(minDf, maxDf))

    docTerms.join(dfCounts, "term")
      .groupBy(col("term"))
      .agg(first(col("df")).as("df"),
        array_join(transform(array_sort(collect_set(col(idCol))),
          i => i.cast("string")), ",").as("postings"))
  }
}
