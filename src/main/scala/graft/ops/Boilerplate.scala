package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-level boilerplate detection — find word n-grams that recur across
  * MANY documents (nav bars, license headers, cookie banners, forum
  * signatures) and score each document by how much of it is such repeated
  * material. The cross-document complement of the within-document
  * [[graft.functions.TextFunctions.repetitionRatio]] signal: a CCNet /
  * RefinedWeb-style cleanup pass runs exactly this before training.
  *
  * Scale shape (the 100 TB discipline shared with [[SpanDedup]] /
  * [[Decontaminate]]): gram TEXT never crosses an operator boundary — each
  * document's grams become 16-byte md5 digests map-side, and every exchange
  * ships (id, digest) pairs only.
  *
  *   - document frequency: per-document digests are dedup'd with
  *     `array_distinct` BEFORE the explode, so the doc-frequency aggregation
  *     receives one row per (doc, gram) from the scan itself — no second
  *     dedup shuffle — and map-side partial counting compacts each partition
  *     to its distinct digest set before the exchange;
  *   - the frequent-gram relation is threshold-bounded (a gram must appear
  *     in >= `minDocs` documents) — at a real boilerplate threshold it is
  *     orders of magnitude smaller than the gram table, so AQE turns the
  *     scoring join into a broadcast join at runtime; we deliberately do
  *     not force `broadcast()` because the set's size is data-dependent
  *     (a pathological threshold of 2 on a tiny-vocabulary corpus can make
  *     it large, and a forced broadcast would OOM the driver exactly when
  *     the data is worst).
  *
  * Reference context: the reference pipeline ingests raw scraped documents
  * with no repeated-content control (auschoi96 NB:160-213); this operator is
  * part of the §2.4 training-data surface built on top of that ingest.
  */
object Boilerplate {

  /** Digests of word n-grams that occur in at least `minDocs` DISTINCT
    * documents. Output: (`__g` 32-hex-char md5, `df` doc frequency) — one
    * row per boilerplate gram, join/broadcast fodder for [[fractions]] or a
    * span-removal rewrite. */
  def frequentGramDigests(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Long): DataFrame = {
    require(n >= 1, s"gram length must be >= 1, got $n")
    require(minDocs >= 2,
      s"minDocs must be >= 2 (a 1-doc 'boilerplate' gram is just text), got $minDocs")
    docs
      .select(explode(array_distinct(gramDigests(textCol, n))).as("__g"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocs)
  }

  /** Per-document boilerplate report: how many of the document's n-gram
    * occurrences are corpus-frequent. Output: (<idCol>, n_grams, n_boiler,
    * boiler_frac); documents with fewer than `n` tokens have no grams and
    * are absent. `boiler_frac` is one exact integer division per group —
    * no summation-order drift, so it hash-checks against the oracle. */
  def fractions(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minDocs: Long): DataFrame = {
    val freq = frequentGramDigests(docs, idCol, textCol, n, minDocs)
      .select(col("__g"), lit(1).as("__hit"))
    docs.select(col(idCol), explode(gramDigests(textCol, n)).as("__g"))
      .join(freq, Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_boiler"))
      .withColumn("boiler_frac",
        col("n_boiler").cast("double") / col("n_grams"))
  }

  /** Drop documents whose boilerplate fraction reaches `maxFrac` (documents
    * too short to have a gram carry fraction 0 and are kept). The id-list
    * join is LEFT ANTI against a threshold-bounded relation — the corpus
    * side re-scans but never shuffles whole rows. */
  def clean(docs: DataFrame, idCol: String, textCol: String, n: Int,
      minDocs: Long, maxFrac: Double): DataFrame = {
    val flagged = fractions(docs, idCol, textCol, n, minDocs)
      .filter(col("boiler_frac") >= maxFrac)
      .select(col(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** md5 digests of a document's word n-grams (with duplicates — occurrence
    * counting needs them; [[frequentGramDigests]] dedups per doc itself). */
  private def gramDigests(textCol: String, n: Int) =
    transform(TextFunctions.wordShingles(col(textCol), n),
      g => md5(g.cast("binary")))
}
