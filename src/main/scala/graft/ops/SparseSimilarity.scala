package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-vector document similarity — the "more-like-this" / related-
  * documents join over TF-IDF weights, the lexical complement of the
  * embedding-space kNN join ([[SimilaritySearch.knnJoin]]): no model, no
  * vectors, exact cosine over the term overlap. Used to build sparse kNN
  * graphs for clustering, link-adjacent leakage analysis, and recall
  * backstops for dense retrieval (the reference's hybrid search plays the
  * same card at query time, `NB:404–409`; this is the corpus-vs-corpus
  * form).
  *
  * Scale shape: the pair generation is a POSTING-LIST self-join keyed on
  * the term — candidate mass Σ df² over surviving terms, never N². Two
  * levers bound it at 100 TB:
  *   - `maxDfFraction` drops head terms (df above the fraction) BEFORE the
  *     join — the same two-pass df-band discipline as
  *     [[InvertedIndex.build]]; head terms carry ~zero idf weight, so
  *     dropping them trades ~no cosine mass for the quadratic tail of the
  *     join (CCNet/Elasticsearch stop-term practice);
  *   - everything that rides the join is `(term, id, weight)` — ids and
  *     one double, never text.
  * The per-doc top-k is a bounded rank window partitioned by doc.
  *
  * Determinism across engines (the oracle contract): weights are
  * `tf * ln((N+1)/(df+1))` in double; dot and norms accumulate in double;
  * the emitted cosine is float-cast and RANKED as float with the neighbor
  * id as tie-break — the q41 rule, absorbing both libm last-ulp `ln`
  * differences and summation fold order.
  *
  * PRECONDITION (the operator's scale contract): the posting-list join is
  * subquadratic if and only if the surviving vocabulary is DISCRIMINATIVE
  * — candidate mass is Σ df², so it needs Σ df² ≪ N². On a degenerate
  * corpus this fails on ANY engine regardless of formulation: the synthetic
  * `documents` fixture has 31 distinct lowercase tokens with df up to
  * 0.78·N, so Σ df² ≈ 0.45·N² and no df-fraction band below ~0.8 leaves
  * any posting at all — the join IS the all-pairs scan, which is why the
  * sf1 scale gate documents q113 as skipped rather than "slow". The
  * operator measures Σ df² up front (one tiny agg over the already-
  * materialized term counts) and logs a warning naming this contract when
  * the mass exceeds `0.1·N²`; real corpora (Zipf vocabularies, where the
  * df band removes the head) sit orders of magnitude below the line. */
object SparseSimilarity {

  /** Measure the posting candidate mass for a corpus: (Σ df² over the
    * terms surviving `maxDfFraction`, N²) — the operator-contract
    * quantity [[tfidfNeighbors]] checks before its posting join
    * (subquadratic iff Σ df² ≪ N²). A standalone, side-effect-free API:
    * callers sizing a 100 TB run can measure BEFORE committing to the
    * join, and specs assert the contract without shared mutable state
    * (the round-10 `lastCandidateMass` volatile raced under concurrent
    * callers — ADVICE r10). */
  def candidateMass(df: DataFrame, idCol: String, textCol: String,
      maxDfFraction: Double = 1.0): (Double, Double) = {
    val n = df.count().toDouble
    val dfreq = df.select(col(idCol).as("__id"),
        explode(transform(graft.functions.TextFunctions.tokens(col(textCol)),
          t => lower(t))).as("__term"))
      .groupBy(col("__id"), col("__term")).agg(count(lit(1)).as("__tf"))
      .groupBy(col("__term")).agg(count(lit(1)).as("__df"))
    val mass = dfreq
      .filter(col("__df").cast("double") <= n * maxDfFraction)
      .agg(sum(col("__df") * col("__df")).cast("double")).head()
    (Option(mass.get(0)).fold(0.0)(_ => mass.getDouble(0)), n * n)
  }

  /** Top-`k` cosine neighbors per document over smoothed-idf TF-IDF
    * weights. Output: (<idCol>, nbr_id, cos FLOAT, rnk LONG), one row per
    * (doc, ranked neighbor), docs with no surviving shared term absent.
    * `maxDfFraction`: keep terms with `df <= n_docs * maxDfFraction`. */
  def tfidfNeighbors(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxDfFraction: Double = 1.0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxDfFraction > 0 && maxDfFraction <= 1,
      s"maxDfFraction in (0, 1], got $maxDfFraction")
    val terms = df.select(col(idCol).as("__id"),
      explode(transform(graft.functions.TextFunctions.tokens(col(textCol)),
        t => lower(t))).as("__term"))
    // tf feeds BOTH the df aggregate and the weighting join — materialize
    // (the q41 multi-reuse rule: the broadcast boundary between them
    // blocks AQE exchange reuse, un-materialized the tokenize/agg chain
    // runs twice)
    val tf = graft.Graft.materialize(
      terms.groupBy(col("__id"), col("__term")).agg(count(lit(1)).as("__tf")))
    // n as a driver value: it gates the df band AND the guard; the former
    // stats crossJoin computed the same count inside the weighted job, so
    // this is the same one column-pruned pass, just hoisted
    val nDocs = df.agg(count(lit(1))).head().getLong(0).toDouble
    // df counts materialized once: joined into the weighted plan below AND
    // read (vocab-sized, ~free) by the degenerate-vocabulary guard — the
    // guard no longer pays its own posting-sized aggregation (ADVICE r10)
    val dfreq = graft.Graft.materialize(
      tf.groupBy(col("__term")).agg(count(lit(1)).as("__df")))
    // degenerate-vocabulary guard (see the object scaladoc): Σ df² over
    // the SURVIVING terms vs N²
    locally {
      val row = dfreq
        .filter(col("__df").cast("double") <= nDocs * maxDfFraction)
        .agg(sum(col("__df") * col("__df")).cast("double")).head()
      val mass = Option(row.get(0)).fold(0.0)(_ => row.getDouble(0))
      if (mass > 0.1 * nDocs * nDocs)
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"tfidfNeighbors: candidate mass " +
          f"sum(df^2)=$mass%.3g is ${mass / (nDocs * nDocs)}%.2f of N^2 " +
          f"(N=$nDocs%.0f) — the surviving vocabulary is not " +
          "discriminative and the posting join degenerates to ~all-pairs " +
          "on any engine; lower maxDfFraction or accept quadratic cost " +
          "(see SparseSimilarity scaladoc contract)")
    }
    // weighted postings are consumed by the norm aggregate AND both sides
    // of the pair join — one materialization, three readers
    val weighted = graft.Graft.materialize(tf
      .join(dfreq, Seq("__term"))
      .filter(col("__df").cast("double") <= lit(nDocs) * maxDfFraction)
      .select(col("__term"), col("__id"),
        (col("__tf").cast("double") *
          log((lit(nDocs) + 1.0) / (col("__df").cast("double") + 1.0)))
          .as("__w")))
    // a doc whose every surviving term has idf = 0 (terms with df = N
    // pass maxDfFraction = 1.0) gets a zero weight vector; cosine is
    // undefined there, so such docs are dropped like docs with no
    // surviving term at all — not divided by zero
    val norms = weighted.groupBy(col("__id"))
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__norm"))
      .filter(col("__norm") > 0.0)
    val a = weighted.select(col("__term"), col("__id").as("id_a"),
      col("__w").as("__wa"))
    val b = weighted.select(col("__term"), col("__id").as("id_b"),
      col("__w").as("__wb"))
    val dots = a.join(b, Seq("__term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("__wa") * col("__wb")).as("__dot"))
    val cosPairs = dots
      .join(norms.select(col("__id").as("id_a"), col("__norm").as("__na")),
        Seq("id_a"))
      .join(norms.select(col("__id").as("id_b"), col("__norm").as("__nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("__dot") / (col("__na") * col("__nb"))).cast("float").as("cos"))
    // symmetric expansion, then a bounded top-k window per doc; float
    // rank with the neighbor id as deterministic tie-break
    val sym = cosPairs
      .select(col("id_a").as(idCol), col("id_b").as("nbr_id"), col("cos"))
      .unionByName(cosPairs
        .select(col("id_b").as(idCol), col("id_a").as("nbr_id"), col("cos")))
    val w = Window.partitionBy(col(idCol)).orderBy(desc("cos"), col("nbr_id"))
    sym.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("nbr_id"), col("cos"), col("rnk"))
  }
}
