package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-relative quality gating — drop rows whose metric falls
  * outside their GROUP's quantile band (too-short/too-long documents per
  * language, outlier values per source). The Gopher-style length filters
  * use absolute bounds; quantile bands adapt per group, which is what a
  * multilingual corpus needs (a "short" Chinese document and a "short"
  * German one sit at very different token counts).
  *
  * Scale shape: one aggregation computes the per-group band (groups =
  * languages/sources — a SHORT key domain, thousands at most), then the
  * band relation broadcasts back onto the corpus scan — the corpus never
  * shuffles, the same discipline as [[Decontaminate]].
  *
  * Exactness: `exact = true` uses Spark's exact `percentile` (full sort
  * per group in the aggregation buffer) — right when groups are bounded
  * and REQUIRED for oracle-grade determinism; at 100 TB with huge groups
  * switch `exact = false` for `approx_percentile` (KLL-style sketch,
  * bounded memory) and accept rank error <= the accuracy parameter.
  * Quantile FRACTIONS should be binary-exact doubles (0.25, 0.5, 0.75…)
  * when cross-engine equality matters: the type-7 interpolation weight
  * `(n-1)*q` is then computed exactly on both sides (the q38 rule). */
object Quality {

  /** Per-group [lo, hi] quantile band of `metric`. Output: (<groupCol>,
    * __qlo, __qhi) — one row per group. */
  def quantileBand(df: DataFrame, groupCol: String, metric: Column,
      lo: Double, hi: Double, exact: Boolean = true,
      accuracy: Int = 10000): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val m = metric.cast("double")
    val (qlo, qhi) =
      if (exact) (percentile(m, lit(lo)), percentile(m, lit(hi)))
      else (approx_percentile(m, lit(lo), lit(accuracy)),
        approx_percentile(m, lit(hi), lit(accuracy)))
    df.groupBy(col(groupCol))
      .agg(qlo.as("__qlo"), qhi.as("__qhi"))
  }

  /** Keep rows whose `metric` lies INSIDE their group's [lo, hi] quantile
    * band (inclusive). The band (one row per group) broadcasts; the corpus
    * side is scanned, never shuffled. */
  def quantileGate(df: DataFrame, groupCol: String, metric: Column,
      lo: Double, hi: Double, exact: Boolean = true): DataFrame = {
    val band = quantileBand(df, groupCol, metric, lo, hi, exact)
    df.withColumn("__m", metric.cast("double"))
      .join(broadcast(band), Seq(groupCol))
      .filter(col("__m") >= col("__qlo") && col("__m") <= col("__qhi"))
      .select(df.columns.map(col).toIndexedSeq: _*) // caller's column order
  }

  /** Unigram language-model quality score — the relational core of the
    * CCNet/LLaMA "perplexity filter": score every document by the mean
    * log-probability of its tokens under a unigram LM fitted on the corpus
    * itself (here) or on a trusted reference corpus (pass its frequencies
    * as `model`). Documents full of gibberish/rare junk score low; fluent
    * text scores near the corpus mode. Output: (<idCol>, n_tokens,
    * avg_logprob FLOAT) — float-cast absorbs summation-order ulp drift
    * (the q29 rule), so the score is oracle-comparable.
    *
    * Scale shape: fit = ONE shuffle on lowercased terms (map-side partial
    * counts); scoring joins the exploded tokens against the term table —
    * a natural-language vocabulary is Zipf-bounded (millions of terms for
    * terabytes of text), so AQE broadcasts it in practice; the per-doc
    * aggregation ships (id, logprob) doubles only. Self-trained scoring
    * has no OOV tokens by construction; a reference `model` should be
    * smoothed before passing in. */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
      model: Option[DataFrame] = None): DataFrame = {
    val toks = df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(lower(col(textCol))))
        .as("__term"))
    val lm = model.getOrElse {
      val counts = toks.groupBy(col("__term"))
        .agg(count(lit(1)).as("__c"))
      // total token count: a 1-row aggregate broadcast into the logprob —
      // log(c) - log(total) keeps the math a pure per-term function
      val total = counts.agg(sum(col("__c"))).head().getLong(0).toDouble
      counts.select(col("__term"),
        (log(col("__c").cast("double")) - math.log(total)).as("__logp"))
    }
    toks.join(lm, Seq("__term"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        avg(col("__logp")).cast("float").as("avg_logprob"))
  }

  /** Bigram LM quality score with add-alpha smoothing — the word-ORDER
    * step past [[unigramLogProb]] and one notch below the 5-gram KenLM
    * CCNet actually ships: every document scored by the mean conditional
    * log-probability of its adjacent token pairs,
    * `ln((c(w1,w2) + alpha) / (c(w1) + alpha * V))`, fitted on the corpus
    * itself. Scrambled or boilerplate-stitched text has fluent unigrams
    * but rare transitions — this score separates them where the unigram
    * filter can't. Documents with fewer than two tokens have no bigram
    * and are absent (the documented contract; mirror it in oracles).
    * Output: (<idCol>, n_bigrams LONG, avg_logp FLOAT).
    *
    * Scale shape: bigrams are generated MAP-SIDE (a `transform` over the
    * token array — no positional self-join); the transition-count fit is
    * one shuffle on the (w1, w2) key; scoring joins the exploded bigrams
    * back against the two count relations — the transition table is
    * Zipf²-bounded (far below corpus size), so AQE broadcasts it in
    * practice, and the context-count join is a broadcast by construction
    * (vocabulary-sized). Per-doc reduce ships (id, logp) doubles. The
    * smoothing makes the same fit usable as a reference model over a
    * foreign corpus (unseen transitions get finite mass).
    *
    * Determinism: counts and V are integers, alpha and the ratio exact
    * doubles into `ln`; the per-doc mean accumulates in double and emits
    * float (the q41 rule — fold order and libm last-ulp absorbed). */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 (unsmoothed ln(0) diverges), got $alpha")
    val base = df.select(col(idCol).as("__id"),
      graft.functions.TextFunctions.tokens(lower(col(textCol))).as("__toks"))
    // the bigram relation feeds the c2 fit, the c1 fit AND the scoring
    // join — one materialization, three readers (the q41 multi-reuse rule)
    val bi = graft.Graft.materialize(base
      .filter(size(col("__toks")) >= 2)
      .select(col("__id"), explode(transform(
        sequence(lit(0), size(col("__toks")) - 2),
        i => struct(element_at(col("__toks"), i + 1).as("w1"),
          element_at(col("__toks"), i + 2).as("w2")))).as("__b"))
      .select(col("__id"), col("__b.w1").as("__w1"), col("__b.w2").as("__w2")))
    val c2 = bi.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c2"))
    val c1 = bi.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    // V = distinct tokens over the WHOLE corpus (short docs included):
    // the smoothing denominator is a vocabulary property, not a property
    // of which docs happened to have bigrams
    val vocab = base.select(explode(col("__toks")).as("__t"))
      .agg(countDistinct(col("__t")).cast("double").as("__v"))
    bi.join(c2, Seq("__w1", "__w2"))
      .join(broadcast(c1), Seq("__w1"))
      .crossJoin(broadcast(vocab))
      .withColumn("__lp", log((col("__c2").cast("double") + alpha) /
        (col("__c1").cast("double") + col("__v") * alpha)))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("__lp")).cast("float").as("avg_logp"))
      .withColumnRenamed("__id", idCol)
  }
}
