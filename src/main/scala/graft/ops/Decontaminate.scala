package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination — flag or drop training documents that share
  * word n-grams with an evaluation/benchmark set (the GPT-3 appendix-C /
  * PaLM 13-gram procedure, re-expressed relationally).
  *
  * Scale shape: the eval side is a benchmark suite — megabytes, not
  * terabytes — so its distinct gram digests are BROADCAST and the 100 TB
  * train side never shuffles for the membership test:
  *
  *   - eval: tokenize -> n-gram -> md5 -> distinct (tiny; one job)
  *   - train: tokenize -> n-gram -> md5 -> broadcast-hash join against the
  *     eval digests. [[clean]] is a broadcast LEFT ANTI join — fully
  *     map-side, zero exchanges on the train side; [[contamination]]
  *     aggregates the (rare) hits by doc id, so only contaminated-gram
  *     rows (16-byte digest + id) ever reach an exchange.
  *
  * Digests, never gram text, cross operator boundaries — the same
  * constant-bytes-per-span invariant as [[SpanDedup]].
  */
object Decontaminate {

  /** Distinct md5 digests of the eval set's word n-grams. Cache/broadcast
    * fodder: one row per distinct gram, 16 bytes each. */
  def evalGramDigests(eval: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"gram length must be >= 1, got $n")
    eval.select(explode(gramDigests(textCol, n)).as("__g")).distinct()
  }

  /** Per-train-document contamination report: total overlapping n-gram
    * occurrences and distinct overlapping grams. Documents with no overlap
    * are absent. Output: (<idCol>, n_contam_spans, n_contam_grams). */
  def contamination(train: DataFrame, idCol: String, textCol: String,
      evalDigests: DataFrame, n: Int): DataFrame =
    hits(train, idCol, textCol, evalDigests, n)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contam_spans"),
        count_distinct(col("__g")).as("n_contam_grams"))

  /** Drop every training document sharing at least one n-gram with the eval
    * set. Two broadcast passes, zero train-side shuffles:
    *
    *   1. contaminated ids = exploded train digests hash-joined against the
    *      broadcast eval digests (map-only), distinct'd — small by the
    *      contamination-rate assumption (benchmark overlap is the rare
    *      exception in a training corpus, which is the only regime where
    *      decontamination-by-drop is the right remedy at all);
    *   2. broadcast LEFT ANTI join of train against those ids — map-only.
    *
    * Both passes scan train once; scans are the cheap currency at 100 TB,
    * shuffles of the full corpus the expensive one. */
  def clean(train: DataFrame, idCol: String, textCol: String,
      evalDigests: DataFrame, n: Int): DataFrame = {
    val contaminatedIds = hits(train, idCol, textCol, evalDigests, n)
      .select(col(idCol)).distinct()
    train.join(broadcast(contaminatedIds), Seq(idCol), "left_anti")
  }

  /** [[contamination]] through a two-phase bloom prefilter — identical
    * output, different scale shape. The broadcast-join paths above assume
    * the eval digest set fits a broadcast; a large benchmark suite
    * (10M docs x ~100 grams = 1e9 digests x 16 B ~ 16 GB) does not. Here:
    *
    *   1. build a bloom filter over xxhash64 of the eval digests —
    *      distributed partial filters OR-merged, ~1.2 GB at 1e9 entries /
    *      1% fpp where the exact set is 16 GB, shipped once per executor —
    *      and probe every train gram map-side ([[graft.expressions
    *      .BloomMightContainLong]], codegen'd);
    *   2. equi-join ONLY the survivors against the eval digests. The
    *      surviving side is true hits + an fpp-bounded trickle of false
    *      positives, so the shuffled confirm join moves ~fpp x |train
    *      grams|, not |train grams|.
    *
    * Exactness is restored by construction: the sketch has no false
    * negatives (nothing contaminated escapes phase 1), and no false
    * positive survives the phase-2 equi-join.
    *
    * Sizing: the filter is built distributed (partial filters OR-merged)
    * but the merged result lives on the driver and ships inside the plan —
    * ~1.2 bits/entry/−log₂(fpp). Past ~1e9 entries raise `fpp` (every
    * false positive is repaired by phase 2 anyway — a 10% fpp filter is
    * 3x smaller and still thins the confirm join by 10x) or split the
    * eval set and union the reports. */
  def contaminationBloom(train: DataFrame, idCol: String, textCol: String,
      evalDigests: DataFrame, n: Int, fpp: Double = 0.01): DataFrame = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val hashed = evalDigests.select(xxhash64(col("__g")).as("__h"))
    val bloom = hashed.stat.bloomFilter("__h",
      math.max(hashed.count(), 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val survivors = train
      .select(col(idCol), explode(gramDigests(textCol, n)).as("__g"))
      .filter(graft.expressions.BloomExpressions
        .bloomMightContainLong(xxhash64(col("__g")), bytes))
    // deliberately NOT broadcast: in the regime this path exists for, the
    // eval side is broadcast-infeasible — both sides shuffle, but the
    // train side is already bloom-thinned (AQE still may broadcast small
    // fixtures; the code just stops forcing it)
    survivors.join(evalDigests, "__g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_contam_spans"),
        count_distinct(col("__g")).as("n_contam_grams"))
  }

  /** [[clean]] through the bloom prefilter: identical output in the
    * broadcast-infeasible-eval regime. The contaminated-id set comes out of
    * [[contaminationBloom]] (exact by construction), and the final anti-join
    * broadcasts only those ids — small in every regime where
    * decontamination-by-drop is the right remedy at all. */
  def cleanBloom(train: DataFrame, idCol: String, textCol: String,
      evalDigests: DataFrame, n: Int, fpp: Double = 0.01): DataFrame = {
    val contaminatedIds =
      contaminationBloom(train, idCol, textCol, evalDigests, n, fpp)
        .select(col(idCol))
    train.join(broadcast(contaminatedIds), Seq(idCol), "left_anti")
  }

  /** Per-document overlap FRACTION: distinct overlapping n-grams over
    * distinct n-grams, for every train document (zero-overlap docs
    * included at 0.0) — the graded signal behind [[contamination]]'s
    * absolute counts. The PaLM/GPT-4-style procedure gates on a fraction
    * ("drop if more than X% of the document's grams appear in an eval
    * set"), not a count: a 10-gram hit means something different in a
    * tweet than in a book. Output: (<idCol>, n_grams, n_hit, overlap_frac).
    *
    * Scale shape: the denominator and numerator come from ONE pass over
    * the exploded distinct grams (the broadcast eval join is a LEFT join,
    * so non-hits survive to the count) — the train side shuffles only
    * (id, 16-byte digest) rows into the per-doc aggregate, and docs with
    * no grams at all are absent by construction (no 0/0). */
  def overlapFraction(train: DataFrame, idCol: String, textCol: String,
      evalDigests: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"gram length must be >= 1, got $n")
    val grams = train.select(col(idCol),
        explode(array_distinct(gramDigests(textCol, n))).as("__g"))
    grams.join(broadcast(evalDigests.withColumn("__hit", lit(1))),
        Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__hit")).as("n_hit"))
      .withColumn("overlap_frac",
        col("n_hit").cast("double") / col("n_grams"))
  }

  /** The shared map-side pipeline: exploded train gram digests broadcast-
    * hash-joined against the eval digests — one row per contaminated span
    * occurrence, (idCol, __g). */
  private def hits(train: DataFrame, idCol: String, textCol: String,
      evalDigests: DataFrame, n: Int): DataFrame = {
    require(n >= 1, s"gram length must be >= 1, got $n")
    train.select(col(idCol), explode(gramDigests(textCol, n)).as("__g"))
      .join(broadcast(evalDigests), "__g")
  }

  private def gramDigests(textCol: String, n: Int) =
    transform(TextFunctions.wordShingles(col(textCol), n),
      g => md5(g.cast("binary")))
}
