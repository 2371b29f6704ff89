package graft

import graft.ops.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Candidate-growth stress harness for the dedup family: measures candidate
  * and verified-pair counts as the corpus scales, on two corpus shapes —
  * the measurement behind the near-linear-candidate-growth claims in
  * [[graft.ops.Dedup]]'s docs (results recorded in NOTES_r3.md):
  *
  *   - the REPLICATED FIXTURE (tiny shared vocabulary, every token common):
  *     the degenerate shape where token blocking cannot discriminate.
  *     Minhash banding stays near-linear here (P[band collision] ~ 6*j^8 is
  *     ~0 for background jaccard ~0.03); size banding — blocking on length
  *     alone — is provably quadratic on it, which is WHY it is only the
  *     small-corpus fallback and why candidate counts, not wall-clock at
  *     sf0.1, are what must be watched;
  *   - a SYNTHETIC LARGE-VOCAB corpus (near-dup pairs with per-doc unique
  *     vocabulary — the realistic web-text shape): prefix filtering's
  *     candidates track the true pair count, i.e. linear.
  *
  * Counts are taken on the ids-only candidate frames (no shingle
  * re-attach), so even a quadratic scheme is counted, not materialized.
  *
  * `runMain graft.DedupStress [sf=DIR] [scales=1,2,4] [synth=12500,25000,50000]`
  */
object DedupStress {

  /** Replicate docs `reps`x with each replica's tokens rewritten into a
    * replica-private namespace (`w` -> `w + "zq<rep>"`): within a replica
    * the token bijection preserves the base corpus's pair structure
    * EXACTLY (every jaccard, minhash band, simhash signature relation),
    * while across replicas token sets are DISJOINT — jaccard exactly 0, so
    * true pairs and blocking-candidate counts must grow exactly linearly
    * in `reps`; superlinear measured growth indicts the blocking scheme,
    * not the data. (Two rejected designs, kept as a warning: appending a
    * few shared-per-replica salt tokens leaves cross-replica copies at
    * j ~ 0.86 — inside the minhash S-curve, quadratic candidate mass; and
    * appending MANY shared salt tokens makes salt the band minima — whole
    * replicas collapse into one bucket. Shared tokens across documents are
    * never neutral to content blocking.) Ids remap to doc_id*reps + rep. */
  def replicateDocs(docs: DataFrame, reps: Int): DataFrame = {
    val spark = docs.sparkSession
    docs.crossJoin(spark.range(reps).select(col("id").as("rep")))
      .select((col("doc_id") * reps + col("rep")).as("doc_id"),
        regexp_replace(col("text"), lit("(\\S+)"),
          concat(lit("$1zq"), col("rep"))).as("text"))
  }

  /** Large-vocabulary synthetic corpus (the realistic shape for web-scale
    * text): `nDocs/2` doc pairs, each doc 20 tokens of per-pair-unique
    * vocabulary, the partner missing one token (jaccard 19/20 = 0.95 >=
    * 0.9); zero cross-pair token overlap. Vocabulary ~10x the corpus, so
    * `ngramJaccardPairs` auto mode picks prefix filtering — candidates
    * should track the `nDocs/2` true pairs. */
  def syntheticDocs(spark: SparkSession, nDocs: Int): DataFrame = {
    val base = spark.range(nDocs / 2)
      .select(col("id"), transform(sequence(lit(1), lit(20)),
        i => concat(lit("w"), col("id"), lit("_"), i)).as("toks"))
    base.select((col("id") * 2).as("doc_id"),
        concat_ws(" ", col("toks")).as("text"))
      .unionByName(base.select((col("id") * 2 + 1).as("doc_id"),
        concat_ws(" ", slice(col("toks"), 2, 19)).as("text")))
  }

  def main(args: Array[String]): Unit = {
    val argMap = args.flatMap { a =>
      a.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap
    val sfDir = argMap.getOrElse("sf",
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val scales = argMap.getOrElse("scales", "1,2,4")
      .split(",").map(_.trim.toInt).toSeq
    val synthSizes = argMap.getOrElse("synth", "12500,25000,50000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    println("## replicated fixture (tiny vocab, degenerate for token blocking)")
    println("| scale | docs | size-band cand | minhash cand (48/6) | simhash cand (h<=6) | minhash pairs |")
    println("|---|---|---|---|---|---|")
    scales.foreach { s =>
      val scaled = replicateDocs(docs, s).repartition(cpus.toInt).persist()
      val n = scaled.count()
      val sh = Dedup.shingleSets(scaled, "doc_id", "text", 1)
      val sizeCand = Dedup.sizeBandCandidates(sh, 0.9, 8).count()
      val mhCand = Dedup.minhashCandidates(sh, 48, 6).count()
      val shCand = Dedup.simhashCandidates(scaled, "doc_id", "text", 6).count()
      val mhPairs = Dedup.minhashPairs(scaled, "doc_id", "text",
        n = 1, numHashes = 48, bands = 6, threshold = 0.9).count()
      scaled.unpersist()
      println(s"| ${s}x | $n | $sizeCand | $mhCand | $shCand | $mhPairs |")
    }

    println()
    println("## synthetic large-vocab corpus (realistic near-dup shape)")
    println("| docs | prefix cand | minhash cand (48/6) | jaccard pairs (auto) |")
    println("|---|---|---|---|")
    synthSizes.foreach { n =>
      val synth = syntheticDocs(spark, n).repartition(cpus.toInt).persist()
      synth.count()
      val sh = Dedup.shingleSets(synth, "doc_id", "text", 1)
      val prefCand = Dedup.prefixCandidates(sh, 0.9).count()
      val mhCand = Dedup.minhashCandidates(sh, 48, 6).count()
      val pairs = Dedup.ngramJaccardPairs(synth, "doc_id", "text",
        n = 1, threshold = 0.9).count()
      synth.unpersist()
      println(s"| $n | $prefCand | $mhCand | $pairs |")
    }
    spark.stop()
  }
}
