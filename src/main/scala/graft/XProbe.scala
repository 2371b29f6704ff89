package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 optimization measurement scaffolding (guide §1: measure first,
  * stage by stage): splits the bench's heavyweight rows into their
  * pipeline stages and times each, so optimization effort lands on the
  * stage that actually carries the wall-clock. Mirrors the exact shapes
  * `Bench` runs (same replication, same shuffle-partition override, same
  * parameters). Not engine code; not part of any declared query.
  *
  * Run: `sbt "runMain graft.XProbe [probe,...]"` with
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as the bench reads them.
  */
object XProbe {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val wanted: Option[Set[String]] =
      if (args.nonEmpty) Some(args(0).split(",").map(_.trim).toSet) else None
    def on(p: String): Boolean = wanted.forall(_.contains(p))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def stage(name: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(s"xprobe: $name")
      val t = timed(f)
      println(f"[xprobe] $name%-42s $t%8.2f s")
      spark.sparkContext.setJobDescription(null)
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    if (on("minhash")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      val scaled = DedupStress.replicateDocs(docs, 10).repartition(32).persist()
      scaled.count()
      // warm rep (the bench's own discipline: rep1 pays C2 compilation)
      stage("minhash.full.rep1(warm)") { force(ops.Dedup.minhashPairs(
        scaled, "doc_id", "text", n = 1, numHashes = 48, bands = 6,
        threshold = 0.9)) }
      // stage splits, all on a warmed JVM
      val sh = ops.Dedup.shingleSets(scaled, "doc_id", "text", 1)
      stage("minhash.shingleSets(count)") { sh.count() }
      val cand = ops.Dedup.minhashCandidates(sh, 48, 6)
      var nCand = 0L
      stage("minhash.candidates(count)") { nCand = cand.count() }
      println(s"[xprobe] minhash candidates = $nCand")
      // candidate size-band cut potential: how many candidates could the
      // jaccard>=0.9 size band have dropped before the attach joins?
      val ids = sh.select($"id", $"sz")
      var nBand = 0L
      stage("minhash.candidates.sizeband(count)") {
        nBand = cand
          .join(ids.select($"id".as("id_a"), $"sz".as("sz_a")), "id_a")
          .join(ids.select($"id".as("id_b"), $"sz".as("sz_b")), "id_b")
          .filter(least($"sz_a", $"sz_b") >=
            greatest($"sz_a", $"sz_b") * lit(0.9) - lit(1e-9))
          .count()
      }
      println(s"[xprobe] minhash size-band survivors = $nBand of $nCand")
      stage("minhash.full.rep2") { force(ops.Dedup.minhashPairs(
        scaled, "doc_id", "text", n = 1, numHashes = 48, bands = 6,
        threshold = 0.9)) }
      scaled.unpersist()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    if (on("jaccard")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      val synth = DedupStress.syntheticDocs(spark, 50000)
        .repartition(32).persist()
      synth.count()
      stage("jaccard.full.rep1(warm)") { force(ops.Dedup.ngramJaccardPairs(
        synth, "doc_id", "text", n = 1, threshold = 0.9)) }
      val sh = ops.Dedup.shingleSets(synth, "doc_id", "text", 1)
      stage("jaccard.shingleSets(count)") { sh.count() }
      stage("jaccard.vocabProbe(agg)") {
        sh.select(explode($"sh").as("tok"))
          .agg(approx_count_distinct($"tok")).head()
      }
      stage("jaccard.shCount") { sh.count() }
      val cand = ops.Dedup.prefixCandidates(sh, 0.9)
      stage("jaccard.prefixCandidates(count)") { println(
        s"[xprobe] jaccard candidates = ${cand.count()}") }
      stage("jaccard.full.rep2") { force(ops.Dedup.ngramJaccardPairs(
        synth, "doc_id", "text", n = 1, threshold = 0.9)) }
      synth.unpersist()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    if (on("simhash")) {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "256")
      val scaled = DedupStress.replicateDocs(docs, 10).repartition(32).persist()
      scaled.count()
      stage("simhash.full.rep1(warm)") { force(ops.Dedup.simhashPairs(
        scaled, "doc_id", "text", maxHamming = 6)) }
      stage("simhash.full.rep2") { force(ops.Dedup.simhashPairs(
        scaled, "doc_id", "text", maxHamming = 6)) }
      scaled.unpersist()
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }

    if (on("fuzzy")) {
      val names = spark.read.parquet(s"$sfDir/customer.parquet")
        .filter(col("c_custkey") <= 15000)
        .select(col("c_custkey"), col("c_name"))
        .repartition(32).persist()
      names.count()
      stage("fuzzy.full.rep1(warm)") { force(ops.FuzzyJoin.editDistancePairs(
        names, "c_custkey", "c_name", maxDist = 2)) }
      val cand = ops.FuzzyJoin.candidatePairs(names, "c_custkey", "c_name", 2)
      stage("fuzzy.candidates(count)") { println(
        s"[xprobe] fuzzy candidates = ${cand.count()}") }
      stage("fuzzy.full.rep2") { force(ops.FuzzyJoin.editDistancePairs(
        names, "c_custkey", "c_name", maxDist = 2)) }
      names.unpersist()
    }

    if (on("tfidf")) {
      val synth = DedupStress.syntheticDocs(spark, 50000)
        .repartition(32).persist()
      synth.count()
      stage("tfidf.full.rep1(warm)") { force(ops.SparseSimilarity
        .tfidfNeighbors(synth, "doc_id", "text", k = 3, maxDfFraction = 0.5)) }
      stage("tfidf.full.rep2") { force(ops.SparseSimilarity
        .tfidfNeighbors(synth, "doc_id", "text", k = 3, maxDfFraction = 0.5)) }
      synth.unpersist()
    }

    if (on("graph")) {
      Seq("q92_triangles", "q94_pagerank", "q97_edge_jaccard",
        "q130_coreness", "q133_label_prop", "q137_hits").foreach { q =>
        stage(s"$q.rep1(warm)") { force(SparkEntry.queries(q)(spark, sfDir)) }
        stage(s"$q.rep2") { force(SparkEntry.queries(q)(spark, sfDir)) }
      }
    }

    spark.stop()
  }
}
