package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Round-14 optimization plan artifacts (measurement scaffolding, not
  * engine code): for every query/operator the optimization round touches,
  * dump BOTH the pre-execution `explain("formatted")` (the AQE initial
  * plan — join strategy defaults, PushedFilters, ReadSchema, Exchange
  * placement) and the post-execution adaptive plan (`isFinalPlan=true` —
  * the strategies AQE actually ran: runtime BHJ/SHJ conversions,
  * coalesced reads) into `plans/r14/<row>_<when>.txt`.
  *
  * The bench's scaled rows (`x_dedup_*`, `x_fuzzy_k2_15k`, `x_tfidf_50k`)
  * have no declared-query twin at their scale, so their inputs are
  * rebuilt here EXACTLY as `Bench` builds them (same replication, same
  * shuffle-partition override, same parameters) — a plan claim about a
  * bench row must come from the bench row's own shape.
  *
  * Run: `sbt "runMain graft.XPlans <when> [row,...]"` with
  * `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as the bench reads them.
  */
object XPlans {

  private def finalPlan(df: DataFrame): String = {
    // Execute the frame's OWN QueryExecution so the AdaptiveSparkPlanExec
    // we stringify is the one that ran (a noop write would plan a fresh
    // QueryExecution and leave this one initial). RDD-level foreach
    // evaluates every row like the bench's noop sink does.
    val qe = df.queryExecution
    qe.executedPlan.execute().foreach(_ => ())
    qe.executedPlan.toString
  }

  def main(args: Array[String]): Unit = {
    val when = args.headOption.getOrElse("before")
    val wanted: Option[Set[String]] =
      if (args.length > 1) Some(args(1).split(",").map(_.trim).toSet)
      else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get("plans/r14")
    Files.createDirectories(outDir)

    def dump(row: String, mkDf: () => DataFrame,
        shufflePartitions: Option[String] = None): Unit = {
      if (wanted.exists(w => !w.contains(row))) return
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      shufflePartitions.foreach(p =>
        spark.conf.set("spark.sql.shuffle.partitions", p))
      try {
        spark.sparkContext.setJobDescription(s"xplans: $row")
        val df = mkDf()
        val initial = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val executed = finalPlan(df)
        val txt = new StringBuilder
        txt ++= s"== $row ($when) ==\n"
        txt ++= s"tree_head: ${treeHead()}\n"
        txt ++= s"sf_dir: $sfDir  shuffle_partitions: ${spark.conf
          .get("spark.sql.shuffle.partitions")}\n\n"
        txt ++= "---- initial plan (explain formatted, AQE not yet run) ----\n"
        txt ++= initial
        txt ++= "\n---- executed plan (AQE final) ----\n"
        txt ++= executed
        txt ++= "\n"
        Files.write(outDir.resolve(s"${row}_$when.txt"),
          txt.toString.getBytes("UTF-8"))
        System.err.println(s"[xplans] wrote $row ($when)")
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.sparkContext.setJobDescription(null)
      }
    }

    // ---- bench x-row shapes (mirror Bench exactly) ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    lazy val scaled = DedupStress.replicateDocs(docs, 10)
      .repartition(32).persist()
    lazy val synth = DedupStress.syntheticDocs(spark, 50000)
      .repartition(32).persist()
    lazy val names = spark.read.parquet(s"$sfDir/customer.parquet")
      .filter(col("c_custkey") <= 15000)
      .select(col("c_custkey"), col("c_name"))
      .repartition(32).persist()

    dump("x_dedup_minhash_50k", () => ops.Dedup.minhashPairs(
      scaled, "doc_id", "text", n = 1, numHashes = 48, bands = 6,
      threshold = 0.9), Some("256"))
    dump("x_dedup_simhash_50k", () => ops.Dedup.simhashPairs(
      scaled, "doc_id", "text", maxHamming = 6), Some("256"))
    dump("x_dedup_jaccard_50k", () => ops.Dedup.ngramJaccardPairs(
      synth, "doc_id", "text", n = 1, threshold = 0.9), Some("256"))
    dump("x_fuzzy_k2_15k", () => ops.FuzzyJoin.editDistancePairs(
      names, "c_custkey", "c_name", maxDist = 2))
    dump("x_tfidf_50k", () => ops.SparseSimilarity.tfidfNeighbors(
      synth, "doc_id", "text", k = 3, maxDfFraction = 0.5))

    // ---- declared queries the round touches (sf0.1, bench shape) ----
    Seq("q20_minhash_pairs", "q21_simhash_pairs", "q15_jaccard_pairs",
      "q106_fuzzy_names", "q94_pagerank", "q92_triangles",
      "q97_edge_jaccard", "q115_keep_best")
      .foreach { q => dump(q, () => SparkEntry.queries(q)(spark, sfDir)) }

    spark.stop()
  }

  private def treeHead(): String =
    try {
      val p = new ProcessBuilder("git", "rev-parse", "--short", "HEAD")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8").trim
      p.waitFor()
      out
    } catch { case _: Throwable => "unknown" }
}
