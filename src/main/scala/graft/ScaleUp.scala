package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor upscaler for the sf1 correctness/bench step (VERDICT r8
  * task 4): replicates the sf0.1 tables `factor`x with key SHIFTS that
  * preserve per-replica foreign-key structure, so every join keeps its
  * real selectivity at 10x the data. Both engines (Spark and the DuckDB
  * oracle) read the SAME produced parquet, so correctness equivalence is
  * independent of how the data was scaled — what the bigger tables buy
  * is a 10x-scale read on plans whose costs are super-linear-looking
  * (q92/q97/q130/q133).
  *
  * Key strides are `max(key)+1` computed from the data. Dimension-like
  * tables (nation, region) copy through unscaled. Document text gets a
  * per-replica suffix token (replica 0 unchanged) so the dedup operators
  * see near-dup structure, not 10 exact copies of the corpus; `n_chars`
  * is updated to stay consistent with the text it describes.
  *
  * Usage: `runMain graft.ScaleUp <srcDir> <dstDir> [factor]`. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val dstDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(dstDir).mkdirs()

    def reps = spark.range(factor).select(col("id").as("rep"))
    def t(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def stride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1
    // single FILE per table (driver-testdata parity): the DuckDB oracle
    // views point at `<dir>/<name>.parquet` as a file, and Spark splits
    // a single parquet file by row groups anyway
    def write(df: DataFrame, name: String): Unit = {
      val tmp = s"$dstDir/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles()
        .find(f => f.getName.startsWith("part-") &&
          f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file written for $name"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dstDir/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dir.listFiles().foreach(_.delete())
      dir.delete()
      println(s"[scaleup] $name -> $dstDir/$name.parquet")
    }
    // shift LONG key columns by rep * stride; everything else rides along
    def replicate(df: DataFrame, shifts: (String, Long)*): DataFrame = {
      val crossed = df.crossJoin(reps)
      shifts.foldLeft(crossed) { case (d, (k, s)) =>
        d.withColumn(k, col(k) + col("rep") * s)
      }.drop("rep")
    }

    val customer = t("customer"); val cK = stride(customer, "c_custkey")
    val supplier = t("supplier"); val sK = stride(supplier, "s_suppkey")
    val part = t("part"); val pK = stride(part, "p_partkey")
    val orders = t("orders"); val oK = stride(orders, "o_orderkey")
    val events = t("events")
    val eK = stride(events, "event_id"); val uK = stride(events, "user_id")
    val docs = t("documents"); val dK = stride(docs, "doc_id")
    val emb = t("embeddings"); val vK = stride(emb, "vec_id")

    write(t("nation"), "nation")
    write(t("region"), "region")
    write(replicate(customer, "c_custkey" -> cK), "customer")
    write(replicate(supplier, "s_suppkey" -> sK), "supplier")
    write(replicate(part, "p_partkey" -> pK), "part")
    write(replicate(orders, "o_orderkey" -> oK, "o_custkey" -> cK), "orders")
    write(replicate(t("lineitem"), "l_orderkey" -> oK, "l_partkey" -> pK,
      "l_suppkey" -> sK), "lineitem")
    write(replicate(events, "event_id" -> eK, "user_id" -> uK), "events")
    write(replicate(emb, "vec_id" -> vK), "embeddings")
    // documents: per-replica PER-TOKEN perturbation (replica 0
    // byte-identical to the source) — the DedupStress.replicateDocs
    // discipline. A suffix on every token keeps minhash/simhash
    // signatures distinct across replicas; a whole-document suffix
    // would leave most signatures identical, exploding one band bucket
    // into a single-task quadratic enumeration (measured: q104 at sf1
    // ran one task at ~2 cores for 15+ min before this fix)
    val docsScaled = docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") + col("rep") * dK)
      .withColumn("text",
        when(col("rep") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1zq"), col("rep")))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("rep")
    write(docsScaled, "documents")
    spark.stop()
  }
}
