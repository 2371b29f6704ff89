package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the opinionated engine session (GraftExtensions + AQE/skew configs) is
    // what correctness actually runs through — not a bare builder
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // scale-gate sizing (sf1 runs): SPARK_GRAFT_SHUFFLE_PARTITIONS is
    // honored (and validated) inside GraftSession.builder — the 50k-doc
    // minhash/jaccard verifies move ~40M candidate rows with ~1 KB
    // payloads and need the 256-partition sizing the bench's dedup block
    // documents; AQE coalesces the small queries back down for free
    new java.io.File(outDir).mkdirs()
    // iteration aid: SPARK_GRAFT_VERIFY_ONLY=q67,q80 dumps just the named
    // query prefixes (driver runs with it unset → full surface);
    // SPARK_GRAFT_VERIFY_SKIP excludes by prefix (the sf1 scale gate
    // skips the fixture-artifact quadratic queries documented in
    // NOTES_r9 §7 — the driver's sf0.01 gate never sets either)
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val skip = sys.env.get("SPARK_GRAFT_VERIFY_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    def selected(name: String) = only.forall(_.exists(name.startsWith)) &&
      !skip.exists(name.startsWith)
    // SPARK_GRAFT_VERIFY_SQL_ONLY=1 refreshes oracle_sql.json for an
    // EXISTING dump dir without re-running the engine side (the scale
    // gate re-adjudicates oracle formulations against already-written
    // parquet; the engine outputs are oracle-independent)
    val sqlOnly = sys.env.get("SPARK_GRAFT_VERIFY_SQL_ONLY").contains("1")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(kv => !sqlOnly && selected(kv._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name ok (${(System.nanoTime() - t0) / 1e9}%.1fs)")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSqlFor(sfDir)
      .filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Provenance stamp (VERDICT r13 task 1): the scale-gate artifact must
    // carry the tree it was produced from INSIDE the artifact — r13's
    // claimed sf1 re-run was contradicted by a committed JSON that had no
    // stamp. The engine side records its own head + session confs here;
    // check_oracle_each.py embeds this file into the gate JSON verbatim.
    def sh(cmd: String*): String =
      try {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes()).trim
        if (p.waitFor() == 0) out else "unknown"
      } catch { case _: Throwable => "unknown" }
    val head = sh("git", "rev-parse", "HEAD")
    val dirty = sh("git", "status", "--porcelain") match {
      case "unknown" => q("unknown")
      case "" => "false"
      case _ => "true"
    }
    val confs = Seq(
      "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      GraftSession.ShjThresholdKey,
      "spark.sql.adaptive.enabled").map { k =>
      s"${q(k)}: ${q(spark.conf.getOption(k).getOrElse("unset"))}"
    }
    val meta = Seq(
      s"${q("tree_head")}: ${q(head)}",
      s"${q("tree_dirty")}: $dirty",
      s"${q("date_utc")}: ${q(java.time.Instant.now.toString)}",
      s"${q("sf_dir")}: ${q(sfDir)}",
      s"${q("cpus")}: ${q(cpus)}",
      s"${q("verify_skip")}: ${q(skip.mkString(","))}",
      s"${q("verify_only")}: ${q(only.map(_.mkString(",")).getOrElse(""))}",
      s"${q("session_confs")}: ${confs.mkString("{", ",", "}")}"
    ).mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_meta.json"), meta)
    spark.stop()
  }
}
