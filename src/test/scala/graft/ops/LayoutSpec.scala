package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("zOrderValue codegen column matches the Scala mirror on a grid") {
    import spark.implicits._
    val ranges = Seq((0.0, 1000.0), (-500.0, 500.0))
    val pts = for (x <- 0 until 40; y <- 0 until 40)
      yield (x * 25.6, y * 25.6 - 500.0)
    val got = pts.toDF("x", "y")
      .select($"x", $"y",
        Layout.zOrderValue(Seq($"x", $"y"), ranges, bits = 10).as("z"))
      .collect()
    got.foreach { r =>
      r.getLong(2) shouldBe Layout.zOrderValueScala(
        Seq(r.getDouble(0), r.getDouble(1)), ranges, bits = 10)
    }
    // out-of-range values clamp instead of corrupting high bits
    Seq((-999.0, 9999.0)).toDF("x", "y")
      .select(Layout.zOrderValue(Seq($"x", $"y"), ranges, bits = 10))
      .head().getLong(0) shouldBe
      Layout.zOrderValueScala(Seq(-999.0, 9999.0), ranges, bits = 10)
  }

  test("z-order layout keeps per-file min/max tight on BOTH dims and Spark " +
      "row-group pruning actually skips; linear sort cannot") {
    import spark.implicits._
    val linDir = java.nio.file.Files.createTempDirectory("graft_lin").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    try {
      // uniform 2-D grid: 4096 points, both dims in [0, 4096)
      val grid = (for (x <- 0 until 64; y <- 0 until 64)
        yield (x * 64L, y * 64L, x * 64L + y)).toDF("x", "y", "payload")
      // linear layout: globally sorted on x only — the single-sort strawman
      grid.repartitionByRange(16, $"x").sortWithinPartitions($"x")
        .write.mode("overwrite").parquet(linDir)
      Layout.zOrderWrite(grid, Seq("x", "y"), zDir, numFiles = 16, bits = 10)

      // content preserved exactly by the rewrite
      val reRead = spark.read.parquet(zDir)
      reRead.count() shouldBe 4096
      reRead.except(grid).count() shouldBe 0
      grid.except(reRead).count() shouldBe 0

      // footer-stats view: per-file [min,max] of y — the intervals parquet
      // row-group pruning consults. A y-only band predicate (the dimension
      // the linear layout did NOT sort by) overlaps nearly every linear
      // file but only the z-files whose y-bits match.
      def yOverlaps(dir: String, lo: Long, hi: Long): (Int, Int) = {
        val spans = spark.read.parquet(dir)
          .groupBy(input_file_name()).agg(min($"y").as("mn"), max($"y").as("mx"))
          .collect().map(r => (r.getLong(1), r.getLong(2)))
        (spans.count { case (mn, mx) => mx >= lo && mn <= hi }, spans.length)
      }
      val (linHit, linTotal) = yOverlaps(linDir, 1024, 1535)  // 12.5% band
      val (zHit, zTotal) = yOverlaps(zDir, 1024, 1535)
      linTotal shouldBe 16
      zTotal shouldBe 16
      linHit shouldBe linTotal // x-sorted files all span the full y range
      zHit should be < linHit / 2 // z-layout: most files' y-range misses

      // and Spark's parquet reader exploits it: scan-node output rows on
      // the z layout are a fraction of the linear layout's (row groups
      // whose stats miss the band are never decoded; record-level
      // filtering is off by default so scan output ~= surviving groups)
      def scanRows(dir: String): Long = {
        val q = spark.read.parquet(dir).filter($"y" >= 1024 && $"y" <= 1535)
        q.collect() // executes q's own plan, so its scan metrics populate
        q.queryExecution.executedPlan.collectLeaves().collect {
          case s: FileSourceScanExec => s.metrics("numOutputRows").value
        }.sum
      }
      val (linScanned, zScanned) = (scanRows(linDir), scanRows(zDir))
      linScanned shouldBe 4096 // every row group overlaps the band
      zScanned should be < linScanned / 2
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(linDir)).deleteRecursively()
      new Directory(new java.io.File(zDir)).deleteRecursively()
    }
  }

  test("zOrderValueQuantile codegen column matches the Scala mirror, " +
      "including constant segments and out-of-range values") {
    import spark.implicits._
    // breakpoints with a duplicate-heavy (constant) middle segment
    val breaks = Seq(Seq(0.0, 1.0, 5.0, 5.0, 100.0),
      Seq(-10.0, 0.0, 10.0, 20.0, 30.0))
    val pts = Seq((-5.0, -20.0), (0.0, -10.0), (0.5, 3.0), (1.0, 10.0),
      (4.9, 15.0), (5.0, 19.9), (50.0, 25.0), (100.0, 30.0), (999.0, 99.0))
    val got = pts.toDF("x", "y")
      .select($"x", $"y",
        Layout.zOrderValueQuantile(Seq($"x", $"y"), breaks, bits = 8).as("z"))
      .collect()
    got.foreach { r =>
      r.getLong(2) shouldBe Layout.zOrderValueQuantileScala(
        Seq(r.getDouble(0), r.getDouble(1)), breaks, bits = 8)
    }
  }

  test("quantile-spaced z-order balances file sizes on a Zipf-skewed " +
      "column where linear min/max scaling collapses the head") {
    import spark.implicits._
    val linDir = java.nio.file.Files.createTempDirectory("graft_zlin").toString
    val qDir = java.nio.file.Files.createTempDirectory("graft_zq").toString
    try {
      // Zipf-ish skew: value v appears ~ 8000/v times, v in [1, 4000];
      // one extreme outlier stretches the linear range 250x
      val rows = ((1 to 4000).flatMap(v =>
        Seq.fill(math.max(1, 8000 / v))((v.toDouble, v.toLong))) :+
        (1e6, -1L)).toDF("x", "payload")
      val n = rows.count()
      Layout.zOrderWrite(rows, Seq("x"), linDir, numFiles = 8, bits = 10)
      Layout.zOrderWrite(rows, Seq("x"), qDir, numFiles = 8, bits = 10,
        quantileKnots = 16)

      // content preserved by the quantile layout too
      val reRead = spark.read.parquet(qDir)
      reRead.count() shouldBe n
      reRead.except(rows).count() shouldBe 0
      rows.except(reRead).count() shouldBe 0

      def fileCounts(dir: String): Array[Long] =
        spark.read.parquet(dir).groupBy(input_file_name()).count()
          .collect().map(_.getLong(1))
      val lin = fileCounts(linDir)
      val q = fileCounts(qDir)
      // linear scaling: the outlier compresses all real mass into bucket 0
      // -> nearly everything lands in one file
      lin.max.toDouble / n should be > 0.75
      // quantile spacing: the biggest file carries a bounded share
      q.length should be >= 6
      q.max.toDouble / n should be < 0.4
      // and the per-file min/max stats stay tight: a tail-range predicate
      // overlaps only a minority of quantile-laid files
      val spans = spark.read.parquet(qDir)
        .groupBy(input_file_name()).agg(min($"x").as("mn"), max($"x").as("mx"))
        .collect().map(r => (r.getDouble(1), r.getDouble(2)))
      val hit = spans.count { case (mn, mx) => mx >= 2000.0 && mn <= 3000.0 }
      hit should be < spans.length / 2
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(linDir)).deleteRecursively()
      new Directory(new java.io.File(qDir)).deleteRecursively()
    }
  }

  test("q50's exact config (orders, 2 dims, 8 files, 16 quantile knots): " +
      "file occupancy stays balanced on the real skewed table") {
    // the oracled query proves content preservation; THIS guards the
    // layout quality of the very same write — a regression that collapses
    // the skewed o_totalprice dim into few buckets stays visible even
    // while q50 hash-passes
    val qDir = java.nio.file.Files.createTempDirectory("graft_q50cfg").toString
    try {
      val orders = spark.read.parquet(
        s"${graft.TestSpark.sf0001}/orders.parquet")
      val n = orders.count()
      Layout.zOrderWrite(orders, Seq("o_custkey", "o_totalprice"), qDir,
        numFiles = 8, quantileKnots = 16)
      val counts = spark.read.parquet(qDir)
        .groupBy(input_file_name()).count().collect().map(_.getLong(1))
      counts.sum.toLong shouldBe n.longValue()
      counts.length should be >= 6
      // equal-occupancy target is n/8 per file; allow 2.5x imbalance
      counts.max.toDouble / n should be < 0.32
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(qDir)).deleteRecursively()
    }
  }

  test("bucketWrite: equi-join of two tables bucketed on the join key " +
      "plans with ZERO shuffle exchanges; content preserved") {
    import spark.implicits._
    val (ta, tb) = ("graft_spec_bucket_a", "graft_spec_bucket_b")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      val fact = (0L until 10000L).map(i => (i % 500, i)).toDF("k", "va")
      val dim = (0L until 500L).map(i => (i, s"d$i")).toDF("k", "vb")
      Layout.bucketWrite(fact, Seq("k"), 8, ta)
      Layout.bucketWrite(dim, Seq("k"), 8, tb)
      // content preserved by the bucketed write/read path
      spark.table(ta).count() shouldBe 10000
      spark.table(ta).except(fact).count() shouldBe 0
      fact.except(spark.table(ta)).count() shouldBe 0
      // force the shuffled-join regime a 100 TB fact-to-fact join lives
      // in (no broadcast escape hatch), then assert co-location: both
      // sides arrive pre-hashed into the same bucket space, so the
      // sort-merge join needs NO exchange on either side
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(ta)
        .join(spark.table(tb), Seq("k"))
      val p = joined.queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      p should include("SortMergeJoin")
      (p should not).include("Exchange")
      joined.count() shouldBe 10000
      // the same join WITHOUT bucketing shuffles both sides — the layout
      // is what removed the exchanges, not the data size
      val p2 = fact.join(dim, Seq("k")).queryExecution
        .explainString(org.apache.spark.sql.execution.ExplainMode
          .fromString("formatted"))
      p2 should include("Exchange")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql(s"DROP TABLE IF EXISTS $ta")
      spark.sql(s"DROP TABLE IF EXISTS $tb")
    }
  }

  test("zOrderWrite is total: all-null cluster column and empty input " +
      "degrade to a plain copy instead of an NPE") {
    import spark.implicits._
    val d1 = java.nio.file.Files.createTempDirectory("graft_znull").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_zempty").toString
    try {
      val withNulls = Seq((None: Option[Double], 1L), (None, 2L), (None, 3L))
        .toDF("x", "payload")
      Layout.zOrderWrite(withNulls, Seq("x"), d1, numFiles = 4)
      spark.read.parquet(d1).count() shouldBe 3
      val empty = spark.emptyDataset[(Double, Long)].toDF("x", "payload")
      Layout.zOrderWrite(empty, Seq("x"), d2, numFiles = 4)
      spark.read.parquet(d2).count() shouldBe 0
      Layout.zOrderWrite(empty, Seq("x"), d2, numFiles = 4,
        quantileKnots = 8)
      spark.read.parquet(d2).count() shouldBe 0
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(d1)).deleteRecursively()
      new Directory(new java.io.File(d2)).deleteRecursively()
    }
  }

  test("compact: a fragmented write collapses to size-targeted files with " +
      "content preserved; sortCols re-clusters while compacting") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("graft_frag").toString
    val out1 = java.nio.file.Files.createTempDirectory("graft_comp1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft_comp2").toString
    try {
      // simulate an over-parallel ingest: 64 tiny files
      val rows = (0L until 20000L).map(i => (i, i % 97, s"payload_$i"))
      rows.toDF("id", "k", "s").repartition(64)
        .write.mode("overwrite").parquet(src)
      def files(dir: String) = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files(src).length shouldBe 64
      val totalBytes = files(src).map(_.length()).sum

      // target ~ 1/4 of the data size -> expect about 4 files, never 64
      val n = Layout.compact(spark, src, out1, targetBytes = totalBytes / 4)
      files(out1).length shouldBe n
      n should (be >= 3 and be <= 6)
      // content preserved exactly
      spark.read.parquet(out1).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).sorted shouldBe
        rows.sorted

      // sorted compaction: per-file id ranges must be disjoint (clustered)
      Layout.compact(spark, src, out2, targetBytes = totalBytes / 4,
        sortCols = Seq("id"))
      val ranges = files(out2).map { f =>
        val ids = spark.read.parquet(f.getAbsolutePath)
          .select("id").collect().map(_.getLong(0))
        (ids.min, ids.max)
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Array((_, hi), (lo2, _)) => hi should be < lo2
        case _ =>
      }
      spark.read.parquet(out2).count() shouldBe rows.size
    } finally {
      import scala.reflect.io.Directory
      Seq(src, out1, out2).foreach(d =>
        new Directory(new java.io.File(d)).deleteRecursively())
    }
  }
}
