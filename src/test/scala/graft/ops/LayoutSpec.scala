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
}
