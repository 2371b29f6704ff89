package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data clustering — the multi-column analogue of
  * sorting for storage layout. A linear sort on column A gives parquet
  * min/max footer stats that prune scans on A but leave every other column
  * scattered across all files; interleaving the bits of several columns'
  * normalized values and range-partitioning + sorting on that single
  * z-value keeps EVERY clustered column locally dense, so a range predicate
  * on any of them (or a box on several) overlaps only a small fraction of
  * the files' min/max ranges. At 100 TB this is the difference between a
  * full scan and reading a few percent of the files — the same layout
  * technique behind Delta's OPTIMIZE ZORDER and Hudi clustering, built here
  * from public Spark primitives only: pure Column bit math (codegen'd, no
  * UDF), `repartitionByRange` on the z-value expression, and a
  * sort-within-partitions so row groups inside a file stay tight too.
  *
  * Scale shape: normalization bounds are ONE aggregate job returning
  * 2·n scalars to the driver (bounded, like the IVF centroid collect); the
  * write itself is a single range shuffle of the data — exactly what a
  * plain global sort costs. Skewed dimensions degrade gracefully: a hot
  * value maps to one bucket and its files still carry tight stats for the
  * other dimensions (supply quantile-spaced `ranges` to
  * [[zOrderValue]]/[[zOrderWrite]] to equalize occupancy when it matters).
  */
object Layout {

  /** Morton z-value Column: each input column is scaled to a `bits`-bit
    * unsigned bucket via its `(lo, hi)` range, then the buckets' bits are
    * interleaved (column i contributes bit j to output position j·n+i).
    * Pure Column arithmetic — stays inside whole-stage codegen. Requires
    * `cols.size * bits <= 63` (fits a signed long, sign bit untouched).
    * Null inputs produce a null z-value (range-partitioning groups them
    * together, mirroring NULLS FIRST sort layout).
    */
  def zOrderValue(cols: Seq[Column], ranges: Seq[(Double, Double)],
      bits: Int = 12): Column = {
    require(cols.nonEmpty && cols.size == ranges.size,
      "one (lo, hi) range per z-order column")
    require(cols.size * bits <= 63,
      s"${cols.size} cols x $bits bits exceeds a long's 63 usable bits")
    val n = cols.size
    val top = (1L << bits) - 1
    val buckets = cols.zip(ranges).map { case (c, (lo, hi)) =>
      require(hi >= lo, s"range ($lo, $hi) is inverted")
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      val scaled = floor((c.cast("double") - lit(lo)) / lit(span)
        * lit((top + 1).toDouble)).cast("long")
      // clamp: v == hi lands exactly at 2^bits, out-of-range values clip
      greatest(lit(0L), least(lit(top), scaled))
    }
    val terms = for {
      j <- 0 until bits
      (b, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Morton z-value from per-column quantile breakpoints: the skew-robust
    * variant of [[zOrderValue]]. `breaks(i)` is an ascending list of K+1
    * breakpoints splitting column i's domain into K equal-occupancy
    * segments (from `approxQuantile`); segment s owns bucket span
    * [s·2^bits/K, (s+1)·2^bits/K), values interpolate linearly inside it,
    * and a constant segment (duplicate-heavy quantile) maps to its span
    * start — so a Zipf head or long tail still spreads across the full
    * bucket space instead of collapsing into a handful of buckets.
    * Backed by the single codegen'd [[graft.expressions.ZMortonQuantile]]
    * — the Column-arithmetic formulation duplicated the K-branch segment
    * search into every interleave term, and the range partitioner's
    * interpreted sampling pass (no CSE) made the quantile write ~4x the
    * linear one; semantics are spec-pinned to
    * [[zOrderValueQuantileScala]]. */
  def zOrderValueQuantile(cols: Seq[Column], breaks: Seq[Seq[Double]],
      bits: Int = 12): Column =
    graft.expressions.LayoutExpressions.zMortonQuantile(cols, breaks, bits)

  /** Spec-pinned reference semantics for one column's piecewise-linear
    * quantile bucket — the per-column step mirrored (and codegen'd) by
    * [[graft.expressions.ZMortonQuantile]]'s bucket routine; specs assert
    * the expression against this. */
  def bucketPiecewiseScala(v: Double, breaks: Seq[Double],
      bits: Int): Long = {
    val top = (1L << bits) - 1
    val k = breaks.size - 1
    val segW = (top + 1).toDouble / k
    if (v <= breaks.head) 0L
    else {
      val i = (0 until k).find(i => v < breaks(i + 1)).getOrElse(-1)
      if (i < 0) top
      else {
        val (lo, hi) = (breaks(i), breaks(i + 1))
        val pos = if (hi > lo) i * segW + (v - lo) / (hi - lo) * segW
                  else i * segW
        math.max(0L, math.min(top, math.floor(pos).toLong))
      }
    }
  }

  /** Scala mirror of [[zOrderValueQuantile]] for specs. */
  def zOrderValueQuantileScala(vals: Seq[Double], breaks: Seq[Seq[Double]],
      bits: Int = 12): Long = {
    val n = vals.size
    val buckets = vals.zip(breaks).map { case (v, b) =>
      bucketPiecewiseScala(v, b, bits)
    }
    (for { j <- 0 until bits; (b, i) <- buckets.zipWithIndex }
      yield ((b >> j) & 1L) << (j * n + i)).foldLeft(0L)(_ | _)
  }

  /** Scala mirror of [[zOrderValue]] for specs (codegen parity oracle). */
  def zOrderValueScala(vals: Seq[Double], ranges: Seq[(Double, Double)],
      bits: Int = 12): Long = {
    val n = vals.size
    val top = (1L << bits) - 1
    val buckets = vals.zip(ranges).map { case (v, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      val scaled = math.floor((v - lo) / span * (top + 1).toDouble).toLong
      math.max(0L, math.min(top, scaled))
    }
    (for { j <- 0 until bits; (b, i) <- buckets.zipWithIndex }
      yield ((b >> j) & 1L) << (j * n + i)).foldLeft(0L)(_ | _)
  }

  /** Rewrite `df` as `numFiles` parquet files clustered on the z-order of
    * `zCols`: one bounded min/max aggregate for the normalization ranges,
    * then a range repartition + in-partition sort on the z-value (computed
    * on the fly — the layout column is never materialized in the output
    * schema). Content is preserved exactly; only file/row placement changes.
    */
  def zOrderWrite(df: DataFrame, zCols: Seq[String], path: String,
      numFiles: Int, bits: Int = 12, quantileKnots: Int = 0): Unit = {
    val z =
      if (quantileKnots > 0) {
        // one bounded job: K+1 approx quantiles per column (ignores nulls).
        // 1% rank error: bucketing needs segment BOUNDARIES, not precise
        // quantiles — a knot off by 1% of rows shifts occupancy by 1%,
        // invisible next to the 1/K segment width — and the Greenwald-
        // Khanna summary buffer scales ~1/error, so 0.001 cost ~10x the
        // scan-side memory and merge time for nothing the layout can see.
        val probs = (0 to quantileKnots)
          .map(_.toDouble / quantileKnots).toArray
        val qs = df.stat.approxQuantile(zCols.toArray, probs, 0.01)
        if (qs.exists(_.isEmpty))
          // empty input / all-null column: no quantiles to space — every
          // row lands in bucket 0, write degenerates to a plain copy
          lit(0L)
        else zOrderValueQuantile(zCols.map(col), qs.map(_.toSeq), bits)
      } else {
        val aggs = zCols.flatMap(c =>
          Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
        val bounds = df.agg(aggs.head, aggs.tail: _*).head()
        val ranges = zCols.indices.map { i =>
          // all-null column / empty input leaves null aggregates: fall
          // back to a degenerate (0, 0) range — single bucket, content
          // still preserved — instead of an NPE
          if (bounds.isNullAt(2 * i) || bounds.isNullAt(2 * i + 1)) (0.0, 0.0)
          else (bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
        }
        zOrderValue(zCols.map(col), ranges, bits)
      }
    df.repartitionByRange(numFiles, z).sortWithinPartitions(z)
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed managed table: hash-partition rows into `nBuckets` files on
    * `bucketCols` and record the bucket spec in the catalog, so every later
    * equi-join or aggregation on those keys is CO-LOCATED — Catalyst sees
    * both sides pre-hashed into the same bucket space and plans a
    * sort-merge join with NO shuffle exchange on either side
    * (spec-asserted). At 100 TB this converts every fact-to-fact join on
    * the bucket keys from the single most expensive exchange in the plan
    * into a map-side zip of matching buckets — the standard warehouse
    * layout for repeatedly-joined tables (Hive/Spark bucketing; Delta's
    * liquid clustering plays the same role). Sorting within buckets keeps
    * the merge side streaming instead of hash-building.
    *
    * One hash shuffle at WRITE time is the entire cost; it is repaid on
    * every subsequent join. Use z-order ([[zOrderWrite]]) for range-scan
    * pruning, bucketing for join locality — they solve different halves of
    * the layout problem. */
  def bucketWrite(df: DataFrame, bucketCols: Seq[String], nBuckets: Int,
      table: String): Unit = {
    require(bucketCols.nonEmpty, "need at least one bucket column")
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Small-file compaction — the third layout operator (z-order solves
    * range pruning, bucketing join locality, compaction the SMALL-FILES
    * problem: a streaming ingest or over-parallel write leaves thousands of
    * KB-scale files whose per-file open/footer/task overhead dominates every
    * later scan). Rewrites `path` into files of ~`targetBytes` using the
    * source's own on-disk size (file-listing metadata — no data pass):
    *
    *   - file count = ceil(diskBytes / targetBytes), so the result tracks
    *     the DATA size, not the parallelism of whoever wrote it;
    *   - a round-robin `repartition(n)` (no keys, no sort) — the cheapest
    *     possible full shuffle, and the only one compaction needs; pass
    *     `sortCols` to re-cluster while compacting (then it is a range
    *     shuffle, [[zOrderWrite]]'s little sibling for one column).
    *
    * Content is preserved exactly; only file granularity changes. Returns
    * the file count written. */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
      out: String, targetBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Seq.empty): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hp).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(path)
    val arranged =
      if (sortCols.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    arranged.write.mode("overwrite").parquet(out)
    n
  }
}
