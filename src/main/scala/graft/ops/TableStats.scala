package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** ANALYZE-style table profiling: per-column row counts, null counts,
  * distinct counts, and min/max in ONE pass over the table — the stats
  * collection a cost-based optimizer (and any data-quality report) runs
  * before everything else.
  *
  * Scale shape: all columns' statistics come from a single aggregate scan.
  * With `exactNdv = false` (the 100 TB default) distinct counts use HLL++
  * (`approx_count_distinct`, rsd 5%): constant sketch state per column,
  * map-side combinable, no extra passes. `exactNdv = true` swaps in
  * `count(DISTINCT col)` per column, which Spark executes via an N-way
  * Expand of the scan (one replica per distinct aggregate) — acceptable on
  * validation-scale tables, wrong at 100 TB; it exists so small-table
  * profiles can be oracle-exact.
  *
  * Output: one row per column — (col_name, non_nulls, nulls, n_distinct,
  * min_num, max_num, min_str, max_str). Numeric columns report min/max as
  * doubles; string columns as strings; each leaves the other pair null
  * (mixed-type min/max as strings would inherit engine-specific number
  * formatting).
  */
object TableStats {

  def profile(df: DataFrame, cols: Seq[String],
      exactNdv: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val total = count(lit(1))
    val aggs = total.as("__total") +: cols.flatMap { c =>
      val ndv =
        if (exactNdv) countDistinct(col(c)) else approx_count_distinct(c)
      Seq(count(col(c)).as(s"__nn_$c"), ndv.as(s"__nd_$c")) ++
        (df.schema(c).dataType match {
          case _: NumericType => Seq(
            min(col(c)).cast("double").as(s"__min_$c"),
            max(col(c)).cast("double").as(s"__max_$c"))
          case _ => Seq(
            min(col(c)).cast("string").as(s"__smin_$c"),
            max(col(c)).cast("string").as(s"__smax_$c"))
        })
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      val numeric = df.schema(c).dataType.isInstanceOf[NumericType]
      struct(
        lit(c).as("col_name"),
        col(s"__nn_$c").as("non_nulls"),
        (col("__total") - col(s"__nn_$c")).as("nulls"),
        col(s"__nd_$c").as("n_distinct"),
        (if (numeric) col(s"__min_$c") else lit(null).cast("double"))
          .as("min_num"),
        (if (numeric) col(s"__max_$c") else lit(null).cast("double"))
          .as("max_num"),
        (if (numeric) lit(null).cast("string") else col(s"__smin_$c"))
          .as("min_str"),
        (if (numeric) lit(null).cast("string") else col(s"__smax_$c"))
          .as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** Equal-width value histogram of a numeric column: `bins` buckets over
    * [lo, hi] (data min/max when not given — ONE bounded bounds-aggregate,
    * its two doubles folded into the bin expression), right edge clamped
    * into the last bin. Map-only bin assignment + one bin-keyed aggregate;
    * nulls and out-of-range rows are dropped. Output: (bin, bin_lo,
    * bin_hi, n). */
  def histogram(df: DataFrame, c: String, bins: Int,
      bounds: Option[(Double, Double)] = None): DataFrame = {
    require(bins > 0, "histogram: bins must be positive")
    val (lo, hi) = bounds.getOrElse {
      val r = df.agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .head()
      require(!r.isNullAt(0), s"histogram: $c has no non-null values")
      (r.getDouble(0), r.getDouble(1))
    }
    require(hi >= lo, s"histogram: empty range [$lo, $hi]")
    val width = if (hi > lo) (hi - lo) / bins else 1.0
    val bin = least(floor((col(c).cast("double") - lit(lo)) / lit(width))
      .cast("long"), lit(bins - 1L))
    df.filter(col(c).isNotNull &&
        col(c).cast("double").between(lo, hi))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (lit(lo) + col("bin") * lit(width)).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * lit(width)).as("bin_hi"),
        col("n"))
  }

  /** Per-dimension profile of a vector column — `(dim, n, mean,
    * variance)` — through [[graft.expressions.VecMoments]]'s ONE-pass
    * element-wise aggregate: the embedding-column sibling of [[profile]],
    * feeding quantizer grids (SQ ranges, PQ sub-space scaling), drift
    * monitors, and standardization. The naive `posexplode` +
    * `groupBy(dim)` shuffles rows x dims rows; this ships one
    * `16*dim`-byte moment buffer per partition and explodes only the
    * final dim-long result row. Mean/variance are derived with explicit
    * `sum/n` arithmetic (population variance `E[x^2] - E[x]^2`) so an
    * oracle can share the formula term for term. */
  def vectorProfile(df: DataFrame, vecCol: String): DataFrame =
    df.agg(graft.expressions.SketchExpressions.vecMoments(col(vecCol))
        .as("m"))
      .select(col("m.n").as("n"), col("m.sum").as("s"),
        col("m.sumsq").as("q"))
      .select(col("n"), posexplode(arrays_zip(col("s"), col("q"))))
      .select(col("pos").cast("long").as("dim"), col("n"),
        (col("col.s") / col("n")).as("mean"),
        (col("col.q") / col("n") -
          pow(col("col.s") / col("n"), 2)).as("variance"))

  /** Join-cardinality scouting WITHOUT running the join: per side one
    * pass builds a mergeable HLL sketch of the join key (plus a row
    * count), and inclusion-exclusion over the sketch union estimates the
    * key overlap — `|A∩B| ≈ est(A) + est(B) − est(A∪B)`. The 100 TB
    * planning question ("will this join explode? is the dim side's key
    * set really a subset?") answered for two scans and a 4 KB sketch
    * merge, before committing to the shuffle. Datasketches HLL (the q77
    * machinery): sketches union losslessly, so both sides can come from
    * pre-aggregated per-partition sketches. Output (one row):
    * `(n_a, n_b, distinct_a, distinct_b, distinct_union,
    * est_intersection)`. */
  def joinKeyOverlap(a: DataFrame, b: DataFrame, aKey: String,
      bKey: String): DataFrame = {
    val sa = a.agg(count(lit(1)).as("n_a"),
      hll_sketch_agg(col(aKey)).as("sk_a"))
    val sb = b.agg(count(lit(1)).as("n_b"),
      hll_sketch_agg(col(bKey)).as("sk_b"))
    sa.crossJoin(broadcast(sb))
      .select(col("n_a"), col("n_b"),
        hll_sketch_estimate(col("sk_a")).as("distinct_a"),
        hll_sketch_estimate(col("sk_b")).as("distinct_b"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))
          .as("distinct_union"))
      .withColumn("est_intersection",
        greatest(lit(0L),
          col("distinct_a") + col("distinct_b") - col("distinct_union")))
  }

  /** Population-stability-index drift between a reference and a current
    * snapshot, per key: `PSI = Σ_b (p_b − q_b)·ln(p_b/q_b)` over a FIXED
    * bucket domain `0..nBuckets-1` (callers pre-bucket with explicit
    * width math — fixed edges are what make the metric reproducible and
    * engine-portable; quantile edges would drift with the data). Add-one
    * (Laplace) smoothing makes empty buckets well-defined instead of
    * ±∞: `p_b = (c_b + 1)/(n + nBuckets)` on BOTH sides — deterministic,
    * mirrored exactly in SQL. The monitoring gate a 100 TB/day ingest
    * runs between yesterday's and today's distributions (PSI > 0.2 is
    * the conventional "investigate" line).
    *
    * Scale shape: one (key, bucket) count per side (map-side
    * combinable), the key×bucket domain frame is keys·nBuckets rows,
    * and the final PSI is one short-key aggregate — nothing scans twice,
    * nothing is quadratic. Output: `(keyCol, n_ref, n_cur, psi)`. */
  def psiDrift(ref: DataFrame, cur: DataFrame, keyCol: String,
      bucket: org.apache.spark.sql.Column, nBuckets: Int): DataFrame = {
    require(nBuckets > 1, s"nBuckets must be > 1, got $nBuckets")
    def cnts(df: DataFrame) = df
      .select(col(keyCol), bucket.cast("int").as("bucket"))
      .groupBy(col(keyCol), col("bucket")).agg(count(lit(1)).as("c"))
    val r = cnts(ref)
    val c = cnts(cur)
    val dom = r.select(col(keyCol)).unionAll(c.select(col(keyCol)))
      .distinct()
      .select(col(keyCol),
        explode(sequence(lit(0), lit(nBuckets - 1))).as("bucket"))
    val joined = dom
      .join(r.withColumnRenamed("c", "cr"), Seq(keyCol, "bucket"), "left")
      .join(c.withColumnRenamed("c", "cc"), Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("cc"), lit(0L)).as("cc"))
    val tot = Window.partitionBy(col(keyCol))
    val p = (col("cr") + 1).cast("double") /
      (sum(col("cr")).over(tot) + nBuckets)
    val q = (col("cc") + 1).cast("double") /
      (sum(col("cc")).over(tot) + nBuckets)
    joined
      .select(col(keyCol), col("cr"), col("cc"),
        p.as("p"), q.as("q"),
        sum(col("cr")).over(tot).as("n_ref"),
        sum(col("cc")).over(tot).as("n_cur"))
      .groupBy(col(keyCol))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        sum((col("p") - col("q")) * log(col("p") / col("q"))).as("psi"))
  }
}
