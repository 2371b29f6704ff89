package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data selection.
  *
  * A row is kept iff the first 16 bits of `md5(id)` (as 4 lowercase hex
  * chars) fall below `floor(rate * 2^16)`. The properties that matter at
  * 100 TB, and that `df.sample()` / RNG sampling lack:
  *
  *  - **Retry-stable**: the decision is a pure function of the row id, so
  *    task retries, partition re-splits, and AQE re-plans cannot change the
  *    sample (seeded `sample()` changes with partitioning).
  *  - **Map-only**: a scan-level filter — no shuffle, no sort; combines
  *    with predicate pushdown on everything else in the query.
  *  - **Nested**: a 10% sample is a strict subset of a 20% sample (same
  *    hash, larger threshold), so sample-size sweeps reuse the cache.
  *  - **Engine-portable**: any system with md5 reproduces the exact row
  *    set — which is also what makes it oracle-checkable bit-for-bit.
  */
object Sampling {

  /** 16-bit hash bucket of an id as 4 lowercase hex chars ('0000'..'ffff');
    * lexicographic order on the fixed-width hex = numeric order. */
  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string").cast("binary")), 1, 4)

  /** Threshold hex string for a sampling rate in [0, 1). */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0 && rate < 1, s"rate must be in [0,1), got $rate")
    f"${math.floor(rate * 65536).toInt}%04x"
  }

  /** Uniform deterministic sample at `rate`. */
  def hashSample(df: DataFrame, idCol: String, rate: Double): DataFrame =
    df.filter(hashBucket(col(idCol)) < lit(thresholdHex(rate)))

  /** Stratified deterministic sample: per-stratum rates with a default for
    * unlisted strata. Each stratum is an independent uniform hash sample,
    * so observed per-stratum fractions concentrate around the requested
    * rates (binomial, not exact-count sampling — exact-count would need a
    * per-stratum total first, i.e. an extra pass). */
  def stratifiedHashSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val threshold = rates.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (stratum, rate)) =>
        val hex = lit(thresholdHex(rate))
        Some(acc.fold(when(col(stratumCol) === stratum, hex))(
          _.when(col(stratumCol) === stratum, hex)))
      }
      .fold(lit(thresholdHex(defaultRate)))(
        _.otherwise(lit(thresholdHex(defaultRate))))
    df.filter(hashBucket(col(idCol)) < threshold)
  }

  /** Deterministic weighted-sampling key (Efraimidis & Spirakis 2006,
    * "Weighted random sampling with a reservoir"): `u^(1/w)` with `u` a
    * uniform drawn from the row id's md5 — taking the top-n rows by this
    * key is EXACTLY a weighted sample without replacement, but with every
    * property of [[hashSample]]: retry-stable, partition-invariant,
    * engine-portable (any system with md5 + pow reproduces the draw).
    *
    * `u` uses 52 md5 bits ((v + 0.5) / 2^52, exactly representable in a
    * double), so both engines feed IDENTICAL doubles to `pow`; the result
    * is cast to FLOAT before any rank comparison — the q41 rank-on-float
    * rule — so a last-ulp `pow` divergence between libm implementations
    * cannot flip a selection boundary. Rows with weight <= 0 get key 0
    * (never win a slot) in both engines: pow(u<1, +inf) = 0. */
  def weightedKey(id: Column, weight: Column): Column = {
    val u = (conv(substring(md5(id.cast("string").cast("binary")), 1, 13),
      16, 10).cast("double") + 0.5) / 4503599627370496.0 // 2^52
    pow(u, lit(1.0) / weight.cast("double")).cast("float")
  }

  /** Weighted sample of `n` rows per stratum, without replacement —
    * the quality-weighted data-selection primitive (inclusion odds scale
    * with `weightCol`, e.g. token count or a quality score). One hash
    * shuffle on the stratum + per-stratum rank; ties on the float key
    * break by id, so the draw is a pure function of the data. */
  def weightedSamplePerKey(df: DataFrame, idCol: String, stratumCol: String,
      weight: Column, n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive, got $n")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(desc("__wkey"), col(idCol))
    df.withColumn("__wkey", weightedKey(col(idCol), weight))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__wkey", "__rn")
  }

  /** Per-key WEIGHT-budget cap: walk each key's rows in `orderCol` order and
    * keep rows while the running weight total (inclusive) stays within
    * `budget` — the data-mixing quota primitive ("at most N tokens per
    * domain/source"), where doc-count caps get the mixture wrong because
    * document lengths vary by orders of magnitude.
    *
    * Determinism contract: `orderCol` must be unique per key (a pk) — the
    * cumulative sum, hence the kept set, is then a pure function of the
    * data, stable under retries and re-partitioning like [[hashSample]].
    * The frame is pinned to ROWS UNBOUNDED PRECEDING..CURRENT explicitly:
    * the default RANGE frame would sum order-ties together and make the
    * boundary row ambiguous.
    *
    * Scale shape: ONE hash shuffle on the key, then a per-key sort — the
    * same exchange a groupBy(key) pays. A key whose rows dwarf a task sorts
    * via spill; the budget itself bounds what survives, not what sorts, so
    * pair with a coarse [[hashSample]] pre-cut when single keys approach
    * task-memory scale. */
  def capPerKeyBudget(df: DataFrame, keyCol: String, orderCol: String,
      weight: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(weight).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Rendezvous (highest-random-weight) shard assignment:
    * `shard(id) = argmax over s in [0, nShards) of md5(id ":" s)` — the
    * stable routing primitive for sharding a corpus across workers,
    * embedding-index cells, or output files. Properties mod-hashing
    * (`pmod(hash(id), n)`) lacks:
    *
    *  - **Minimal disruption**: dropping shard `k` reassigns ONLY the keys
    *    that lived on `k` (their runner-up wins; every other key's argmax
    *    is untouched), and growing `n -> n+1` moves only ~1/(n+1) of keys
    *    — mod-hashing reshuffles (n-1)/n of the corpus on every resize.
    *  - **Deterministic + engine-portable**: a pure function of (id,
    *    shard), reproducible by any system with md5 — oracle-checkable
    *    bit-for-bit, stable under retries/re-partitioning like
    *    [[hashSample]].
    *  - **Map-only**: per-row Column math, no shuffle; `nShards` md5s per
    *    row is the classic HRW cost and vanishes against the scan at
    *    realistic shard counts.
    *
    * Ties (never in practice: a tie needs an md5 collision between two
    * suffixed keys) break to the LARGEST shard id — struct max compares
    * (h, s) lexicographically. */
  def rendezvousShard(id: Column, nShards: Int): Column = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val scored = transform(sequence(lit(0), lit(nShards - 1)), s =>
      struct(md5(concat(id.cast("string"), lit(":"), s.cast("string"))
        .cast("binary")).as("h"), s.as("s")))
    array_max(scored).getField("s").cast("long")
  }

  /** Deterministic global shuffle + shard assignment — the training-data
    * EXPORT step: every row gets a stable `(shard, pos)` address, where
    * `shard` is the [[rendezvousShard]] bucket and `pos` is the row's
    * 1-based position within its shard under the seeded md5 shuffle
    * order. Writers then emit shard files whose internal order is the training
    * order — reproducible across reruns, resumable mid-export, and
    * changeable only by changing `seed`.
    *
    * Scale shape: the naive formulation (`row_number` partitioned by
    * shard) funnels each shard through ONE task — a 100 GB shard in one
    * sort. Here positions come from the [[graft.ingest.BinaryIngest
    * .withDenseIds]] two-pass trick instead: a RANGE shuffle on
    * `(shard, key, id)` keeps parallelism at the shuffle-partition count
    * (many partitions per shard), `zipWithIndex` assigns global offsets
    * in a lightweight second pass, and subtracting each shard's
    * broadcast `min(g)` (an nShards-row aggregate) turns global offsets
    * into per-shard positions — map-only. */
  def shuffleShard(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val keyed = df.select(col(idCol),
      rendezvousShard(col(idCol), nShards).as("shard"),
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))
        .cast("binary")).as("skey"))
    val sorted = keyed
      .repartitionByRange(col("shard"), col("skey"), col(idCol))
      .sortWithinPartitions("shard", "skey", idCol)
    val schema = StructType(sorted.schema.fields :+
      StructField("g", LongType, nullable = false))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        Row.fromSeq(r.toSeq :+ i) }, schema)
    val base = indexed.groupBy(col("shard")).agg(min(col("g")).as("g0"))
    indexed.join(broadcast(base), "shard")
      .select(col(idCol), col("shard"), (col("g") - col("g0") + 1L).as("pos"))
  }
}
