package graft.index

import graft.functions.VectorFunctions._
import org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A queryable vector index over a source table — the engine analog of the
  * reference's delta-sync Vector Search index
  * (`Nomic MultiModal Retrieval.py:315-326`).
  *
  * Semantics preserved from the reference:
  *   - the index is *derived state* over `(primaryKey, vectorCol)` of a
  *     source table (`NB:319-321`);
  *   - refresh is TRIGGERED — pull-based, on demand (`NB:318`), consuming a
  *     change watermark (Delta CDF `NB:278` emulated with a `version` long
  *     column, no Delta jars in this environment);
  *   - `build` blocks until the index is usable (`_and_wait`, `NB:315`);
  *   - queries never touch the source table, only index state (`NB:384-388`).
  *
  * Two execution modes:
  *   - exact: scored scan + `TakeOrderedAndProject` (per-partition top-k
  *     heaps, O(k) merge at the driver — no global sort, no shuffle);
  *   - approx: MLlib `BucketedRandomProjectionLSH`; on unit-norm vectors
  *     (engine invariant, `NB:209/376`) L2 buckets preserve cosine ranking.
  *
  * Scale notes (100 TB design): index state is a columnar cached projection
  * `(pk, projected cols, vector)` partitioned by pk — scoring is map-only and
  * embarrassingly parallel; the only driver traffic is k rows per partition.
  * The LSH path turns O(N) scans into bucket lookups when N is large.
  */
final class VectorIndex private (
    val name: String,
    val primaryKey: String,
    val vectorCol: String,
    val dim: Int,
    private var state: DataFrame,
    private var lshModel: Option[BucketedRandomProjectionLSHModel],
    private var syncedVersion: Long) extends Serializable {

  /** IVF cell centroids when [[buildIvf]] ran; the state then carries a
    * `cell` column (internal — excluded from default search projections). */
  private var ivfCents: Option[Array[Array[Float]]] = None

  /** PQ codebooks when [[buildPq]] ran; the state then carries a `pq_code`
    * binary column (internal, like `cell`). */
  private var pqModel: Option[graft.ops.SimilaritySearch.PqModel] = None

  /** SQ8 grid when [[buildSq]] ran; the state then carries a `sq_code`
    * binary column (internal, like `cell`/`pq_code`). */
  private var sqModel: Option[graft.ops.ScalarQuantization.SqModel] = None

  private val internalCols = Set("cell", "pq_code", "sq_code")

  /** Tombstone column on change batches ([[VectorIndex.DeletedCol]]). */
  private def DeletedCol = VectorIndex.DeletedCol

  private def defaultCols: Seq[String] =
    state.columns.filterNot(c => c == vectorCol || internalCols(c)).toSeq

  /** Current indexed row count (metadata, like the service's row count). */
  def size: Long = state.count()

  def currentVersion: Long = syncedVersion

  /** Top-k search. `queryType` mirrors the reference's (declared, disabled)
    * `query_type` parameter (`NB:386-387`):
    *   - `"ANN"` (default): cosine score (== dot on unit vectors) then
    *     `orderBy desc limit k` which Catalyst plans as
    *     TakeOrderedAndProject — per-partition heaps, no global sort;
    *   - `"HYBRID"`: keyword (BM25) + vector rankings fused with
    *     reciprocal-rank fusion, delegated to [[graft.ops.HybridSearch]];
    *     needs `queryText` and a `textCol` present in the index state;
    *     `score` is the RRF score.
    * Result shape `[pk, cols..., score]` in both modes — the service's
    * `data_array` rows (`NB:388, 416`). */
  def search(queryVec: Array[Float], k: Int = 5,
      columns: Seq[String] = Seq.empty, queryType: String = "ANN",
      queryText: String = null, textCol: String = "text"): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val cols = if (columns.isEmpty) defaultCols else columns
    val ordered = (primaryKey +: cols.filterNot(_ == primaryKey)).map(col) :+ col("score")
    queryType.toUpperCase match {
      case "ANN" =>
        state
          .withColumn("score", cosineUnit(col(vectorCol), vecLit(queryVec)))
          .orderBy(desc("score"), col(primaryKey))
          .limit(k)
          .select(ordered: _*)
      case "HYBRID" =>
        require(queryText != null, "HYBRID search requires queryText")
        require(state.columns.contains(textCol),
          s"HYBRID search requires text column '$textCol' in the index state")
        val hits = graft.ops.HybridSearch.search(state, primaryKey, textCol,
          vectorCol, queryText, queryVec, k)
          .select(col("id").as(primaryKey), col("rrf").as("score"))
        // re-attach projected columns to the k fused hits — the k-row hit
        // side broadcasts, so this is a map-side join over the state scan
        state.select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col): _*)
          .join(broadcast(hits), Seq(primaryKey))
          .orderBy(desc("score"), col(primaryKey))
          .select(ordered: _*)
      case other =>
        throw new IllegalArgumentException(
          s"queryType must be ANN or HYBRID, got $other")
    }
  }

  /** Attach an IVF (inverted-file) layout to the index: distributed
    * spherical-KMeans centroids, every indexed row assigned to its nearest
    * cell ([[graft.ops.SimilaritySearch.ivfBuildKMeans]]). After this,
    * [[searchIvf]] probes cells; later [[upsert]]s assign incoming rows to
    * the FIXED centroid set (standard IVF maintenance — re-run `buildIvf`
    * to refit drifted centroids).
    *
    * Unspecified `nCells` is DERIVED FROM THE INDEXED ROW COUNT
    * ([[graft.ops.SimilaritySearch.operatingPoint]]) — the reference's
    * own data-derived principle (`NB:322` derives the index dimension
    * from the data) applied to the index geometry. A fixed default is a
    * measured scale trap: RECALL_sf1 recorded the old 16-cell constant
    * collapsing to ~0.25 recall on a 2M-row corpus, while the derived
    * point holds >= 0.98. Pass an explicit value to override. */
  def buildIvf(nCells: Int = -1, maxIter: Int = 5,
      seed: Long = 42L): this.type = synchronized {
    val (indexed, cents) = graft.ops.SimilaritySearch.ivfBuildKMeans(
      state.drop("cell"), primaryKey, vectorCol, nCells, maxIter, seed)
    ivfCents = Some(cents)
    swapState(indexed)
    this
  }

  /** Cell count of the IVF layout, when [[buildIvf]] ran — index metadata
    * (lets callers see the geometry a derived-default build chose). */
  def ivfCells: Option[Int] = ivfCents.map(_.length)

  /** IVF cell-pruned top-k: scores only the `nProbe` cells closest to the
    * query — the scale ANN path (scan ~nProbe/nCells of the corpus).
    * `nProbe >= nCells` provably equals exact [[search]]. Unspecified
    * `nProbe` derives the constant ~12.5% probe-mass fraction from the
    * built cell count ([[graft.ops.SimilaritySearch.probeFor]]) — the
    * fraction the recall floor transfers across scales at. */
  def searchIvf(queryVec: Array[Float], k: Int = 5, nProbe: Int = -1,
      columns: Seq[String] = Seq.empty): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val cents = ivfCents.getOrElse(
      throw new IllegalStateException(s"index $name has no IVF layout; run buildIvf"))
    val cols = if (columns.isEmpty) defaultCols else columns
    graft.ops.SimilaritySearch.ivfSearch(state, cents, primaryKey,
        vectorCol, queryVec, k, nProbe)
      .select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col) :+ col("score"): _*)
  }

  /** IVF-routed late-interaction retrieval over a MULTI-VECTOR corpus:
    * index rows are chunk vectors, `docCol` groups them into documents,
    * and the result is the top-k docs by MaxSim (max chunk score). Same
    * cell pruning as [[searchIvf]], applied per chunk vector before the
    * group-max ([[graft.ops.SimilaritySearch.maxSimSearch]]); `nProbe >=
    * nCells` provably equals the exact group-max. */
  def searchMaxSim(queryVec: Array[Float], docCol: String, k: Int = 5,
      nProbe: Int = -1): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val cents = ivfCents.getOrElse(
      throw new IllegalStateException(s"index $name has no IVF layout; run buildIvf"))
    require(state.columns.contains(docCol),
      s"searchMaxSim needs doc column '$docCol' in the index state")
    graft.ops.SimilaritySearch.maxSimSearch(state, cents, docCol,
      vectorCol, queryVec, k, nProbe)
  }

  /** Attach a product-quantization layout: train codebooks on the indexed
    * vectors ([[graft.ops.SimilaritySearch.pqTrain]]) and materialize the
    * M-byte `pq_code` per row. [[searchPq]] then runs the compressed
    * two-stage scan; later [[upsert]]s encode incoming rows against the
    * FIXED codebooks (standard PQ maintenance — re-run `buildPq` to refit
    * after heavy drift). */
  def buildPq(m: Int = 16, ksub: Int = 32, seed: Long = 42L): this.type =
    synchronized {
      val model = graft.ops.SimilaritySearch.pqTrain(
        state, vectorCol, m = m, ksub = ksub, seed = seed)
      pqModel = Some(model)
      swapState(graft.ops.SimilaritySearch.pqEncode(
        state.drop("pq_code"), vectorCol, model))
      this
    }

  /** PQ two-stage top-k: ADC scan over the M-byte codes picks `k * refine`
    * candidates, exact re-rank follows on just those rows — the scan
    * working set is the code column, not the vectors. With `refine` deep
    * enough that candidates cover the true top-k this equals exact
    * [[search]] (spec-verified on the fixture). */
  def searchPq(queryVec: Array[Float], k: Int = 5, refine: Int = -1,
      columns: Seq[String] = Seq.empty): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val model = pqModel.getOrElse(
      throw new IllegalStateException(s"index $name has no PQ layout; run buildPq"))
    val cols = if (columns.isEmpty) defaultCols else columns
    graft.ops.SimilaritySearch.pqSearch(
        state.select(col(primaryKey), col("pq_code")), model, primaryKey,
        queryVec, k, refine, exactSource = Some((state, vectorCol)))
      .select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col)
        :+ col("score"): _*)
  }

  /** IVFADC top-k — IVF cell pruning composed with the PQ ADC scan
    * ([[graft.ops.SimilaritySearch.ivfPqSearch]]; Jégou et al. 2011 §IV).
    * Needs BOTH [[buildIvf]] and [[buildPq]]. Probes the `nProbe` nearest
    * cells, ADC-scans only their M-byte codes, exact re-ranks the bounded
    * candidate set — the 100 TB serving shape: scan working set
    * ~(nProbe/nCells)·m bytes per row. Full probe + deep refine provably
    * equals exact [[search]] (spec-verified). The compressed-scan payoff
    * needs a columnar state source: serve from a [[save]]d+[[VectorIndex.load]]ed
    * index (parquet-backed cache prunes the vector column out of the ADC
    * scan — PlanShapeSpec-guarded); an in-session build keeps state on a
    * row-based localCheckpoint RDD, which always deserializes whole rows. */
  def searchIvfPq(queryVec: Array[Float], k: Int = 5, nProbe: Int = -1,
      refine: Int = -1, columns: Seq[String] = Seq.empty): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val cents = ivfCents.getOrElse(
      throw new IllegalStateException(s"index $name has no IVF layout; run buildIvf"))
    val model = pqModel.getOrElse(
      throw new IllegalStateException(s"index $name has no PQ layout; run buildPq"))
    val cols = if (columns.isEmpty) defaultCols else columns
    graft.ops.SimilaritySearch.ivfPqSearch(
        state.select(col(primaryKey), col("cell"), col("pq_code")),
        cents, model, primaryKey, queryVec, k, nProbe, refine,
        exactSource = Some((state, vectorCol)))
      .select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col)
        :+ col("score"): _*)
  }

  /** Attach a scalar-quantization (SQ8) layout: one-pass per-dimension
    * min/max grid ([[graft.ops.ScalarQuantization.sqTrain]]) and the
    * dim-byte `sq_code` per row — the 4x-compressed near-lossless point
    * between raw floats and PQ's M-byte codes. Deterministic (no seed, no
    * iteration); later [[upsert]]s encode incoming rows against the FIXED
    * grid (an out-of-range outlier clamps to the grid edge — re-run
    * `buildSq` when the corpus distribution drifts). */
  def buildSq(): this.type = synchronized {
    val model = graft.ops.ScalarQuantization.sqTrain(state, vectorCol)
    sqModel = Some(model)
    swapState(graft.ops.ScalarQuantization.sqEncode(
      state.drop("sq_code"), vectorCol, model))
    this
  }

  /** SQ8 two-stage top-k: fused-multiply-add ADC scan over the dim-byte
    * codes picks `k * refine` candidates, exact re-rank follows. SQ8's
    * distortion is low enough that `refine = 2` recovers exact [[search]]
    * on the fixture (spec-verified) where PQ needs 16. */
  def searchSq(queryVec: Array[Float], k: Int = 5, refine: Int = -1,
      columns: Seq[String] = Seq.empty): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val model = sqModel.getOrElse(
      throw new IllegalStateException(s"index $name has no SQ layout; run buildSq"))
    val cols = if (columns.isEmpty) defaultCols else columns
    graft.ops.ScalarQuantization.sqSearch(
        state.select(col(primaryKey), col("sq_code")), model, primaryKey,
        queryVec, k, refine, exactSource = Some((state, vectorCol)))
      .select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col)
        :+ col("score"): _*)
  }

  /** IVF-SQ top-k — IVF cell pruning composed with the SQ8 FMA scan
    * ([[graft.ops.ScalarQuantization.ivfSqSearch]]). Needs BOTH
    * [[buildIvf]] and [[buildSq]]. The scalar sibling of [[searchIvfPq]]:
    * dim bytes per scanned row instead of m, but near-lossless, so the
    * default `refine = 2` recovers exact [[search]] where PQ needs 16
    * (spec-verified; q87 oracles the composition). Same columnar-source
    * caveat as [[searchIvfPq]]: the compressed-scan payoff needs a
    * [[save]]d+[[VectorIndex.load]]ed index. */
  def searchIvfSq(queryVec: Array[Float], k: Int = 5, nProbe: Int = -1,
      refine: Int = -1, columns: Seq[String] = Seq.empty): DataFrame = {
    require(queryVec.length == dim, s"query dim ${queryVec.length} != $dim")
    val cents = ivfCents.getOrElse(
      throw new IllegalStateException(s"index $name has no IVF layout; run buildIvf"))
    val model = sqModel.getOrElse(
      throw new IllegalStateException(s"index $name has no SQ layout; run buildSq"))
    val cols = if (columns.isEmpty) defaultCols else columns
    graft.ops.ScalarQuantization.ivfSqSearch(
        state.select(col(primaryKey), col("cell"), col("sq_code")),
        cents, model, primaryKey, queryVec, k, nProbe, refine,
        exactSource = Some((state, vectorCol)))
      .select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col)
        :+ col("score"): _*)
  }

  /** Approximate top-k via LSH bucket probing. */
  def searchApprox(queryVec: Array[Float], k: Int = 5,
      columns: Seq[String] = Seq.empty): DataFrame = {
    val model = lshModel.getOrElse(
      throw new IllegalStateException(s"index $name built without LSH"))
    val withVec = state.withColumn("__vec", array_to_vector(
      transform(col(vectorCol), x => x.cast("double"))))
    val q = org.apache.spark.ml.linalg.Vectors.dense(queryVec.map(_.toDouble))
    val hits = model.approxNearestNeighbors(withVec, q, k).toDF()
    val cols = if (columns.isEmpty) defaultCols else columns
    hits
      .withColumn("score", lit(1.0) - pow(col("distCol"), 2) / 2.0) // unit vecs: cos = 1 - d^2/2
      .select((primaryKey +: cols.filterNot(_ == primaryKey)).map(col) :+ col("score"): _*)
  }

  /** Positional rows `[pk, cols..., score]` — parity with the reference's
    * `results['result']['data_array']` (`NB:416`). Driver-side endpoint. */
  def dataArray(queryVec: Array[Float], k: Int = 5,
      columns: Seq[String] = Seq.empty): Seq[Seq[Any]] =
    search(queryVec, k, columns).collect().toSeq.map(_.toSeq)

  /** TRIGGERED refresh (`NB:318`): re-read rows with `version` beyond the
    * watermark and merge into index state; falls back to full rebuild when
    * the source has no version column (always correct under TRIGGERED
    * semantics). The change feed may carry DELETE events — the CDF the
    * emulation mirrors (`NB:278`) does — as rows with `_deleted = true`
    * (the tombstone convention shared with [[upsert]]); a deleted pk
    * leaves the index on the same incremental pass that would have
    * upserted it, instead of serving stale until a full rebuild. */
  def refresh(source: DataFrame): this.type = synchronized {
    val hasVersion = source.columns.contains("version")
    // the source never carries the internal `cell`/`pq_code` columns — full
    // rebuilds re-assign them against the fixed centroids/codebooks; the
    // upsert path assigns per incoming batch
    val srcCols = state.columns.filterNot(internalCols).toSeq
    if (!hasVersion) {
      val live =
        if (source.columns.contains(DeletedCol)) source.filter(!col(DeletedCol))
        else source
      val base = live.select(srcCols.map(col): _*)
      swapState(withLayoutCols(base))
    } else {
      // upsert only rows changed since the watermark (version kept so
      // upsert picks the latest row per pk; the tombstone flag kept so
      // upsert can drop deleted pks)
      val carried = if (source.columns.contains(DeletedCol))
        srcCols :+ "version" :+ DeletedCol else srcCols :+ "version"
      upsert(source.filter(col("version") > syncedVersion)
        .select(carried.distinct.map(col): _*))
      syncedVersion = source.agg(max(col("version"))).head().getLong(0)
    }
    this
  }

  /** Upsert a batch of rows by primary key — the unit of incremental sync
    * (each CDF micro-batch lands here, see [[graft.streaming.IndexSync]]).
    * A batch may carry several rows for one pk (multiple versions in one
    * micro-batch): only one survives — the highest `version` when the batch
    * has that column, otherwise an arbitrary single row. A surviving row
    * with `_deleted = true` is a tombstone: the pk is REMOVED from index
    * state (CDF delete-event semantics) — an earlier-versioned insert in
    * the same batch loses to it, and a later-versioned re-insert wins
    * over it, both by the same latest-version rule. */
  def upsert(changed: DataFrame): this.type = synchronized {
    val stateCols = state.columns.toSeq
    val latest =
      if (changed.columns.contains("version")) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(primaryKey)).orderBy(desc("version"))
        changed.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
      } else changed.dropDuplicates(primaryKey)
    // tombstones participate in the anti-join (every changed pk leaves the
    // old state) but not in the union (deleted pks are not re-added)
    val live = if (latest.columns.contains(DeletedCol))
      latest.filter(!coalesce(col(DeletedCol), lit(false))) else latest
    // IVF/PQ maintenance: incoming rows get cell + code assigned against
    // the FIXED centroids/codebooks (re-run buildIvf/buildPq to refit
    // after heavy drift)
    val c = withLayoutCols(live).select(stateCols.map(col): _*)
    swapState(
      state.join(latest.select(primaryKey), Seq(primaryKey), "left_anti")
        .unionByName(c))
    this
  }

  /** Persist index state as parquet AND the fitted LSH model when present
    * (the service's durable index analog); reload with [[VectorIndex.load]].
    * Persisting the model matters: a refit would draw a fresh random hash
    * family and silently change `searchApprox` results across the
    * save/load cycle — the reference's durable service index never does
    * that. */
  def save(path: String): Unit = {
    state.write.mode("overwrite").parquet(s"$path/state")
    lshModel.foreach(_.write.overwrite().save(s"$path/lsh"))
    // IVF centroids persist with the index (same durability contract as
    // the LSH model: reload must NOT change search results)
    ivfCents.foreach { cents =>
      val spark = state.sparkSession
      import spark.implicits._
      cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/ivf")
    }
    // PQ codebooks likewise: a refit would re-randomize the Lloyd init and
    // silently change searchPq candidate sets across reload
    pqModel.foreach { model =>
      val spark = state.sparkSession
      import spark.implicits._
      model.codebooks.zipWithIndex.toSeq.flatMap { case (book, sub) =>
        book.zipWithIndex.map { case (cw, k) => (sub, k, cw.toSeq) }
      }.toDF("sub", "k", "codeword")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/pq")
    }
    // SQ grid: train is deterministic over the SAME corpus, but the saved
    // state may be a subset/superset of a future source — the grid must
    // travel with the codes it produced
    sqModel.foreach { model =>
      val spark = state.sparkSession
      import spark.implicits._
      Seq((model.mins.toSeq, model.steps.toSeq)).toDF("mins", "steps")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/sq")
    }
  }

  /** (Re-)derive the internal layout columns a row set is missing: IVF
    * `cell` against the fixed centroids, PQ `pq_code` against the fixed
    * codebooks. */
  private def withLayoutCols(df: DataFrame): DataFrame = {
    val celled = ivfCents match {
      case Some(cents) if !df.columns.contains("cell") =>
        df.withColumn("cell",
          graft.expressions.VectorExpressions.nearestCentroid(col(vectorCol), cents))
      case _ => df
    }
    val coded = pqModel match {
      case Some(model) if !celled.columns.contains("pq_code") =>
        graft.ops.SimilaritySearch.pqEncode(celled, vectorCol, model)
      case _ => celled
    }
    sqModel match {
      case Some(model) if !coded.columns.contains("sq_code") =>
        graft.ops.ScalarQuantization.sqEncode(coded, vectorCol, model)
      case _ => coded
    }
  }

  private def swapState(next: DataFrame): Unit = {
    val old = state
    state = graft.Graft.materialize(next) // cut lineage: repeated
    // upserts otherwise stack anti-join plans unboundedly
    old.unpersist()
  }
}

object VectorIndex {

  /** Tombstone convention for the CDF emulation: a change row with this
    * boolean column true is a DELETE event for its pk (Delta CDF's
    * `_change_type = 'delete'` analog — `NB:278`). Consumed by
    * [[VectorIndex.refresh]] / [[VectorIndex.upsert]]; never part of
    * index state. */
  val DeletedCol = "_deleted"

  /** Build an index from a source table — `create_delta_sync_index_and_wait`
    * parity (`NB:315-323`): eager materialization, dimension data-derived
    * (`NB:322`) when `dim <= 0`. */
  def build(source: DataFrame, name: String, primaryKey: String,
      vectorCol: String, dim: Int = -1, withLsh: Boolean = false,
      projected: Seq[String] = Seq.empty): VectorIndex = {
    val src = if (source.columns.contains(DeletedCol))
      source.filter(!coalesce(col(DeletedCol), lit(false))).drop(DeletedCol)
    else source
    val cols = if (projected.isEmpty)
      src.columns.filterNot(_ == "version").toSeq
    else (primaryKey +: projected :+ vectorCol).distinct
    val state = src.select(cols.map(col): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val d =
      if (dim > 0) dim
      else state.select(size(col(vectorCol))).head().getInt(0) // NB:322
    state.count() // _and_wait

    val lsh = if (withLsh) Some(fitLsh(state, vectorCol)) else None

    val version = if (source.columns.contains("version"))
      source.agg(max(col("version"))).head().getLong(0) else 0L
    val idx = new VectorIndex(name, primaryKey, vectorCol, d, state, lsh, version)
    VectorIndexCatalog.register(idx)
    idx
  }

  private def fitLsh(state: DataFrame,
      vectorCol: String): BucketedRandomProjectionLSHModel = {
    val withVec = state.withColumn("__vec", array_to_vector(
      transform(col(vectorCol), x => x.cast("double"))))
    new BucketedRandomProjectionLSH()
      .setInputCol("__vec").setOutputCol("__hashes")
      .setBucketLength(2.0).setNumHashTables(3)
      .fit(withVec)
  }

  /** Rebuild an index from a dump written by [[VectorIndex.save]]. The
    * persisted LSH model (same hash family -> identical `searchApprox`
    * results) is restored when present; a legacy state-only dump falls back
    * to a fresh fit with a warning-worthy caveat documented on `save`. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String, name: String,
      primaryKey: String, vectorCol: String, withLsh: Boolean = false): VectorIndex = {
    val hconf = spark.sparkContext.hadoopConfiguration
    def exists(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).exists(hp)
    }
    // legacy dumps stored the state parquet at the root
    val statePath = if (exists(s"$path/state")) s"$path/state" else path
    val idx = build(spark.read.parquet(statePath), name, primaryKey, vectorCol)
    if (withLsh) {
      idx.lshModel =
        if (exists(s"$path/lsh"))
          Some(BucketedRandomProjectionLSHModel.load(s"$path/lsh"))
        else Some(fitLsh(idx.state, vectorCol))
    }
    if (exists(s"$path/ivf")) {
      idx.ivfCents = Some(spark.read.parquet(s"$path/ivf")
        .orderBy("cell").collect()
        .map(_.getSeq[Float](1).toArray)) // k centroid rows only
    }
    if (exists(s"$path/pq")) {
      // m*ksub codeword rows only — the state already carries pq_code
      val rows = spark.read.parquet(s"$path/pq").orderBy("sub", "k").collect()
      idx.pqModel = Some(graft.ops.SimilaritySearch.PqModel(
        rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map(_._2
          .sortBy(_.getInt(1)).map(_.getSeq[Float](2).toArray)).toArray))
    }
    if (exists(s"$path/sq")) {
      val r = spark.read.parquet(s"$path/sq")
        .select("mins", "steps").head() // one grid row
      idx.sqModel = Some(graft.ops.ScalarQuantization.SqModel(
        r.getSeq[Float](0).toArray, r.getSeq[Float](1).toArray))
    }
    idx
  }
}

/** Name -> index registry — `vs_client.get_index` parity (`NB:384`). */
object VectorIndexCatalog {
  private val indexes = scala.collection.concurrent.TrieMap.empty[String, VectorIndex]
  def register(idx: VectorIndex): Unit = indexes.put(idx.name, idx)
  def get(name: String): VectorIndex = indexes.getOrElse(name,
    throw new NoSuchElementException(s"no vector index named $name"))
  def drop(name: String): Unit = indexes.remove(name)
  def list: Seq[String] = indexes.keys.toSeq.sorted
}
