package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{cosineUnit, vecLit}

/** Scalar quantization (SQ8) for the vector-search family: one byte per
  * dimension on a per-dimension [min, max] grid. The middle point on the
  * compression/recall curve the engine now covers end to end:
  *
  *   - raw floats (dim * 4 B/row)  — exact, [[SimilaritySearch.topK]];
  *   - SQ8        (dim * 1 B/row)  — 4x smaller scan, near-lossless ADC;
  *   - PQ         (m B/row)        — 16x+ smaller, coarse ADC + refine.
  *
  * At 100 TB the scan working set is the cost driver, and SQ8 buys the 4x
  * with distortion bounded by step/2 per dimension — on unit-norm
  * embeddings that keeps ADC ranking agreeing with exact ranking far
  * deeper than PQ's subspace codebooks, so the exact re-rank can use a
  * much shallower `refine`. Train is ONE `treeAggregate` pass (elementwise
  * min/max — 2·dim floats to the driver, nothing else); there is no
  * iteration, which also makes the model deterministic with no seed.
  *
  * The reference's managed index (auschoi96 NB:315-323) exposes no
  * quantization knob; this is the §2.4 scale surface, same family as
  * [[SimilaritySearch.pqTrain]].
  */
object ScalarQuantization {

  /** Per-dimension grid: `code = round((x - min) / step)`, step =
    * (max - min) / 255. A constant dimension has step 0 and is lossless. */
  case class SqModel(mins: Array[Float], steps: Array[Float]) {
    require(mins.length == steps.length, "sq model: mins/steps mismatch")
    def dim: Int = mins.length

    /** Driver-side per-query ADC factors: `score = bias + sum scaled_i *
      * code_i` equals the dot product against the dequantized vector. */
    def queryFactors(query: Array[Float]): (Array[Double], Double) = {
      require(query.length == dim,
        s"sq queryFactors: query dim ${query.length} != model dim $dim")
      val scaled = new Array[Double](dim)
      var bias = 0.0
      var i = 0
      while (i < dim) {
        scaled(i) = query(i).toDouble * steps(i)
        bias += query(i).toDouble * mins(i)
        i += 1
      }
      (scaled, bias)
    }
  }

  /** Fit the grid: one distributed elementwise min/max pass over the full
    * corpus (no sampling — extremes are exactly what a grid must see; a
    * sampled max would clip outliers to the grid edge). Only 2·dim floats
    * visit the driver. */
  def sqTrain(corpus: DataFrame, vecCol: String): SqModel = {
    val dimRow = corpus.select(size(col(vecCol))).head()
    val dim = dimRow.getInt(0)
    require(dim > 0, "sqTrain: empty vectors")
    val (mins, maxs) = corpus.select(col(vecCol)).rdd
      .map(_.getSeq[Float](0).toArray)
      .treeAggregate(
        (Array.fill(dim)(Float.PositiveInfinity),
          Array.fill(dim)(Float.NegativeInfinity)))(
        seqOp = { case ((lo, hi), v) =>
          if (v.length != dim) throw new IllegalArgumentException(
            s"sqTrain: ragged corpus — vector dim ${v.length} != $dim")
          var i = 0
          while (i < dim) {
            if (v(i) < lo(i)) lo(i) = v(i)
            if (v(i) > hi(i)) hi(i) = v(i)
            i += 1
          }
          (lo, hi)
        },
        combOp = { case ((lo1, hi1), (lo2, hi2)) =>
          var i = 0
          while (i < dim) {
            if (lo2(i) < lo1(i)) lo1(i) = lo2(i)
            if (hi2(i) > hi1(i)) hi1(i) = hi2(i)
            i += 1
          }
          (lo1, hi1)
        })
    val steps = Array.tabulate(dim)(i => (maxs(i) - mins(i)) / 255f)
    SqModel(mins, steps)
  }

  /** Attach the dim-byte SQ code (`sq_code`, binary). As with PQ, the point
    * is that a production corpus persists `(pk, sq_code)` without the raw
    * vector. */
  def sqEncode(corpus: DataFrame, vecCol: String, model: SqModel): DataFrame =
    corpus.withColumn("sq_code",
      graft.expressions.VectorExpressions.sqEncode(col(vecCol),
        model.mins, model.steps))

  /** IVF-SQ — IVF cell pruning composed with the SQ8 ADC scan, the scalar
    * sibling of [[SimilaritySearch.ivfPqSearch]] (the Faiss
    * `IVF<n>,SQ8` factory point on the same curve): probe the `nProbe`
    * cells nearest the query, FMA-scan ONLY their dim-byte codes, exact
    * re-rank the bounded candidate set. Per scanned row this reads dim
    * bytes instead of PQ's m — less compression — but the near-lossless
    * grid keeps `refine = 2` sufficient where PQ needs 16, so the refine
    * stage touches 8x fewer raw vectors. At 100 TB pick by corpus width:
    * SQ when the scan budget affords dim B/row, PQ/IVFADC below that.
    * `nProbe >= nCells` with the default refine provably equals exact
    * search on the fixture (spec + q87 oracle). `indexed` must carry
    * `cell` AND `sq_code`. */
  def ivfSqSearch(indexed: DataFrame, centroids: Array[Array[Float]],
      model: SqModel, pk: String, query: Array[Float], k: Int,
      nProbe: Int = -1, refine: Int = -1,
      exactSource: Option[(DataFrame, String)] = None): DataFrame = {
    import graft.functions.VectorFunctions.dot
    val probeCells = centroids.indices
      .sortBy(i => -dot(query, centroids(i)))
      .take(SimilaritySearch.resolveProbe(nProbe, centroids.length))
    sqSearch(
      indexed.filter(col("cell").isin(probeCells: _*))
        .select(col(pk), col("sq_code")),
      model, pk, query, k, refine, exactSource)
  }

  /** Two-stage SQ search, shaped exactly like
    * [[SimilaritySearch.pqSearch]]: (1) fused-multiply-add ADC scan over
    * the byte codes, `TakeOrderedAndProject` keeps `k * refine`
    * candidates; (2) exact re-rank via a broadcast pk lookup against
    * `exactSource`. SQ8's distortion is so low that `refine = 2` already
    * covers the true top-k in practice (spec pins equality on the
    * fixture); `exactSource = None` returns ADC scores directly. */
  def sqSearch(encoded: DataFrame, model: SqModel, pk: String,
      query: Array[Float], k: Int, refine: Int = -1,
      exactSource: Option[(DataFrame, String)] = None): DataFrame = {
    val rf = SimilaritySearch.resolveRefine(refine,
      SimilaritySearch.SqRefineCertified)
    val (scaled, bias) = model.queryFactors(query)
    val candidates = encoded
      .withColumn("adc_score",
        graft.expressions.VectorExpressions.sqAdcDot(col("sq_code"),
          scaled, bias))
      .orderBy(desc("adc_score"), col(pk))
      .limit(k * rf)
    exactSource match {
      case None => candidates.drop("sq_code").limit(k)
      case Some((source, vecCol)) =>
        val cand = broadcast(candidates.select(col(pk)))
        source.join(cand, pk)
          .withColumn("score", cosineUnit(col(vecCol), vecLit(query)))
          .orderBy(desc("score"), col(pk))
          .limit(k)
          .drop(vecCol)
    }
  }
}
