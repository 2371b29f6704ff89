package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns.
  *
  * Two mirrored surfaces:
  *   1. Column-level (`aggregate`/`zip_with`/`transform` higher-order
  *      functions) — stays inside Catalyst, no UDF serialization, and the
  *      double-accumulator left-fold order is fixed so results are bit-stable
  *      against the DuckDB oracle.
  *   2. Pure `Array[Float]` Scala — used executor-side by the embedder
  *      (mapPartitions hot path) and by unit/property tests.
  *
  * Semantics mirror the reference pipeline (reference `Nomic MultiModal
  * Retrieval.py:202-213, 364-378`): masked mean-pool -> layer-norm ->
  * L2-normalize; unit-norm vectors make cosine and L2 rank-equivalent
  * (`NB:209, 376`).
  */
object VectorFunctions {

  // ---------------------------------------------------------------- Column

  /** Sum of elements, double accumulator, left-to-right (bit-stable). */
  def vecSum(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x.cast("double"))

  /** Dot product; elements widened to double before multiply so the result
    * is bit-identical to `list_dot_product(CAST(a AS DOUBLE[]), ...)`.
    * Backed by the codegen'd [[graft.expressions.VecDot]] (the interpreted
    * HOF equivalent is `aggregate(zip_with(...))` — ~40x slower on
    * similarity-join hot paths). */
  def vecDot(a: Column, b: Column): Column =
    graft.expressions.VectorExpressions.vecDot(a, b)

  /** L2 norm. */
  def vecNorm(v: Column): Column = sqrt(vecDot(v, v))

  /** Cosine similarity for arbitrary vectors. */
  def cosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Cosine for unit-norm vectors (the engine invariant): just the dot. */
  def cosineUnit(a: Column, b: Column): Column = vecDot(a, b)

  /** Euclidean distance. */
  def l2Dist(a: Column, b: Column): Column = {
    val sq = zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    })
    sqrt(aggregate(sq, lit(0.0), (acc, x) => acc + x))
  }

  /** Scale to unit L2 norm (`NB:209, 376` — F.normalize(p=2)). */
  def l2Normalize(v: Column): Column = {
    val n = vecNorm(v)
    transform(v, x => x.cast("double") / n)
  }

  /** Layer norm across the vector's own elements (`NB:375`). */
  def layerNorm(v: Column, eps: Double = 1e-5): Column = {
    val n = size(v).cast("double")
    val mean = vecSum(v) / n
    val variance = aggregate(v, lit(0.0), (acc, x) => {
      val d = x.cast("double") - mean; acc + d * d
    }) / n
    transform(v, x => (x.cast("double") - mean) / sqrt(variance + lit(eps)))
  }

  /** Element-wise mean of an array-of-vectors column (mean-pool, `NB:364-367`
    * with an all-ones mask; the masked variant lives in the embedder). */
  def meanPool(vectors: Column): Column = {
    val n = size(vectors).cast("double")
    val sums = aggregate(
      vectors,
      array().cast("array<double>"),
      (acc, row) =>
        when(size(acc) === 0, transform(row, x => x.cast("double")))
          .otherwise(zip_with(acc, row, (a, x) => a + x.cast("double"))))
    transform(sums, s => s / n)
  }

  /** Literal query vector as a Column (broadcast scalar, never persisted —
    * `NB:26`). */
  def vecLit(v: Array[Float]): Column =
    array(v.map(x => lit(x.toDouble)): _*)

  // ----------------------------------------------------------------- Scala

  /** Left-fold dot with double accumulator — same order as the Column path. */
  def dot(a: Array[Float], b: Array[Float]): Double = {
    require(a.length == b.length, s"dim mismatch ${a.length} != ${b.length}")
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = norm(a) * norm(b)
    if (n == 0.0) 0.0 else dot(a, b) / n
  }

  def l2Dist(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
    }
    math.sqrt(s)
  }

  def l2Normalize(a: Array[Float]): Array[Float] = {
    val n = norm(a)
    if (n == 0.0) a.clone()
    else {
      val out = new Array[Float](a.length)
      var i = 0
      while (i < a.length) { out(i) = (a(i) / n).toFloat; i += 1 }
      out
    }
  }

  def layerNorm(a: Array[Float]): Array[Float] = layerNorm(a, 1e-5)

  def layerNorm(a: Array[Float], eps: Double): Array[Float] = {
    val n = a.length
    var mean = 0.0; var i = 0
    while (i < n) { mean += a(i); i += 1 }
    mean /= n
    var variance = 0.0; i = 0
    while (i < n) { val d = a(i) - mean; variance += d * d; i += 1 }
    variance /= n
    val inv = 1.0 / math.sqrt(variance + eps)
    val out = new Array[Float](n)
    i = 0
    while (i < n) { out(i) = ((a(i) - mean) * inv).toFloat; i += 1 }
    out
  }

  /** Masked mean-pool over token vectors (`NB:364-367`): weighted average by
    * attention mask with clamped denominator. */
  def maskedMeanPool(tokens: Array[Array[Float]], mask: Array[Int]): Array[Float] = {
    require(tokens.length == mask.length)
    val dim = if (tokens.isEmpty) 0 else tokens(0).length
    val out = new Array[Float](dim)
    var denom = 0.0
    var t = 0
    while (t < tokens.length) {
      if (mask(t) != 0) {
        denom += mask(t)
        var i = 0
        while (i < dim) { out(i) += tokens(t)(i) * mask(t); i += 1 }
      }
      t += 1
    }
    val d = math.max(denom, 1e-9)
    var i = 0
    while (i < dim) { out(i) = (out(i) / d).toFloat; i += 1 }
    out
  }
}
