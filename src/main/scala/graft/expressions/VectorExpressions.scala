package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The higher-order-function formulations (`aggregate`/`zip_with`) are
  * correct but interpreted — on an M x N similarity join they dominate
  * runtime. These expressions generate tight Java loops inside whole-stage
  * codegen. Semantics are identical: double accumulator, left-to-right
  * fold (bit-stable vs the DuckDB oracle's `list_dot_product` on DOUBLE[]).
  */

/** Dot product of two float/double array columns as a double. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"vec_dot needs array<float|double> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = VecDot.checkedDim(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh names: fixed locals collide with enclosing generated code
      // (janino "Redefinition of local variable")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val get = (v: String, t: DataType) => t match {
        case FloatType => s"(double)$v.getFloat($i)"
        case _ => s"$v.getDouble($i)"
      }
      s"""
         |int $n = graft.expressions.VecDot.checkedDim(
         |  $a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${get(a, elemType(left))} * ${get(b, elemType(right))};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Dimension check shared by eval and generated code — silently scoring a
    * truncated prefix on malformed data would produce plausible-but-wrong
    * similarities; fail loudly instead (matches VectorFunctions.dot). */
  def checkedDim(a: Int, b: Int): Int = {
    if (a != b) throw new IllegalArgumentException(
      s"vec_dot: dimension mismatch $a != $b")
    a
  }
}

/** Count of common elements between two ASC-sorted string arrays (linear
  * merge). With distinct sorted shingle sets this gives exact Jaccard as
  * `common / (|a| + |b| - common)` without building intersection arrays. */
/** Shared core of [[RandomProject]]: the deterministic ±1 projection
  * matrix entries and the projection loop, called by the interpreted
  * eval, the generated code, AND the golden oracle's driver-side replay
  * (same primitive, independent code path). */
object ProjectionCore {
  /** ±1 entry of the implicit projection matrix at (input dim i, output
    * dim j) under `seed` — splitmix-mixed, never materialized. */
  def sign(seed: Long, i: Int, j: Int): Double = {
    val h = SketchHash.mix(seed + i * 0x9e3779b97f4a7c15L +
      j * 0xc2b2ae3d27d4eb4fL)
    if (h >= 0L) 1.0 else -1.0
  }

  /** Plain-array twin for driver-side use (golden replay, tests). */
  def project(v: Array[Float], outDim: Int, seed: Long): Array[Float] = {
    val out = new Array[Float](outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < v.length) { s += v(i).toDouble * sign(seed, i, j); i += 1 }
      out(j) = (s * scale).toFloat
      j += 1
    }
    out
  }

  def project(arr: ArrayData, isFloat: Boolean, outDim: Int,
      seed: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Float](outDim)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        s += x * sign(seed, i, j)
        i += 1
      }
      out(j) = (s * scale).toFloat
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Johnson-Lindenstrauss random sign projection (Achlioptas 2003): map a
  * vector to `outDim` dimensions via an implicit ±1 matrix derived from a
  * seed — dot products and norms are preserved in expectation with
  * distortion ~ sqrt(log n / outDim), so a 1024-dim embedding column
  * shrinks 64x before an ANN index build or a pairwise stage, with NO
  * training pass (the matrix is hash-derived, never materialized or
  * broadcast — the projection of 100 TB of vectors is map-only and every
  * executor agrees on the matrix by construction). The sketch sibling of
  * the TRAINED reductions (PQ/SQ learn from data; JL needs none). */
case class RandomProject(child: Expression, outDim: Int, seed: Long)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(outDim > 0, s"random_project: outDim must be positive, got $outDim")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"random_project needs array<float|double>, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  private def isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    ProjectionCore.project(input.asInstanceOf[ArrayData], isFloat, outDim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.ProjectionCore.project($a, " +
        s"$isFloat, $outDim, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression): RandomProject =
    copy(child = newChild)
  override def prettyName: String = "random_project"
}

case class SortedCountCommon(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sorted_count_common needs array<string> or array<bigint> inputs " +
            "(same type on both sides)")
    }

  override def dataType: DataType = IntegerType

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    if (isLong) {
      while (i < x.numElements() && j < y.numElements()) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
    } else {
      while (i < x.numElements() && j < y.numElements()) {
        // binaryCompare, NOT compareTo: this Spark build's compareTo calls
        // SparkEnvUtils.isTesting (a System.getenv per comparison!) — on a
        // multi-million-pair merge that env lookup dominated the whole query
        val cmp = x.getUTF8String(i).binaryCompare(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val an = ctx.freshName("an"); val bn = ctx.freshName("bn")
      val step =
        if (isLong) {
          val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
          s"""
             |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
             |  if ($xv == $yv) { $c++; $i++; $j++; }
             |  else if ($xv < $yv) { $i++; }
             |  else { $j++; }
           """.stripMargin
        } else {
          s"""
             |  int $cmp = $a.getUTF8String($i).binaryCompare($b.getUTF8String($j));
             |  if ($cmp == 0) { $c++; $i++; $j++; }
             |  else if ($cmp < 0) { $i++; }
             |  else { $j++; }
           """.stripMargin
        }
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |int $an = $a.numElements(), $bn = $b.numElements();
         |while ($i < $an && $j < $bn) {
         |$step
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedCountCommon =
    copy(left = newLeft, right = newRight)
}

/** Index of the centroid with the highest dot product against the input
  * vector (IVF cell assignment). The centroid matrix rides into generated
  * code as a reference object — one tight double loop per row instead of
  * building and sorting a struct array per row. Ties break to the lower
  * cell index. */
case class NearestCentroid(child: org.apache.spark.sql.catalyst.expressions.Expression,
    centroids: Array[Array[Float]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "nearest_centroid needs an array<float|double> input")
    }

  override def dataType: DataType = IntegerType

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var best = 0
    var bestScore = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      val n = math.min(cent.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        s += x * cent(i); i += 1
      }
      if (s > bestScore) { bestScore = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cents = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val best = ctx.freshName("best"); val bestS = ctx.freshName("bestS")
      val c = ctx.freshName("c"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val n = ctx.freshName("n")
      val cent = ctx.freshName("cent")
      val get = if (isFloat) s"(double)$a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $best = 0; double $bestS = Double.NEGATIVE_INFINITY;
         |for (int $c = 0; $c < $cents.length; $c++) {
         |  float[] $cent = $cents[$c];
         |  int $n = java.lang.Math.min($cent.length, $a.numElements());
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) { $s += $get * (double)$cent[$i]; }
         |  if ($s > $bestS) { $bestS = $s; $best = $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NearestCentroid =
    copy(child = newChild)
}

/** Product-quantization encoder: split the vector into `codebooks.length`
  * contiguous subspaces and emit, per subspace, the index of the L2-nearest
  * codeword — M bytes per vector (a 64-dim float embedding compresses
  * 256 B -> M B). Codebooks ride into generated code as a reference object;
  * one tight loop per row. `ksub` must be <= 256 (codes are bytes). Ties
  * break to the lower codeword index. */
case class PqEncode(child: org.apache.spark.sql.catalyst.expressions.Expression,
    codebooks: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.length <= 256),
    "pq_encode: ksub must be <= 256 per subspace")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_encode needs an array<float> input")
    }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    PqEncode.encode(v, codebooks)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
      s"${ev.value} = graft.expressions.PqEncode.encode($a, $books);"
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Shared by eval and generated code: argmin-L2 per subspace. Subspace
    * boundaries derive from the codeword dims (`offset` advances by each
    * subspace's own width), so ragged splits (dim % m != 0) encode
    * correctly. */
  def encode(v: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Byte] = {
    val m = codebooks.length
    val out = new Array[Byte](m)
    var off = 0
    var sub = 0
    while (sub < m) {
      val book = codebooks(sub)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var k = 0
      while (k < book.length) {
        val cw = book(k)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v.getFloat(off + i).toDouble - cw(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = k }
        k += 1
      }
      out(sub) = best.toByte
      off += dsub
      sub += 1
    }
    out
  }
}

/** Asymmetric-distance (ADC) approximate dot product: sum, over subspaces,
  * of a precomputed lookup `lut(m)(code)` where
  * `lut(m)(k) = dot(query_m, codebook(m)(k))`. The corpus side touches only
  * the M-byte code — the decompression never materializes. */
case class PqAdcDot(child: org.apache.spark.sql.catalyst.expressions.Expression,
    lut: Array[Array[Double]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_adc_dot needs a binary (pq code) input")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    PqAdcDot.score(input.asInstanceOf[Array[Byte]], lut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val l = ctx.addReferenceObj("lut", lut, "double[][]")
      s"${ev.value} = graft.expressions.PqAdcDot.score($a, $l);"
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): PqAdcDot =
    copy(child = newChild)
}

object PqAdcDot {
  def score(codes: Array[Byte], lut: Array[Array[Double]]): Double = {
    // Either direction of mismatch means the codes were produced by a
    // different PqModel than the query LUT — summing a prefix would return
    // silently wrong scores, so reject both ways.
    val m = if (codes.length != lut.length) {
      throw new IllegalArgumentException(
        s"pq_adc_dot: code has ${codes.length} subspaces, lut has ${lut.length}")
    } else lut.length
    var s = 0.0
    var i = 0
    while (i < m) { s += lut(i)(codes(i) & 0xff); i += 1 }
    s
  }
}

/** Batch-ADC scoring: like [[PqAdcDot]] but the query is selected PER ROW
  * by a dense index column into a table of per-query LUTs (one broadcast
  * reference object holding all Q luts — Q · m · ksub doubles). This is
  * what lets a multi-query batch retrieval score (query, code) pairs
  * inside ONE whole-stage-codegen'd join pass instead of Q scans. */
case class PqAdcDotMulti(left: Expression, right: Expression,
    luts: Array[Array[Array[Double]]]) extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_adc_dot_multi needs (binary pq code, int query index) inputs, " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any, qi: Any): Any =
    PqAdcDotMulti.score(codes.asInstanceOf[Array[Byte]],
      qi.asInstanceOf[Int], luts)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val l = ctx.addReferenceObj("luts", luts, "double[][][]")
      s"${ev.value} = graft.expressions.PqAdcDotMulti.score($a, $b, $l);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDotMulti =
    copy(left = newLeft, right = newRight)
}

object PqAdcDotMulti {
  def score(codes: Array[Byte], qi: Int,
      luts: Array[Array[Array[Double]]]): Double = {
    if (qi < 0 || qi >= luts.length)
      throw new IllegalArgumentException(
        s"pq_adc_dot_multi: query index $qi outside [0, ${luts.length})")
    PqAdcDot.score(codes, luts(qi))
  }
}

/** Batch dot-product: dot of a float-array column against a row-selected
  * query vector from ONE broadcast reference table (Q · dim floats) —
  * the raw-vector sibling of [[PqAdcDotMulti]] for the exact re-rank
  * stage of batch retrieval. The literal-array alternative
  * (`element_at(array(vecLit...))`) embeds Q·dim constants into the
  * generated source and pays a janino compile proportional to the batch
  * on every plan — a reference object costs nothing at compile time. */
case class VecDotMulti(left: Expression, right: Expression,
    table: Array[Array[Float]]) extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "vec_dot_multi needs (array<float>, int query index) inputs, " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(vec: Any, qi: Any): Any =
    VecDotMulti.score(vec.asInstanceOf[ArrayData],
      qi.asInstanceOf[Int], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val t = ctx.addReferenceObj("table", table, "float[][]")
      s"${ev.value} = graft.expressions.VecDotMulti.score($a, $b, $t);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotMulti =
    copy(left = newLeft, right = newRight)
}

object VecDotMulti {
  def score(vec: ArrayData, qi: Int, table: Array[Array[Float]]): Double = {
    if (qi < 0 || qi >= table.length)
      throw new IllegalArgumentException(
        s"vec_dot_multi: query index $qi outside [0, ${table.length})")
    val q = table(qi)
    if (vec.numElements() != q.length)
      throw new IllegalArgumentException(
        s"vec_dot_multi: vector dim ${vec.numElements()} != query dim ${q.length}")
    // double accumulator, left-to-right fold — bit-identical to VecDot /
    // the DuckDB oracle's list_dot_product on DOUBLE[]
    var s = 0.0
    var i = 0
    while (i < q.length) { s += vec.getFloat(i).toDouble * q(i); i += 1 }
    s
  }
}

/** Executor-side PQ lookup-table build: from a query vector, compute
  * `lut[sub * ksub + k] = dot(query_sub, codebook(sub)(k))` as ONE flat
  * double array (m·ksub entries). The codebook — m·ksub·dsub floats,
  * tiny and batch-independent — rides into generated code as a reference
  * object, so a DISTRIBUTED query relation can derive its own LUTs where
  * the rows live: batch retrieval never collects queries to the driver
  * (the per-query math is identical to the driver-side
  * [[graft.ops.SimilaritySearch.PqModel.lut]], bit for bit). */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(codebooks.nonEmpty &&
    codebooks.forall(_.length == codebooks(0).length),
    "pq_lut: codebooks must share one ksub (flat LUT indexing)")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_lut needs an array<float> (query vector) input")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PqLut.lut(input.asInstanceOf[ArrayData], codebooks))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.PqLut.lut($a, $books));""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PqLut = copy(child = newChild)
}

object PqLut {
  /** Shared by eval and generated code: per-subspace codeword dots, double
    * accumulator, left-to-right fold — the same arithmetic as the
    * driver-side `PqModel.lut`. */
  def lut(v: ArrayData, codebooks: Array[Array[Array[Float]]]): Array[Double] = {
    val m = codebooks.length
    val ksub = codebooks(0).length
    val dim = codebooks.map(_(0).length).sum
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"pq_lut: query dim ${v.numElements()} != model dim $dim")
    val out = new Array[Double](m * ksub)
    var off = 0
    var sub = 0
    while (sub < m) {
      val book = codebooks(sub)
      val dsub = book(0).length
      var k = 0
      while (k < ksub) {
        val cw = book(k)
        var s = 0.0
        var i = 0
        while (i < dsub) { s += v.getFloat(off + i).toDouble * cw(i); i += 1 }
        out(sub * ksub + k) = s
        k += 1
      }
      off += dsub
      sub += 1
    }
    out
  }
}

/** ADC dot product where the LUT arrives as a COLUMN (the flat m·ksub
  * layout [[PqLut]] emits) instead of a driver-built reference object —
  * the scoring half of fully-distributed batch retrieval: each scored row
  * reads its query's LUT from the join side, so no per-query state ever
  * exists on the driver. Same math as [[PqAdcDot]]. */
case class PqAdcDotLut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "pq_adc_dot_lut needs (binary pq code, array<double> lut) inputs, " +
            s"got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqAdcDotLut.score(codes.asInstanceOf[Array[Byte]],
      lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.PqAdcDotLut.score($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDotLut =
    copy(left = newLeft, right = newRight)
}

object PqAdcDotLut {
  def score(codes: Array[Byte], lut: ArrayData): Double = {
    val m = codes.length
    val n = lut.numElements()
    // a LUT from a different PqModel than the codes means silent garbage —
    // reject any layout whose flat length isn't an exact multiple
    if (m == 0 || n % m != 0) throw new IllegalArgumentException(
      s"pq_adc_dot_lut: lut length $n not a multiple of $m subspaces")
    val ksub = n / m
    var s = 0.0
    var sub = 0
    while (sub < m) {
      s += lut.getDouble(sub * ksub + (codes(sub) & 0xff))
      sub += 1
    }
    s
  }
}

/** Scalar-quantization (SQ8) encoder: each dimension maps to one byte on a
  * per-dimension [min, max] grid — `dim` bytes per vector, a fixed 4x
  * compression with far lower distortion than PQ's m-byte codes (the
  * Faiss `SQ8` point on the memory/recall curve, between raw floats and
  * PQ). Grid arrays ride into generated code as reference objects. */
case class SqEncode(child: Expression, mins: Array[Float],
    steps: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(mins.length == steps.length,
    s"sq_encode: mins/steps length mismatch ${mins.length} != ${steps.length}")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sq_encode needs an array<float> input")
    }

  override def dataType: DataType = BinaryType

  override def nullSafeEval(input: Any): Any =
    SqEncode.encode(input.asInstanceOf[ArrayData], mins, steps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("mins", mins, "float[]")
      val s = ctx.addReferenceObj("steps", steps, "float[]")
      s"${ev.value} = graft.expressions.SqEncode.encode($a, $m, $s);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SqEncode = copy(child = newChild)
}

object SqEncode {
  /** Shared by eval and generated code: per-dimension nearest grid point,
    * clamped to [0, 255]. A zero-width dimension (constant across the
    * corpus, step 0) encodes as 0 and decodes back to its min — lossless
    * for that dimension. */
  def encode(v: ArrayData, mins: Array[Float], steps: Array[Float]): Array[Byte] = {
    val dim = mins.length
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"sq_encode: vector dim ${v.numElements()} != model dim $dim")
    val out = new Array[Byte](dim)
    var i = 0
    while (i < dim) {
      val step = steps(i)
      if (step > 0f) {
        val q = Math.round((v.getFloat(i) - mins(i)) / step)
        out(i) = Math.max(0, Math.min(255, q)).toByte
      } // else leave 0
      i += 1
    }
    out
  }
}

/** ADC dot product against SQ8 codes: with dequant_i = min_i + code_i *
  * step_i, dot(q, dequant) = sum_i q_i*min_i + sum_i (q_i*step_i)*code_i —
  * the first term (`bias`) and the per-dimension factors (`scaled`) are
  * computed ONCE per query driver-side, so the scan does one fused
  * multiply-add per byte and never materializes the decompression
  * (the SQ analog of [[PqAdcDot]]). */
case class SqAdcDot(child: Expression, scaled: Array[Double], bias: Double)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sq_adc_dot needs a binary (sq code) input")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    SqAdcDot.score(input.asInstanceOf[Array[Byte]], scaled, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("scaled", scaled, "double[]")
      s"${ev.value} = graft.expressions.SqAdcDot.score($a, $s, $bias);"
    })

  override protected def withNewChildInternal(
      newChild: Expression): SqAdcDot = copy(child = newChild)
}

object SqAdcDot {
  def score(codes: Array[Byte], scaled: Array[Double], bias: Double): Double = {
    if (codes.length != scaled.length) throw new IllegalArgumentException(
      s"sq_adc_dot: code dim ${codes.length} != query dim ${scaled.length}")
    var s = bias
    var i = 0
    while (i < codes.length) { s += scaled(i) * (codes(i) & 0xff); i += 1 }
    s
  }
}

/** Executor-side SQ query-factor build: from a query vector, compute the
  * per-dimension FMA factors `scaled_i = q_i * step_i` and the constant
  * `bias = sum_i q_i * min_i` as ONE flat double array laid out
  * `[scaled_0 .. scaled_{dim-1}, bias]`. The grid — 2·dim floats,
  * batch-independent — rides into generated code as reference objects, so
  * a DISTRIBUTED query relation derives its own factors where the rows
  * live: SQ batch retrieval never collects queries to the driver (the
  * per-query math is identical to the driver-side
  * [[graft.ops.ScalarQuantization.SqModel.queryFactors]], bit for bit —
  * the SQ analog of [[PqLut]]). */
case class SqFactors(child: Expression, mins: Array[Float],
    steps: Array[Float])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(mins.length == steps.length,
    s"sq_factors: mins/steps length mismatch ${mins.length} != ${steps.length}")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sq_factors needs an array<float> (query vector) input")
    }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SqFactors.factors(input.asInstanceOf[ArrayData], mins, steps))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("mins", mins, "float[]")
      val s = ctx.addReferenceObj("steps", steps, "float[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.SqFactors.factors($a, $m, $s));""".stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): SqFactors = copy(child = newChild)
}

object SqFactors {
  /** Shared by eval and generated code: same arithmetic (and accumulation
    * order) as `SqModel.queryFactors`. */
  def factors(v: ArrayData, mins: Array[Float], steps: Array[Float])
      : Array[Double] = {
    val dim = mins.length
    if (v.numElements() != dim) throw new IllegalArgumentException(
      s"sq_factors: query dim ${v.numElements()} != model dim $dim")
    val out = new Array[Double](dim + 1)
    var bias = 0.0
    var i = 0
    while (i < dim) {
      val q = v.getFloat(i).toDouble
      out(i) = q * steps(i)
      bias += q * mins(i)
      i += 1
    }
    out(dim) = bias
    out
  }
}

/** SQ ADC dot product where the query factors arrive as a COLUMN (the
  * `[scaled.., bias]` layout [[SqFactors]] emits) instead of driver-built
  * reference objects — the scoring half of fully-distributed SQ batch
  * retrieval; same math as [[SqAdcDot]]. */
case class SqAdcDotLut(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "sq_adc_dot_lut needs (binary sq code, array<double> factors) " +
            s"inputs, got ${left.dataType.sql} / ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(codes: Any, factors: Any): Any =
    SqAdcDotLut.score(codes.asInstanceOf[Array[Byte]],
      factors.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.SqAdcDotLut.score($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqAdcDotLut =
    copy(left = newLeft, right = newRight)
}

object SqAdcDotLut {
  def score(codes: Array[Byte], factors: ArrayData): Double = {
    val dim = codes.length
    // factors from a different SqModel than the codes means silent
    // garbage — the layout carries dim+1 entries by construction
    if (factors.numElements() != dim + 1) throw new IllegalArgumentException(
      s"sq_adc_dot_lut: factors length ${factors.numElements()} != " +
        s"code dim $dim + 1")
    var s = factors.getDouble(dim) // bias
    var i = 0
    while (i < dim) { s += factors.getDouble(i) * (codes(i) & 0xff); i += 1 }
    s
  }
}

object VectorExpressions {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  def vecDot(a: Column, b: Column): Column =
    column(VecDot(expression(a), expression(b)))

  def sortedCountCommon(a: Column, b: Column): Column =
    column(SortedCountCommon(expression(a), expression(b)))

  def nearestCentroid(v: Column, centroids: Array[Array[Float]]): Column =
    column(NearestCentroid(expression(v), centroids))

  def pqEncode(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    column(PqEncode(expression(v), codebooks))

  def pqAdcDot(codes: Column, lut: Array[Array[Double]]): Column =
    column(PqAdcDot(expression(codes), lut))

  def pqAdcDotMulti(codes: Column, queryIdx: Column,
      luts: Array[Array[Array[Double]]]): Column =
    column(PqAdcDotMulti(expression(codes), expression(queryIdx), luts))

  def pqLut(v: Column, codebooks: Array[Array[Array[Float]]]): Column =
    column(PqLut(expression(v), codebooks))

  def pqAdcDotLut(codes: Column, lut: Column): Column =
    column(PqAdcDotLut(expression(codes), expression(lut)))

  def vecDotMulti(vec: Column, queryIdx: Column,
      table: Array[Array[Float]]): Column =
    column(VecDotMulti(expression(vec), expression(queryIdx), table))

  def sqEncode(v: Column, mins: Array[Float], steps: Array[Float]): Column =
    column(SqEncode(expression(v), mins, steps))

  def sqAdcDot(codes: Column, scaled: Array[Double], bias: Double): Column =
    column(SqAdcDot(expression(codes), scaled, bias))

  def sqFactors(v: Column, mins: Array[Float], steps: Array[Float]): Column =
    column(SqFactors(expression(v), mins, steps))

  def sqAdcDotLut(codes: Column, factors: Column): Column =
    column(SqAdcDotLut(expression(codes), expression(factors)))

  /** JL random sign projection to `outDim` dims (see [[RandomProject]]). */
  def randomProject(vec: Column, outDim: Int, seed: Long): Column =
    column(RandomProject(expression(vec), outDim, seed))
}
