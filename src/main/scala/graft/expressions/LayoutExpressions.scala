package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, LongType, NumericType}

/** Morton z-value from per-column quantile breakpoints, as ONE expression.
  *
  * The Column-arithmetic formulation ([[graft.ops.Layout.bucketPiecewise]]
  * chained under the bit-interleave) duplicates a K-branch `when` chain
  * into every one of the `bits` interleave terms per column — and the
  * range partitioner's SAMPLING pass evaluates projections interpreted,
  * where no common-subexpression elimination saves it: measured 4x the
  * whole write cost of the linear z path at sf0.1. Here each input is
  * bucketed once per row (binary search over the ascending knots, then
  * linear interpolation inside the segment) and the buckets' bits are
  * interleaved in a tight loop — identical semantics to
  * [[graft.ops.Layout.zOrderValueQuantileScala]], the spec-checked mirror.
  *
  * Null semantics match the Column formulation: any null input yields a
  * null z-value (range partitioning groups the nulls together).
  */
case class ZMortonQuantile(children: Seq[Expression],
    breaks: Array[Array[Double]], bits: Int) extends Expression {

  require(children.nonEmpty && children.size == breaks.length,
    "one breakpoint list per z-order column")
  require(children.size * bits <= 63,
    s"${children.size} cols x $bits bits exceeds a long's 63 usable bits")
  require(breaks.forall(_.length >= 2), "need at least 2 breakpoints")

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType.isInstanceOf[NumericType]))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "z_morton_quantile needs numeric inputs")

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)

  /** Bucket of `v` in column `i`: first segment whose upper knot exceeds
    * `v` (strict upper bound over ascending, possibly-duplicated knots),
    * linearly interpolated inside the segment. Public for codegen. */
  def bucket(i: Int, v: Double): Long = {
    val b = breaks(i)
    val top = (1L << bits) - 1
    val k = b.length - 1
    if (v <= b(0)) return 0L
    // binary search: smallest j with b(j) > v
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) > v) hi = mid else lo = mid + 1
    }
    if (lo > k) return top
    val seg = lo - 1
    val segW = (top + 1).toDouble / k
    val (l, h) = (b(seg), b(seg + 1))
    val pos = if (h > l) seg * segW + (v - l) / (h - l) * segW else seg * segW
    math.max(0L, math.min(top, math.floor(pos).toLong))
  }

  /** Interleave the per-column buckets. Public for codegen. */
  def interleave(buckets: Array[Long]): Long = {
    val n = buckets.length
    var z = 0L
    var j = 0
    while (j < bits) {
      var i = 0
      while (i < n) {
        z |= ((buckets(i) >> j) & 1L) << (j * n + i)
        i += 1
      }
      j += 1
    }
    z
  }

  override def eval(input: InternalRow): Any = {
    val n = children.size
    val buckets = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      if (v == null) return null
      buckets(i) = bucket(i, v.asInstanceOf[Number].doubleValue())
      i += 1
    }
    interleave(buckets)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("zmq", this, classOf[ZMortonQuantile].getName)
    val evals = children.map(_.genCode(ctx))
    val buckets = ctx.freshName("buckets")
    val fill = children.zipWithIndex.map { case (c, i) =>
      val e = evals(i)
      val guard =
        if (c.nullable) s"if (${e.isNull}) { ${ev.isNull} = true; }" else ""
      s"""${e.code}
         |$guard
         |if (!${ev.isNull}) {
         |  $buckets[$i] = $ref.bucket($i, (double) ${e.value});
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        long[] $buckets = new long[${children.size}];
        $fill
        if (!${ev.isNull}) {
          ${ev.value} = $ref.interleave($buckets);
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZMortonQuantile =
    copy(children = newChildren)
}

object LayoutExpressions {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  /** Inputs are pre-cast to double so the expression's eval/codegen see
    * exactly one numeric representation (decimal included). */
  def zMortonQuantile(cols: Seq[Column], breaks: Seq[Seq[Double]],
      bits: Int): Column =
    column(ZMortonQuantile(cols.map(c => expression(c.cast("double"))),
      breaks.map(_.toArray).toArray, bits))
}
