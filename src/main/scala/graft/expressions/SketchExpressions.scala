package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing core shared by the sketch expressions and their generated code
  * (generated Java calls these statics directly). splitmix64 finalizer over
  * a polynomial byte fold — deterministic, fast, public-domain algorithm. */
object SketchHash {
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash(s: UTF8String, seed: Long): Long = {
    val b = s.getBytes
    var h = seed
    var i = 0
    while (i < b.length) { h = h * 31L + b(i); i += 1 }
    mix(h)
  }

  /** Count-min row index for `t` in sketch row `row` (one independent hash
    * per row via a row-salted seed). Shared by [[CmsSketch]]'s update path,
    * [[CmsEstimate]]'s probe (eval AND generated code), and the golden
    * oracle's independent driver-side recomputation. */
  def cmsIndex(t: UTF8String, row: Int, width: Int): Int =
    java.lang.Math.floorMod(hash(t, 0xc3a5c85c97cb3127L * (row + 1)),
      width.toLong).toInt

  /** Point estimate = min over rows of the addressed counters. */
  def cmsEstimate(sk: ArrayData, t: UTF8String, depth: Int, width: Int): Long = {
    var m = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sk.getLong(r * width + cmsIndex(t, r, width))
      if (c < m) m = c
      r += 1
    }
    m
  }
}

/** MinHash signature of a string-array column: `numHashes` permutation
  * minima via double hashing (`h1 + i*h2`, wrapping arithmetic — this is
  * our own codegen, ANSI overflow semantics don't apply). One pass over the
  * set per row; replaces `numHashes` interpreted HOF aggregates. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "minhash_signature needs an array<string> input")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      val s = arr.getUTF8String(i)
      val h1 = SketchHash.hash(s, 0L)
      val h2 = SketchHash.hash(s, 0x9e3779b9L) | 1L
      var j = 0
      while (j < numHashes) {
        val v = h1 + j * h2
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2"); val v = ctx.freshName("v")
      s"""
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $s = $a.getUTF8String($i);
         |  long $h1 = graft.expressions.SketchHash.hash($s, 0L);
         |  long $h2 = graft.expressions.SketchHash.hash($s, 0x9e3779b9L) | 1L;
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = $h1 + $j * $h2;
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** 64-bit SimHash of a token-array column: sign-sum of per-token hash bits.
  * Replaces 64 interpreted HOF aggregates with one tight loop. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "simhash64 needs an array<string> input")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = SketchHash.hash(arr.getUTF8String(i), 7L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sums = ctx.freshName("sums")
      val sig = ctx.freshName("sigv")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2"); val h = ctx.freshName("h")
      s"""
         |int[] $sums = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = graft.expressions.SketchHash.hash($a.getUTF8String($i), 7L);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $sums[$b]++; else $sums[$b]--;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) { if ($sums[$b2] > 0) $sig |= (1L << $b2); }
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Misra-Gries frequent-items sketch as a typed aggregate (Misra & Gries
  * 1982; merge rule from Agarwal et al. 2012, "Mergeable Summaries"). At
  * most `capacity` counters of state per partial buffer, independent of
  * cardinality — the one-pass top-k shape for 100 TB term/URL/n-gram
  * streams where `groupBy(term).count` would shuffle a vocabulary of
  * billions. Guarantees: estimates never exceed true counts, undercount by
  * at most N/(capacity+1), and any item with true count > N/(capacity+1)
  * survives; with capacity ≥ distinct items the counts are exact.
  *
  * Returns ALL surviving counters as array<struct<term,count>> sorted by
  * (count desc, term asc) — callers explode and limit to their k. Note:
  * with drops, which borderline items survive depends on merge order, so
  * only the guarantees above (not the exact counter set) are stable across
  * partitionings; at capacity ≥ distinct the result is deterministic. */
case class MgTopK(child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[scala.collection.mutable.HashMap[String, Long]]
    with UnaryLike[Expression] {
  require(capacity > 0, "mg_topk: capacity must be positive")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mg_topk needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): scala.collection.mutable.HashMap[String, Long] =
    scala.collection.mutable.HashMap.empty

  override def update(b: scala.collection.mutable.HashMap[String, Long],
      input: org.apache.spark.sql.catalyst.InternalRow)
      : scala.collection.mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String].toString
      b.get(t) match {
        case Some(c) => b.update(t, c + 1)
        case None if b.size < capacity => b.update(t, 1L)
        case None =>
          // classic MG step: the unseen item and every counter pay 1
          b.toList.foreach { case (k, c) =>
            if (c == 1) b.remove(k) else b.update(k, c - 1)
          }
      }
    }
    b
  }

  override def merge(b: scala.collection.mutable.HashMap[String, Long],
      other: scala.collection.mutable.HashMap[String, Long])
      : scala.collection.mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) => b.update(k, b.getOrElse(k, 0L) + c) }
    if (b.size > capacity) {
      // subtract the (capacity+1)-th largest count from all, drop <= 0 —
      // the mergeable-summaries rule (error adds, stays <= N/(capacity+1))
      val m = b.values.toArray.sortInPlace()(Ordering[Long].reverse)
        .apply(capacity)
      b.toList.foreach { case (k, c) =>
        if (c - m <= 0) b.remove(k) else b.update(k, c - m)
      }
    }
    b
  }

  override def eval(b: scala.collection.mutable.HashMap[String, Long]): Any = {
    val sorted = b.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(t), c)
    })
  }

  override def serialize(b: scala.collection.mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    // length-prefixed raw UTF-8 (writeUTF caps modified-UTF-8 at 64 KiB and
    // would throw on long terms — the input is an arbitrary string column)
    b.foreach { case (k, c) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(c)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.HashMap[String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = scala.collection.mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      b.update(new String(kb, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MgTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MgTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MgTopK =
    copy(child = newChild)
  override def prettyName: String = "mg_topk"
}

/** Bounded top-k as a typed aggregate: keep the `k` (id, score) pairs with
  * the highest scores (ties to the LOWER id — the engine's standard rank
  * order `desc(score), asc(pk)`), returned sorted as
  * array<struct<id,score>>. This is `TakeOrderedAndProject`'s per-partition
  * heap discipline surfaced as a SQL aggregate: partial buffers hold at
  * most k pairs regardless of input size, so the exchange carries
  * O(k · partitions) rows — and `GROUP BY query_id` gives the multi-query
  * kNN-join shape ([[graft.ops.TopKAggregator]]) in pure SQL. */
case class VecTopK(left: Expression, right: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecTopK.Buf]
    with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {
  require(k > 0, "vec_topk: k must be positive")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val idOk = left.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val scoreOk = right.dataType match {
      case FloatType | DoubleType => true
      case _ => false
    }
    if (idOk && scoreOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_topk needs (integral id, float|double score) inputs, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def createAggregationBuffer(): VecTopK.Buf = new VecTopK.Buf(k)

  private def idAsLong(v: Any): Long = v match {
    case b: Byte => b.toLong
    case s: Short => s.toLong
    case i: Int => i.toLong
    case l: Long => l
  }

  private def scoreAsDouble(v: Any): Double = v match {
    case f: Float => f.toDouble
    case d: Double => d
  }

  override def update(b: VecTopK.Buf,
      input: org.apache.spark.sql.catalyst.InternalRow): VecTopK.Buf = {
    val id = left.eval(input)
    val score = right.eval(input)
    if (id != null && score != null) b.add(idAsLong(id), scoreAsDouble(score))
    b
  }

  override def merge(b: VecTopK.Buf, other: VecTopK.Buf): VecTopK.Buf = {
    other.foreach((id, s) => b.add(id, s))
    b
  }

  override def eval(b: VecTopK.Buf): Any = {
    val sorted = b.toArray.sortBy { case (id, s) => (-s, id) }
    new GenericArrayData(sorted.map { case (id, s) =>
      org.apache.spark.sql.catalyst.InternalRow(id, s)
    })
  }

  override def serialize(b: VecTopK.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    val arr = b.toArray
    out.writeInt(b.k); out.writeInt(arr.length)
    arr.foreach { case (id, s) => out.writeLong(id); out.writeDouble(s) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecTopK.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val b = new VecTopK.Buf(in.readInt())
    val n = in.readInt()
    (0 until n).foreach(_ => b.add(in.readLong(), in.readDouble()))
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecTopK = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_topk"
}

object VecTopK {
  /** Bounded worst-at-head heap: O(log k) insert, at most k pairs of state.
    * A candidate beats the current worst when its score is higher, or equal
    * with a lower id (the `desc(score), asc(id)` total order). */
  final class Buf(val k: Int) {
    // head = WORST kept pair under the rank order, so ordering ranks
    // lower-score (then higher-id) pairs greater
    private val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double)](
      new Ordering[(Long, Double)] {
        def compare(a: (Long, Double), b: (Long, Double)): Int = {
          val c = java.lang.Double.compare(b._2, a._2)
          if (c != 0) c else java.lang.Long.compare(a._1, b._1)
        }
      })

    def add(id: Long, score: Double): Unit =
      if (heap.size < k) heap.enqueue((id, score))
      else {
        val (wid, wscore) = heap.head
        if (score > wscore || (score == wscore && id < wid)) {
          heap.dequeue(); heap.enqueue((id, score))
        }
      }

    def foreach(f: (Long, Double) => Unit): Unit =
      heap.foreach { case (id, s) => f(id, s) }

    def toArray: Array[(Long, Double)] = heap.toArray
  }
}

/** Count-min sketch of a string column (Cormode & Muthukrishnan 2005) as a
  * typed aggregate: `depth x width` counters, one row-salted hash per row;
  * update increments one counter per row, merge is element-wise addition —
  * fully mergeable, fixed `depth*width*8` bytes of state per partial buffer
  * regardless of cardinality. Where [[MgTopK]] answers "which items are
  * frequent", the CMS answers POINT queries — "how often did THIS
  * key occur" — for any key decided after the scan, without shuffling the
  * key universe. Guarantees: estimates never undercount, and overcount by
  * at most `e*N/width` with probability `1 - e^-depth` (N = stream size).
  * Returns the counter matrix as array<long> (row-major), probed with
  * [[CmsEstimate]]. Deterministic for a fixed input multiset: counters are
  * sums, so partitioning and merge order cannot change them (unlike MG's
  * borderline evictions). */
case class CmsSketch(child: Expression, depth: Int, width: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {
  require(depth > 0 && depth <= 16, s"cms_sketch: depth must be in [1,16], got $depth")
  require(width > 0, s"cms_sketch: width must be positive, got $width")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch needs a string column, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long],
      input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val t = v.asInstanceOf[UTF8String]
      var r = 0
      while (r < depth) {
        b(r * width + SketchHash.cmsIndex(t, r, width)) += 1
        r += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val b = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(b)
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CmsSketch =
    copy(child = newChild)
  override def prettyName: String = "cms_sketch"
}

/** Point-query a [[CmsSketch]] counter matrix: min over the `depth`
  * addressed counters. `depth`/`width` must match the sketch they came
  * from (the sketch is just an array — the shape is the caller's
  * contract). Codegen'd: the generated code calls the same
  * [[SketchHash]] statics as the interpreted path. */
case class CmsEstimate(left: Expression, right: Expression,
    depth: Int, width: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(depth > 0 && width > 0, "cms_estimate: depth/width must be positive")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate needs (array<bigint>, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(sk: Any, t: Any): Any =
    SketchHash.cmsEstimate(sk.asInstanceOf[ArrayData],
      t.asInstanceOf[UTF8String], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sk, t) =>
      s"${ev.value} = graft.expressions.SketchHash.cmsEstimate($sk, $t, $depth, $width);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_estimate"
}

/** Mutable buffer for [[VecMoments]]: element count + per-dimension sum
  * and sum-of-squares. Dimensions are discovered on the first non-null
  * input (dim 0 = uninitialized). */
final class MomentsBuffer(var n: Long, var sum: Array[Double],
    var sumsq: Array[Double])

/** Per-dimension first and second moments of a vector column in ONE
  * pass: `(n, sum[dim], sumsq[dim])`, element-wise partial aggregation —
  * the profiling primitive behind quantizer grids (SQ min/max ranges,
  * PQ sub-space scaling), embedding drift monitors, and feature
  * standardization. The naive formulation (`posexplode` then
  * `groupBy(dim)`) shuffles rows x dims rows — at 100 TB of 1k-dim
  * embeddings that is a thousandfold blowup of the exchange; this
  * aggregate ships ONE `(8 + 16*dim)`-byte buffer per partition.
  * Deterministic up to float fold order (sums of doubles; the driver's
  * compare is float-tolerant, and callers derive mean/variance via
  * explicit sum/n arithmetic so both engines share the formula).
  * Ragged dimensions fail loudly — a silent truncation would corrupt
  * every downstream statistic. Contract: vectors are dense — NULL rows
  * are skipped, but null ELEMENTS inside a vector are not supported
  * (clean them upstream; an embedding with missing dimensions is not a
  * vector). */
case class VecMoments(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MomentsBuffer]
    with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false),
      nullable = false),
    StructField("sumsq", ArrayType(DoubleType, containsNull = false),
      nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"vec_moments needs array<float|double>, got ${t.catalogString}")
    }

  private def isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): MomentsBuffer =
    new MomentsBuffer(0L, Array.emptyDoubleArray, Array.emptyDoubleArray)

  override def update(b: MomentsBuffer,
      input: org.apache.spark.sql.catalyst.InternalRow): MomentsBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val d = arr.numElements()
      if (b.n == 0L && b.sum.isEmpty) {
        b.sum = new Array[Double](d); b.sumsq = new Array[Double](d)
      }
      require(d == b.sum.length,
        s"vec_moments: ragged dimensions ($d vs ${b.sum.length})")
      var i = 0
      while (i < d) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        b.sum(i) += x; b.sumsq(i) += x * x
        i += 1
      }
      b.n += 1
    }
    b
  }

  override def merge(b: MomentsBuffer, o: MomentsBuffer): MomentsBuffer = {
    if (o.n == 0L) b
    else if (b.n == 0L && b.sum.isEmpty) o
    else {
      require(b.sum.length == o.sum.length,
        s"vec_moments: ragged dimensions across partitions " +
          s"(${b.sum.length} vs ${o.sum.length})")
      var i = 0
      while (i < b.sum.length) {
        b.sum(i) += o.sum(i); b.sumsq(i) += o.sumsq(i); i += 1
      }
      b.n += o.n
      b
    }
  }

  override def eval(b: MomentsBuffer): Any =
    org.apache.spark.sql.catalyst.InternalRow(b.n,
      new GenericArrayData(b.sum), new GenericArrayData(b.sumsq))

  override def serialize(b: MomentsBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + 16 * b.sum.length)
    bb.putLong(b.n).putInt(b.sum.length)
    b.sum.foreach(bb.putDouble); b.sumsq.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MomentsBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getLong; val d = bb.getInt
    val s = Array.fill(d)(bb.getDouble); val q = Array.fill(d)(bb.getDouble)
    new MomentsBuffer(n, s, q)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VecMoments =
    copy(child = newChild)
  override def prettyName: String = "vec_moments"
}

object SketchExpressions {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  def minhashSignature(shingles: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(shingles), numHashes))

  def simhash64(tokens: Column): Column =
    column(SimHash64(expression(tokens)))

  /** Misra-Gries frequent items over a string column (see [[MgTopK]]). */
  def mgTopK(term: Column, capacity: Int): Column =
    column(MgTopK(expression(term), capacity).toAggregateExpression())

  /** Bounded top-k (id, score) pairs by rank order (see [[VecTopK]]). */
  def vecTopK(id: Column, score: Column, k: Int): Column =
    column(VecTopK(expression(id), expression(score), k).toAggregateExpression())

  /** Count-min sketch over a string column (see [[CmsSketch]]). */
  def cmsSketch(term: Column, depth: Int, width: Int): Column =
    column(CmsSketch(expression(term), depth, width).toAggregateExpression())

  /** Point-query a count-min sketch (see [[CmsEstimate]]). */
  def cmsEstimate(sketch: Column, term: Column, depth: Int, width: Int): Column =
    column(CmsEstimate(expression(sketch), expression(term), depth, width))

  /** One-pass per-dimension moments of a vector column (see [[VecMoments]]). */
  def vecMoments(vec: Column): Column =
    column(VecMoments(expression(vec)).toAggregateExpression())
}
