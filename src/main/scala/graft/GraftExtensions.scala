package graft

import graft.expressions.{BloomMightContainLong, CmsEstimate, CmsSketch, MgTopK, MinHashSignature, SimHash64, SortedCountCommon, VecDot, VecTopK}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's native expressions. Install either at
  * session build time:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  * or into a live session with [[GraftFunctions.register]]. Registered
  * functions: `vec_dot(a, b)`, `vec_cosine(a, b)` (alias of dot for
  * unit-norm vectors), `sorted_count_common(a, b)`,
  * `minhash_sig(shingles, num_hashes)`, `simhash64(tokens)`,
  * `bloom_might_contain_long(x, bloom)` (bloom a binary literal),
  * `cms_estimate(sketch, term, depth, width)`, and the aggregates
  * `mg_topk(term, capacity)`, `vec_topk(id, score, k)`, and
  * `cms_sketch(term, depth, width)` (capacity/k/depth/width literals).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {
  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, null, "vec_dot"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))),
    ("vec_cosine", // alias: cosine == dot on the engine's unit-norm vectors
      new ExpressionInfo(classOf[VecDot].getName, null, "vec_cosine"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))),
    ("sorted_count_common",
      new ExpressionInfo(classOf[SortedCountCommon].getName, null, "sorted_count_common"),
      (es: Seq[Expression]) => SortedCountCommon(es(0), es(1))),
    ("mg_topk", // aggregate: the analyzer wraps AggregateFunctions
      new ExpressionInfo(classOf[MgTopK].getName, null, "mg_topk"),
      (es: Seq[Expression]) => {
        require(es.length == 2 && intLiteral(es(1)),
          "mg_topk(term, capacity) needs a non-null integral literal capacity")
        MgTopK(es(0), es(1).eval().asInstanceOf[Number].intValue())
      }),
    ("vec_topk", // aggregate: bounded top-k (id, score) pairs
      new ExpressionInfo(classOf[VecTopK].getName, null, "vec_topk"),
      (es: Seq[Expression]) => {
        require(es.length == 3 && intLiteral(es(2)),
          "vec_topk(id, score, k) needs a non-null integral literal k")
        VecTopK(es(0), es(1), es(2).eval().asInstanceOf[Number].intValue())
      }),
    ("minhash_sig", // the dedup family's signature kernel
      new ExpressionInfo(classOf[MinHashSignature].getName, null, "minhash_sig"),
      (es: Seq[Expression]) => {
        require(es.length == 2 && intLiteral(es(1)),
          "minhash_sig(shingles, num_hashes) needs a non-null integral " +
            "literal num_hashes")
        MinHashSignature(es(0),
          es(1).eval().asInstanceOf[Number].intValue())
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, null, "simhash64"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("cms_sketch", // aggregate: count-min counter matrix (row-major)
      new ExpressionInfo(classOf[CmsSketch].getName, null, "cms_sketch"),
      (es: Seq[Expression]) => {
        require(es.length == 3 && intLiteral(es(1)) && intLiteral(es(2)),
          "cms_sketch(term, depth, width) needs non-null integral literal " +
            "depth and width")
        CmsSketch(es(0), es(1).eval().asInstanceOf[Number].intValue(),
          es(2).eval().asInstanceOf[Number].intValue())
      }),
    ("cms_estimate", // point-query a cms_sketch result (same depth/width)
      new ExpressionInfo(classOf[CmsEstimate].getName, null, "cms_estimate"),
      (es: Seq[Expression]) => {
        require(es.length == 4 && intLiteral(es(2)) && intLiteral(es(3)),
          "cms_estimate(sketch, term, depth, width) needs non-null " +
            "integral literal depth and width")
        CmsEstimate(es(0), es(1),
          es(2).eval().asInstanceOf[Number].intValue(),
          es(3).eval().asInstanceOf[Number].intValue())
      }),
    ("bloom_might_contain_long", // decontamination's map-side prefilter
      new ExpressionInfo(classOf[BloomMightContainLong].getName, null,
        "bloom_might_contain_long"),
      (es: Seq[Expression]) => {
        require(es.length == 2 && binLiteral(es(1)),
          "bloom_might_contain_long(x, bloom) needs a non-null binary " +
            "literal bloom (serialized via graft.ops.Decontaminate)")
        BloomMightContainLong(es(0), es(1).eval().asInstanceOf[Array[Byte]])
      }))

  /** Non-null integral literal guard: misuse fails with the builder's
    * descriptive message instead of a ClassCastException. */
  private def intLiteral(e: Expression): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val integral = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    integral && e.foldable && e.eval() != null
  }

  /** Non-null binary literal guard, same rationale as [[intLiteral]]. */
  private def binLiteral(e: Expression): Boolean =
    e.dataType == org.apache.spark.sql.types.BinaryType &&
      e.foldable && e.eval() != null

  /** Register into an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
