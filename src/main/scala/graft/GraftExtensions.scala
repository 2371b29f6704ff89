package graft

import graft.expressions.{MgTopK, SortedCountCommon, VecDot, VecTopK}
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
  * unit-norm vectors), `sorted_count_common(a, b)`, and the aggregates
  * `mg_topk(term, capacity)` and `vec_topk(id, score, k)` (capacity/k
  * literals).
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

  /** Register into an existing session (idempotent). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
