package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a bigint column against a pre-built bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, the same sketch Spark's
  * own runtime bloom-join filters ship) — the map-only prefilter behind
  * [[graft.ops.Decontaminate.contaminationBloom]].
  *
  * The filter travels as its serialized bytes inside the expression (plans
  * are broadcast to executors once per stage, exactly how Spark ships its
  * injected runtime filters) and deserializes lazily once per
  * deserialization site, not per row. Guarantees of the underlying sketch:
  * no false negatives ever; false-positive rate bounded by the `fpp` it was
  * built with.
  */
case class BloomMightContainLong(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT probe, got ${other.simpleString(10)}")
  }

  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bloomBytes))

  /** Codegen entry point — public so generated code can call through the
    * reference object (which keeps exactly one deserialized filter per
    * task, shared across codegen'd rows). */
  def mightContain(h: Long): Boolean = bloom.mightContainLong(h)

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, h => {
      val ref = ctx.addReferenceObj("bloomExpr", this,
        classOf[BloomMightContainLong].getName)
      s"${ev.value} = $ref.mightContain($h);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainLong = copy(child = newChild)
}

object BloomExpressions {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  def bloomMightContainLong(h: Column, bloomBytes: Array[Byte]): Column =
    column(BloomMightContainLong(expression(h), bloomBytes))
}
