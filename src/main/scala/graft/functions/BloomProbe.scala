package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

import graft.io.FileBloom

/** Membership probe against a BROADCAST Bloom filter, as one codegen'd
  * boolean expression over a 64-bit key — the filter half of
  * [[graft.ops.BloomJoin]]'s runtime semi-join reduction. The bit array
  * rides a Spark broadcast (shipped once per executor, not per task);
  * the generated code calls straight into [[FileBloom.mightContain]],
  * the same double-hashed splitmix64 kernel the build side used, so the
  * two can never drift. False ⇒ the key is DEFINITELY absent from the
  * build side; true ⇒ maybe present (the false-positive rate only costs
  * shuffle bytes, never rows). */
case class BloomProbeExpr(child: Expression, m: Int, bits: Broadcast[Array[Byte]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_probe needs a bigint key (hash the join tuple first), got ${t.simpleString}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_probe"

  def probe(key: Long): Boolean = FileBloom.mightContain(m, bits.value, key)

  override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbeExpr =
    copy(child = newChild)
}

object BloomProbeExpr {
  def apply(key: Column, m: Int, bits: Broadcast[Array[Byte]]): Column =
    bridge.column(new BloomProbeExpr(bridge.expression(key), m, bits))
}
