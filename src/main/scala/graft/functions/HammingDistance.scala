package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused Hamming-distance Catalyst expression (SURVEY.md §4 extension
  * point (b)) over two strings: positions whose bytes differ across the
  * common prefix, plus the length difference (a missing position counts
  * as a mismatch, so the measure stays a metric on unequal lengths).
  *
  * Built for fixed-length FINGERPRINT strings — [[graft.ops.Multimodal
  * .averageHashBits]] bit-strings, hex digests, SimHash bands — where the
  * hot path is |candidate pairs| evaluations inside a near-dup join.
  * One fused byte loop, no allocation (UTF8String bytes are read in
  * place), whole-stage codegen; byte comparison equals character
  * comparison because fingerprint alphabets are ASCII.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"hamming_distance needs two string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_distance"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val nx = x.numBytes(); val ny = y.numBytes()
    val n = math.min(nx, ny)
    var d = math.abs(nx - ny)
    var i = 0
    while (i < n) {
      if (x.getByte(i) != y.getByte(i)) d += 1
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val d = ctx.freshName("d")
      s"""
         |int $nx = $a.numBytes(); int $ny = $b.numBytes();
         |int $n = java.lang.Math.min($nx, $ny);
         |int $d = java.lang.Math.abs($nx - $ny);
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getByte($i) != $b.getByte($i)) $d++;
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def apply(a: Column, b: Column): Column =
    bridge.column(new HammingDistance(bridge.expression(a), bridge.expression(b)))
}
