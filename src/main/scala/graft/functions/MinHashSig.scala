package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused MinHash signature Catalyst expression: from an `array<bigint>` of
  * shingle base hashes, computes all `numPerm` per-permutation minima in
  * ONE compiled nested loop.
  *
  * The composed-column form ([[graft.ops.Dedup.minhashSignature]]) builds
  * `numPerm` separate `transform` arrays evaluated by interpreted
  * higher-order lambdas — per-element interpreter dispatch dominates its
  * cost. This expression runs the same universal-family mix
  * `(a_i * (h & 2^31-1) + b_i) mod 2^31-1` as straight-line generated Java
  * with the coefficient tables as referenced objects, allocating only the
  * final signature array.
  */
case class MinHashSigExpr(child: Expression, numPerm: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig needs array<bigint> input, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as: Array[Long], bs: Array[Long]) =
    MinHashSigExpr.coefficients(numPerm, seed)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numPerm)(Long.MaxValue)
    var j = 0
    while (j < n) {
      val x = arr.getLong(j) & 0x7FFFFFFFL
      var i = 0
      while (i < numPerm) {
        val v = (x * as(i) + bs(i)) % 2147483647L
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$numPerm];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  long $x = $c.getLong($j) & 0x7FFFFFFFL;
         |  for (int $i = 0; $i < $numPerm; $i++) {
         |    long $v = ($x * $asRef[$i] + $bsRef[$i]) % 2147483647L;
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  /** Same coefficient derivation as the composed form — signatures match. */
  def coefficients(numPerm: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rng = new scala.util.Random(seed)
    val as = Array.fill(numPerm)((rng.nextInt(Int.MaxValue - 1) + 1).toLong | 1L)
    val bs = Array.fill(numPerm)(rng.nextInt(Int.MaxValue).toLong)
    (as, bs)
  }

  def apply(baseHashes: Column, numPerm: Int, seed: Long = 42L): Column =
    bridge.column(new MinHashSigExpr(bridge.expression(baseHashes), numPerm, seed))
}
