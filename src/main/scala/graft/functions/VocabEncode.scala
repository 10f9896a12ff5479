package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer-encode kernel as ONE codegen'd expression:
  * `array<string>` tokens → `struct<ids: array<int>, n_oov: bigint>`,
  * unknown (or null) tokens counted as OOV and emitted as the 0 sentinel.
  *
  * This is the hot inner loop of [[graft.ops.Membership
  * .encodeTokensBroadcast]]. The previous form was an encoder-backed
  * `mapPartitions`: every row paid UTF8String→java.lang.String decode per
  * token plus a full serialize/deserialize boundary that split whole-stage
  * codegen. Here the vocabulary table is keyed by [[UTF8String]] directly
  * — tokens are hashed as the raw bytes the scan produced, zero decode,
  * zero boundary: tokenize → encode → downstream projection is one
  * compiled stage.
  *
  * The vocabulary rides IN the expression (plan-serialized, broadcast once
  * per stage with the task binary — the same one-shot cost profile as an
  * explicit `sparkContext.broadcast`, without the extra moving part). The
  * caller guards size (≤2M entries); beyond that the shuffle-join form is
  * the path, as before.
  */
case class VocabEncodeExpr(child: Expression, words: Seq[String], ids: Seq[Int])
    extends UnaryExpression {
  require(words.length == ids.length, "words and ids must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vocab_encode needs array<string> input, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("n_oov", LongType, nullable = false)))

  override def prettyName: String = "vocab_encode"

  @transient private lazy val table: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](words.length * 2)
    var i = 0
    while (i < words.length) {
      m.put(UTF8String.fromString(words(i)), Integer.valueOf(ids(i)))
      i += 1
    }
    m
  }

  /** Shared eval/codegen kernel (called from generated code via the
    * plan-carried reference object). A miss leaves the 0 sentinel in
    * place and counts OOV — the miss is the count, not the sentinel. */
  def encode(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val out = new Array[Int](n)
    var oov = 0L
    var i = 0
    while (i < n) {
      val v = if (arr.isNullAt(i)) null else table.get(arr.getUTF8String(i))
      if (v == null) oov += 1 else out(i) = v.intValue()
      i += 1
    }
    new GenericInternalRow(Array[Any](UnsafeArrayData.fromPrimitiveArray(out), oov))
  }

  override def nullSafeEval(input: Any): Any = encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabEncode", this, classOf[VocabEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): VocabEncodeExpr =
    copy(child = newChild)
}

object VocabEncodeExpr {
  def apply(tokens: Column, entries: Seq[(String, Int)]): Column =
    bridge.column(new VocabEncodeExpr(
      bridge.expression(tokens), entries.map(_._1), entries.map(_._2)))
}
