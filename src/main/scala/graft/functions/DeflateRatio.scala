package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal as a fused Catalyst expression:
  * deflate(text).bytes / text.bytes — the Gopher/MassiveText-family
  * repetitiveness gate (boilerplate and template spam compress far below
  * natural prose, so a LOW ratio flags junk that n-gram heuristics
  * miss). Empty text scores 1.0 (nothing to judge).
  *
  * Per-row cost is one raw-deflate pass over the document with a
  * thread-local reused `Deflater` (no per-row native allocation); the
  * compressed bytes are counted, never materialized. Deterministic for a
  * given JVM's zlib, which is why the q234 consumer is rows-only +
  * spec-pinned rather than DuckDB-oracled.
  */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio needs a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    DeflateRatio.ratioOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateRatio$$.MODULE$$.ratioOf($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

object DeflateRatio {

  // level 6 (zlib default), raw deflate (nowrap: no 6-byte header skewing
  // tiny docs); one Deflater per executor thread, reset per row
  private val local: ThreadLocal[Deflater] = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6, true)
  }

  def ratioOf(s: UTF8String): Double = {
    val in = s.getBytes
    if (in.length == 0) return 1.0
    val d = local.get()
    d.reset()
    d.setInput(in)
    d.finish()
    val buf = new Array[Byte](8192)
    var out = 0L
    while (!d.finished()) out += d.deflate(buf)
    out.toDouble / in.length
  }

  def apply(c: Column): Column = bridge.column(DeflateRatioExpr(bridge.expression(c)))
}
