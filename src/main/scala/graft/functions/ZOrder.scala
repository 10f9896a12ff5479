package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) curve value for two dimensions — the clustering key
  * behind [[graft.io.Sinks.zOrderedParquet]].
  *
  * Bit i of x lands at bit 2i, bit i of y at bit 2i+1, so sorting by the
  * z-value lays rows out along a space-filling curve: any file/row-group
  * covering a contiguous z range covers a small TILE of (x, y) space, and
  * its parquet min/max stats are tight on BOTH columns. That is the
  * 100 TB point of this function — single-column range clustering
  * ([[graft.io.Sinks.clusteredParquet]]) gives tight stats on one key and
  * useless stats on every other, while z-ordering lets a reader skip
  * files/row groups for predicates on either dimension (the same layout
  * trick Delta/Iceberg expose as OPTIMIZE ZORDER BY).
  *
  * Domain: inputs are masked to their low 31 bits, so the mapping is
  * order-preserving on [0, 2^31) per dimension — bucketized/positive keys
  * (ids, epoch days, price cents). The result uses bits 0..61 and is
  * always a non-negative long. Negative inputs would need an
  * order-flipping bias (x ^ Int.MinValue) BEFORE the mask; callers with
  * signed dimensions must apply it themselves, keeping this expression's
  * arithmetic exactly mirrorable in the DuckDB oracle.
  *
  * A fused codegen expression rather than a composed column for the same
  * reason as [[CosineSimilarity]]: the bit-spread is a per-row hot loop at
  * write time (every row of a 100 TB table passes through it once), and
  * the composed form (31 shift/mask/or terms) would be interpreted.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  // ImplicitCastInputTypes (not a manual check) so SQL-side int literals /
  // int columns coerce to bigint in the analyzer.
  override def inputTypes: Seq[bridge.AbstractType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.zValue(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // Bit-twiddling emitted INLINE (no helper-object call): generated
      // code referencing Scala objects is where round 5's MODULE$ codegen
      // bug lived, and six masks per side is cheaper than a call anyway.
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      def spread(v: String): String =
        s"""
           |$v &= 0x7FFFFFFFL;
           |$v = ($v | ($v << 16)) & 0x0000FFFF0000FFFFL;
           |$v = ($v | ($v << 8))  & 0x00FF00FF00FF00FFL;
           |$v = ($v | ($v << 4))  & 0x0F0F0F0F0F0F0F0FL;
           |$v = ($v | ($v << 2))  & 0x3333333333333333L;
           |$v = ($v | ($v << 1))  & 0x5555555555555555L;
         """.stripMargin
      s"""
         |long $x = $a;
         |long $y = $b;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  /** Spread the low 31 bits of v to even bit positions (Morton spread). */
  private def spread(v0: Long): Long = {
    var v = v0 & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Reference implementation shared by nullSafeEval and specs. */
  def zValue(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Column builder; inputs are cast to bigint. */
  def apply(x: Column, y: Column): Column =
    bridge.column(new InterleaveBits(
      bridge.expression(x.cast("bigint")),
      bridge.expression(y.cast("bigint"))))
}
