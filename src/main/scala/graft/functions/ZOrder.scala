package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

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

/** N-dimension Morton interleave (VERDICT r7 item 5 — the 2-key
  * [[InterleaveBits]] generalized): bit i of dimension d lands at bit
  * i*n + d, each dimension contributing its low ⌊63/n⌋ bits, so the
  * result is order-preserving per dimension on [0, 2^⌊63/n⌋) and always
  * a non-negative long. n=2 reproduces [[InterleaveBits]] bit-for-bit
  * (31 bits/dim); n=3 → 21 bits/dim, n=4 → 15 — the standard trade:
  * more clustered dimensions, coarser per-dimension resolution.
  *
  * The child is ONE fused `array<bigint>` (built by the column helper
  * from the key columns) so the expression stays a [[UnaryExpression]]
  * with standard null-safe codegen; a NULL element yields a NULL
  * z-value, matching the binary form's null semantics. The inner loop is
  * ⌊63/n⌋·n ≤ 63 shift-or steps of generated Java — still branch-free
  * per row, no virtual calls (the write-time hot-loop requirement that
  * motivated the fused 2-ary form).
  */
case class InterleaveBitsN(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 2 && n <= 16, s"interleave_bits_n supports 2..16 dimensions, got $n")
  private val bits = 63 / n
  private val mask = (1L << bits) - 1L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"interleave_bits_n needs array<bigint> input, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true // a NULL element nulls the z-value
  override def prettyName: String = "interleave_bits_n"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (arr.numElements() != n) return null
    var z = 0L
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return null
      val v = arr.getLong(d) & mask
      var b = 0
      while (b < bits) { z |= ((v >> b) & 1L) << (b * n + d); b += 1 }
      d += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val z = ctx.freshName("z")
      val v = ctx.freshName("v")
      val b = ctx.freshName("b")
      val d = ctx.freshName("d")
      val bad = ctx.freshName("bad")
      s"""
         |long $z = 0L;
         |boolean $bad = $c.numElements() != $n;
         |for (int $d = 0; !$bad && $d < $n; $d++) {
         |  if ($c.isNullAt($d)) { $bad = true; break; }
         |  long $v = $c.getLong($d) & ${mask}L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $z |= (($v >> $b) & 1L) << ($b * $n + $d);
         |  }
         |}
         |if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $z; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): InterleaveBitsN =
    copy(child = newChild)
}

object InterleaveBitsN {

  /** Reference implementation shared by nullSafeEval and specs. */
  def zValueN(xs: Array[Long]): Long = {
    val n = xs.length
    val bits = 63 / n
    val mask = (1L << bits) - 1L
    var z = 0L
    var d = 0
    while (d < n) {
      val v = xs(d) & mask
      var b = 0
      while (b < bits) { z |= ((v >> b) & 1L) << (b * n + d); b += 1 }
      d += 1
    }
    z
  }

  /** Column builder over N key columns (each cast to bigint). Two columns
    * route to the magic-mask [[InterleaveBits]] — bit-identical and a few
    * instructions faster per row. */
  def apply(cols: Seq[Column]): Column = {
    require(cols.size >= 2, s"z-ordering needs at least 2 key columns, got ${cols.size}")
    if (cols.size == 2) InterleaveBits(cols(0), cols(1))
    else bridge.column(new InterleaveBitsN(
      bridge.expression(org.apache.spark.sql.functions.array(cols.map(_.cast("bigint")): _*)),
      cols.size))
  }

  /** SCHEMA-AWARE z-key over named columns of `df` — the layout
    * writers' entry ([[graft.io.Sinks.zOrderedParquet]], compaction's
    * zOrder path, the advisor's apply step). Raw bit-interleaving needs
    * every dimension to spread uniformly over the SAME domain; real
    * columns don't — a quality score packs [0, 1) (cast-to-bigint
    * collapses it to one value), a skewed id leaves most bits constant,
    * and a dimension whose values vary in HIGHER bit positions than its
    * partners silently dominates the curve (the layout degrades to
    * single-key clustering on it). So every numeric/timestamp dimension
    * is mapped to its RANK — a quantile-bin index from ONE
    * `approxQuantile` pass (boundaries are write-time constants,
    * dims × bins doubles on the driver; the range-id-per-column shape
    * Delta's OPTIMIZE ZORDER uses) — and the bins interleave with
    * uniform per-dimension resolution regardless of type, scale or
    * skew; only non-numeric dimensions keep the historic
    * cast-to-bigint. The extra pass is write-time only and one
    * aggregation — the layout trade a 100 TB table gladly makes. */
  def forFrame(
      df: org.apache.spark.sql.DataFrame, names: Seq[String],
      bins: Int = 4096): Column = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    require(bins >= 2, s"need at least 2 bins, got $bins")
    // clamp by the per-dimension bit budget; the shift is computed in
    // Long (63/2 = 31 would overflow an Int shift)
    val b = math.min(bins.toLong, 1L << math.min(62, 63 / names.size)).toInt
    val quantiled: Set[String] = names.filter { nm =>
      df.schema(nm).dataType match {
        case _: NumericType | TimestampType => true
        case _ => false
      }
    }.toSet
    val bounds: Map[String, Array[Double]] =
      if (quantiled.isEmpty) Map.empty
      else {
        val qNames = quantiled.toSeq
        val probs = (1 until b).map(_.toDouble / b).toArray
        val casted = df.select(qNames.zipWithIndex.map { case (nm, i) =>
          col(nm).cast("double").as(s"__graft_q$i")
        }: _*)
        val qs = casted.stat.approxQuantile(
          qNames.indices.map(i => s"__graft_q$i").toArray, probs, 1.0 / (4.0 * b))
        qNames.zip(qs).toMap
      }
    apply(names.map { nm =>
      if (quantiled(nm)) QuantileBin(col(nm), bounds(nm))
      else col(nm).cast("bigint")
    })
  }
}

/** Quantile-bin index of a double against a FIXED boundary array — the
  * per-dimension key behind [[InterleaveBitsN.forFrame]]'s quantile-
  * binned z-order. Returns the number of boundaries ≤ the value (upper
  * bound by binary search), i.e. a bin in [0, boundaries.length]. The
  * boundaries are a write-time constant (one approxQuantile pass),
  * carried as a codegen reference object; the search is emitted inline
  * (no Scala-object call from generated code — the round-5 MODULE$
  * lesson). NaN compares greatest (java.lang.Double.compare), landing
  * in the last bin — consistent with Spark ordering and the typed
  * manifest's 'F' domain. */
case class QuantileBin(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[bridge.AbstractType] = Seq(org.apache.spark.sql.types.DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_bin"

  override def nullSafeEval(input: Any): Any =
    QuantileBin.binOf(input.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("quantileBounds", boundaries, "double[]")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = $ref.length;
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if (java.lang.Double.compare($c, $ref[$mid]) >= 0) $lo = $mid + 1;
         |  else $hi = $mid;
         |}
         |${ev.value} = (long) $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantileBin =
    copy(child = newChild)
}

object QuantileBin {

  /** Reference implementation shared by nullSafeEval and specs: count of
    * boundaries ≤ d (upper bound; NaN greatest). */
  def binOf(d: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (java.lang.Double.compare(d, bounds(mid)) >= 0) lo = mid + 1
      else hi = mid
    }
    lo.toLong
  }

  def apply(c: Column, bounds: Array[Double]): Column =
    bridge.column(new QuantileBin(bridge.expression(c.cast("double")), bounds))
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
