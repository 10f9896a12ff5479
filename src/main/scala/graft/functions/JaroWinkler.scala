package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Standard Jaro-Winkler similarity (Winkler 1990) as a fused Catalyst
  * expression — the record-linkage companion to the edit-distance ≤ 1
  * fuzzy join: match window ⌊max(|s|,|t|)/2⌋ − 1, transpositions halved,
  * Winkler prefix boost `j + min(4, ℓ)·0.1·(1 − j)` applied only above
  * the 0.7 boost threshold. Empty-vs-anything scores 0, equal non-empty
  * strings 1 — the conventions DuckDB's `jaro_winkler_similarity` uses,
  * so results are oracle-exact cross-engine (q246).
  *
  * Codegen emits one static call into [[JaroWinklerImpl]] (scratch match
  * bitmaps are two small arrays per call, lengths ≤ the strings'), so
  * blocked-pair scoring stays inside whole-stage codegen like the other
  * fused string expressions.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler_similarity needs two string inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler_similarity"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerImpl.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinklerImpl.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinklerSim =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {
  def apply(a: Column, b: Column): Column =
    bridge.column(new JaroWinklerSim(bridge.expression(a), bridge.expression(b)))
}

object JaroWinklerImpl {

  def compute(a: UTF8String, b: UTF8String): Double = {
    val s = a.toString; val t = b.toString
    val j = jaro(s, t)
    if (j <= 0.7) j
    else {
      val max = math.min(4, math.min(s.length, t.length))
      var p = 0
      while (p < max && s.charAt(p) == t.charAt(p)) p += 1
      j + p * 0.1 * (1.0 - j)
    }
  }

  private def jaro(s: String, t: String): Double = {
    val ls = s.length; val lt = t.length
    if (ls == 0 || lt == 0) return 0.0
    if (s == t) return 1.0
    val window = math.max(0, math.max(ls, lt) / 2 - 1)
    val sm = new Array[Boolean](ls)
    val tm = new Array[Boolean](lt)
    var matches = 0
    var i = 0
    while (i < ls) {
      val hi = math.min(lt - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!tm(j) && s.charAt(i) == t.charAt(j)) {
          sm(i) = true; tm(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var k = 0
    i = 0
    while (i < ls) {
      if (sm(i)) {
        while (!tm(k)) k += 1
        if (s.charAt(i) != t.charAt(k)) trans += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / ls + m / lt + (m - trans / 2.0) / m) / 3.0
  }
}
