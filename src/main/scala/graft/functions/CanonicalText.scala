package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for dedup keys, fused into one expression:
  * NFC normalization (é composed vs e+◌́ decomposed must hash equal) →
  * ROOT-locale casefold → every whitespace char to a space → strip
  * everything but letters/numbers/space → collapse space runs → trim.
  *
  * This is the standard pre-hash step of the published corpus-cleaning
  * pipelines (CCNet-style normalization before dedup): exact dedup over
  * RAW bytes misses trivially-reformatted duplicates, and near-dup
  * pipelines waste candidate budget on case/punctuation variants. Running
  * it as a codegen'd Catalyst expression keeps the whole dedup signature
  * chain (canonicalize → hash → group) inside one compiled stage with no
  * shuffle added.
  *
  * Every step is expressible in DuckDB (`nfc_normalize`, `lower`,
  * RE2 `\pL`/`\pN` classes), so canonical BYTES are oracle-checkable —
  * q122 pins md5 of the canonical form cross-engine. Locale caveat:
  * ROOT-locale lowercase and utf8proc agree on the fixture corpus and on
  * ASCII generally; known divergent code points (İ, ß full-casefold) are
  * outside the oracle's data.
  */
case class CanonicalTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"canonical_text needs string input, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_text"

  override def nullSafeEval(input: Any): Any =
    CanonicalTextExpr.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Static forwarder on the case class — not MODULE$, which Janino
    // rejects (see ShingleHashSetExpr).
    val helper = classOf[CanonicalTextExpr].getName
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $helper.canonicalize($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CanonicalTextExpr =
    copy(child = newChild)
}

object CanonicalTextExpr {

  private val Whitespace = Pattern.compile("\\s")
  private val NonWord = Pattern.compile("[^\\p{L}\\p{N} ]")
  private val SpaceRun = Pattern.compile("  +")

  /** Shared eval/codegen kernel. Order matters: whitespace becomes spaces
    * BEFORE punctuation is stripped, so a tab still separates words
    * ("a\tb" → "a b", not "ab"). */
  def canonicalize(s: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val spaced = Whitespace.matcher(lower).replaceAll(" ")
    val stripped = NonWord.matcher(spaced).replaceAll("")
    val collapsed = SpaceRun.matcher(stripped).replaceAll(" ")
    UTF8String.fromString(collapsed.trim)
  }

  def apply(text: Column): Column =
    bridge.column(new CanonicalTextExpr(bridge.expression(text)))
}
