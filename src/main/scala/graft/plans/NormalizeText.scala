package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus preprocessing — the very first
  * hop of every LLM data pipeline (two byte-different spellings of the same
  * word must collide before any dedup/fingerprint/token stage sees them):
  *
  *   - [[NfcNormalize]]: canonical composition (NFC). A decomposed
  *     "a" + U+0301 and the precomposed "á" (U+00E1) become the same bytes,
  *     so hashes, group-bys, joins and shingles agree across sources that
  *     emit different-but-canonically-equal encodings.
  *   - [[StripAccents]]: NFD-decompose, drop non-spacing marks (Unicode
  *     category Mn), re-compose. "ñüé" → "nue" — the aggressive ASCII-fold
  *     used for matching/fingerprint keys (DuckDB `strip_accents`,
  *     Lucene `ASCIIFoldingFilter` are the public analogues).
  *
  * Both are codegen'd scalar expressions (no UDF serialization overhead)
  * with an all-ASCII fast path: `Normalizer.isNormalized` is O(n) with no
  * allocation, and synthetic/web corpora are overwhelmingly ASCII, so the
  * common row costs one scan and returns the input UTF8String unchanged.
  * Per-row work is embarrassingly parallel — no shuffle implications at any
  * scale.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NormalizeText.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_accents expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(s: Any): Any =
    NormalizeText.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeText.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object NormalizeText {
  /** Canonical composition; returns the input object untouched when already
    * NFC (the ASCII fast path — no allocation).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** True for the mark categories utf8proc STRIPMARK removes: non-spacing
    * (Mn), spacing combining (Mc — e.g. Devanagari vowel signs), and
    * enclosing (Me) marks. Mn alone would diverge from DuckDB
    * `strip_accents` on scripts whose vowel signs are Mc.
    */
  private def isMark(c: Char): Boolean = Character.getType(c) match {
    case Character.NON_SPACING_MARK | Character.COMBINING_SPACING_MARK |
         Character.ENCLOSING_MARK => true
    case _ => false
  }

  /** NFD → drop combining marks (categories Mn/Mc/Me) → NFC, matching the
    * public `strip_accents` semantics (utf8proc stripmark). ASCII fast path
    * as above: an NFC string with no marks to strip is returned unchanged.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (isMark(d.charAt(i))) hasMark = true
      i += 1
    }
    if (!hasMark) return nfc(s)
    val sb = new java.lang.StringBuilder(d.length)
    i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (!isMark(c)) sb.append(c)
      i += 1
    }
    UTF8String.fromString(Normalizer.normalize(sb, Normalizer.Form.NFC))
  }
}
