package graft.llm

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical/compatibility normalization as native codegen'd
  * expressions.
  *
  * Crawl text arrives with the SAME grapheme spelled many ways —
  * 'é' as U+00E9 or as 'e' + combining U+0301, ligatures, fullwidth
  * forms — and every downstream operator that hashes, shingles, or
  * equality-joins on text (exact dedup, MinHash, decontamination,
  * URL anchors) silently under-merges unless the corpus is first
  * folded to one canonical form. The JDK's `java.text.Normalizer`
  * implements the Unicode standard (UAX #15) forms; wrapping it as a
  * Catalyst `Expression` keeps the normalization inside whole-stage
  * codegen instead of a Scala UDF boundary.
  *
  * NFC is the web-canonical form (and the one the DuckDB oracle can
  * mirror via `nfc_normalize`); NFKC additionally folds
  * compatibility characters (ligatures, fullwidth, superscripts) —
  * the form tokenizer pipelines typically want — and is pinned by
  * spec since the oracle lacks an NFKC primitive.
  */
object UnicodeNorm {
  /** NFC with an is-normalized fast path: for the (dominant) ASCII /
    * already-composed case `isNormalized` is a scan with no
    * allocation, so the common row costs no copy at all.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfkc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFKC)) s
    else UTF8String.fromString(
      Normalizer.normalize(str, Normalizer.Form.NFKC))
  }
}

/** string → string Unicode NFC normalization (UAX #15). */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.UnicodeNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalizeExpr = copy(child = newChild)
}

/** string → string Unicode NFKC normalization (compatibility fold). */
case class NfkcNormalizeExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNorm.nfkc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.llm.UnicodeNorm.nfkc($c)")
  override protected def withNewChildInternal(newChild: Expression)
      : NfkcNormalizeExpr = copy(child = newChild)
}
