package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization kernel — the canonical-composition pass every
  * tokenizer pipeline runs before anything byte-sensitive (dedup digests,
  * shingles, BPE pretokens): a decomposed "e =" + combining acute and the
  * precomposed "é" are the SAME text to a reader but different bytes to
  * every hash in this engine. NFC (UAX #15 canonical composition — NOT
  * NFKC, which also folds compatibility characters like ligatures and
  * full-width forms and is lossy) is the conservative standard choice.
  *
  * The kernel is the JDK's `java.text.Normalizer` (ICU-derived, UAX #15
  * conformant — the same algorithm DuckDB's `nfc_normalize` implements,
  * which is what makes the oracle replay exact); the fast path skips
  * allocation entirely when the input is already NFC (`isNormalized` is a
  * cheap scan, and ASCII — most corpus bytes — short-circuits it).
  */
object NormalizeKernel {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** text → NFC-normalized text (null-intolerant, codegen'd). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    NormalizeKernel.nfc(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormalizeKernel.nfc($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
