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
  * which is what makes the oracle replay exact); an all-ASCII input —
  * most corpus bytes — is detected on the raw UTF-8 bytes and returned as
  * the SAME instance (no UTF-16 decode, no allocation), and already-NFC
  * non-ASCII input returns the same instance after the `isNormalized`
  * scan.
  */
object NormalizeKernel {

  def nfc(s: UTF8String): UTF8String = {
    // ASCII fast path on the raw UTF-8 bytes: all-ASCII is NFC by
    // construction, and most corpus bytes are — returning the same
    // instance skips the UTF-16 decode AND the String allocation that
    // `toString` would pay on every row of the hot pre-tokenizer path
    var i = 0
    val n = s.numBytes
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
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
