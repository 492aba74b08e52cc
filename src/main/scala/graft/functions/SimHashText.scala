package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

object SimHashTextKernel {
  private val md5 = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 as a long — bit-identical to Spark SQL
    * `conv(substring(md5(t), 1, 15), 16, 10)` and DuckDB
    * `CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)`.
    */
  def tokenHash(tok: String): Long = {
    val digest = md5.get()
    digest.reset()
    val bytes = digest.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 15) {
      val b = bytes(i / 2) & 0xff
      val nibble = if (i % 2 == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  /** Tokenize + md5-hash + simhash in one pass (same result as
    * [[SimHash64]] over the HOF-computed hash array, ~10x faster).
    */
  def simhash(text: UTF8String, nbits: Int): Long = {
    val toks = ShingleKernel.tokenize(text)
    val counts = new Array[Int](nbits)
    var t = 0
    while (t < toks.length) {
      val h = tokenHash(toks(t))
      var b = 0
      while (b < nbits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var out = 0L
    var b = 0
    while (b < nbits) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** text → 60-bit SimHash over md5-derived whitespace-token hashes. */
case class SimHashText(child: Expression, nbits: Int = 60) extends UnaryExpression {
  require(nbits > 0 && nbits <= 60, "nbits must be in 1..60 (md5-15-hex-derived)")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_text"

  override def nullSafeEval(a: Any): Any =
    SimHashTextKernel.simhash(a.asInstanceOf[UTF8String], nbits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHashTextKernel.simhash($a, $nbits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
