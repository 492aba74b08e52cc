package graft

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_16BE, UTF_16LE, UTF_8}

import graft.functions.{CharsetKernel, HttpDecodeKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class CharsetDecodeSpec extends SparkTestBase {

  private val sjis = Charset.forName("Shift_JIS")

  private def sniffName(b: Array[Byte], ct: String): (String, String) = {
    val (cs, src) = CharsetKernel.sniff(b, 0, b.length, ct)
    (cs.name().toLowerCase(java.util.Locale.ROOT), src)
  }

  test("cascade order: BOM beats header beats meta beats validity (WHATWG)") {
    val sjisBody = "\u30c6\u30b9\u30c8".getBytes(sjis)
    // BOM outranks a (stale) transport declaration \u2014 the misconfigured-
    // server case browsers decode by BOM
    val bomAndHeader = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "hi".getBytes(UTF_8)
    assert(sniffName(bomAndHeader, "text/html; charset=ISO-8859-1") === ("utf-8", "bom"))
    // header wins even when a meta tag disagrees
    val metaAndHeader = ("<meta charset=\"utf-8\">x").getBytes(ISO_8859_1)
    assert(sniffName(metaAndHeader, "text/html; charset=Shift_JIS") ===
      ("shift_jis", "header"))
    // meta wins when neither BOM nor header
    val metaBody = "<html><meta http-equiv=\"Content-Type\" content=\"text/html; charset=shift_jis\"></html>"
      .getBytes(ISO_8859_1)
    assert(sniffName(metaBody, null) === ("shift_jis", "meta"))
    // validity, then fallback
    assert(sniffName("d\u00e9j\u00e0".getBytes(UTF_8), null) === ("utf-8", "utf8"))
    assert(sniffName("caf\u00e9".getBytes(ISO_8859_1), null) === ("windows-1252", "fallback"))
    assert(sniffName(sjisBody, "text/html; charset=Shift_JIS")._1 === "shift_jis")
  }

  test("header param parsing: other params and quoted values never match") {
    // charset= inside ANOTHER parameter's quoted value must not match
    assert(CharsetKernel.headerCharset(
      "multipart/form-data; boundary=\"xx; charset=utf-16le\"") === null)
    // a differently-named parameter must not substring-match
    assert(CharsetKernel.headerCharset("text/html; nocharset=utf-16le") === null)
    // and the real parameter still does, case-insensitively, quoted or not
    assert(CharsetKernel.headerCharset(
      "multipart/x; boundary=\"a b\"; CHARSET=shift_jis").name() === "Shift_JIS")
  }

  test("meta prescan: comments stripped, attribute-scoped, http-equiv content") {
    def meta(s: String): Charset =
      CharsetKernel.metaCharset(s.getBytes(ISO_8859_1), 0, s.length)
    // commented-out legacy declaration is ignored
    assert(meta("<!-- <meta charset=shift_jis> --><p>x</p>") === null)
    // unterminated comment swallows the rest of the prelude
    assert(meta("<!-- <meta charset=shift_jis>") === null)
    // charset= inside a description string is NOT a declaration
    assert(meta("<meta name=\"description\" content=\"use charset=euc-jp here\">") === null)
    // http-equiv content-type DOES declare through its content param
    assert(meta("<meta http-equiv=Content-Type content=\"text/html; charset=shift_jis\">")
      === sjis)
    // plain charset attribute, unquoted and quoted
    assert(meta("<meta charset=shift_jis>") === sjis)
    assert(meta("<meta charset='shift_jis'/>") === sjis)
    // a comment BEFORE a real declaration does not mask it
    assert(meta("<!-- old --><meta charset=shift_jis>") === sjis)
  }

  test("label resolution: WHATWG latin-1 promotion, quotes, unknown labels") {
    assert(CharsetKernel.resolve("ISO-8859-1").name() === "windows-1252")
    assert(CharsetKernel.resolve("us-ascii").name() === "windows-1252")
    assert(CharsetKernel.resolve("latin1").name() === "windows-1252")
    assert(CharsetKernel.resolve("\"UTF-8\"").name() === "UTF-8")
    assert(CharsetKernel.resolve("'Shift_JIS'").name() === "Shift_JIS")
    assert(CharsetKernel.resolve("x-klingon") === null)
    assert(CharsetKernel.resolve("") === null)
    // header param extraction: quoted, trailing params, case
    assert(CharsetKernel.headerCharset("text/html; CHARSET=\"shift_jis\"; boundary=x")
      .name() === "Shift_JIS")
    assert(CharsetKernel.headerCharset("text/html") === null)
    assert(CharsetKernel.headerCharset(null) === null)
  }

  test("BOMs: all five, UTF-32 before UTF-16LE, stripped after decode") {
    def bom(bytes: Int*): Array[Byte] = bytes.map(_.toByte).toArray
    assert(CharsetKernel.bomCharset(bom(0xef, 0xbb, 0xbf, 0x41), 0, 4)._1 === UTF_8)
    assert(CharsetKernel.bomCharset(bom(0xfe, 0xff, 0, 0x41), 0, 4)._1 === UTF_16BE)
    assert(CharsetKernel.bomCharset(bom(0xff, 0xfe, 0x41, 0), 0, 4)._1 === UTF_16LE)
    assert(CharsetKernel.bomCharset(bom(0xff, 0xfe, 0, 0), 0, 4)._1.name() === "UTF-32LE")
    assert(CharsetKernel.bomCharset(bom(0, 0, 0xfe, 0xff), 0, 4)._1.name() === "UTF-32BE")
    assert(CharsetKernel.bomCharset("plain".getBytes(UTF_8), 0, 5)._1 === null)
    // decode strips exactly one leading U+FEFF
    val b = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++ "x".getBytes(UTF_8)
    assert(CharsetKernel.decodeWith(b, 0, b.length, UTF_8) === "x")
  }

  test("meta prescan: 1024-byte window, wide labels read as UTF-8") {
    val early = ("<meta charset=utf-8>" + "a" * 2000).getBytes(ISO_8859_1)
    assert(CharsetKernel.metaCharset(early, 0, early.length) === UTF_8)
    val late = ("a" * 1024 + "<meta charset=shift_jis>").getBytes(ISO_8859_1)
    assert(CharsetKernel.metaCharset(late, 0, late.length) === null)
    // WHATWG: a meta READABLE as ASCII cannot be utf-16
    val wide = "<meta charset=\"utf-16le\">".getBytes(ISO_8859_1)
    assert(CharsetKernel.metaCharset(wide, 0, wide.length) === UTF_8)
  }

  test("strict UTF-8 validity: overlongs, surrogates, truncation, astral") {
    def v(bytes: Int*): Boolean = {
      val a = bytes.map(_.toByte).toArray
      CharsetKernel.utf8Valid(a, 0, a.length)
    }
    assert(v('a', 'b'))
    assert(v(0xc3, 0xa9)) // \u00e9
    assert(v(0xe4, 0xb8, 0x96)) // \u4e16
    assert(v(0xf0, 0x9f, 0x98, 0x80)) // astral emoji
    assert(!v(0xc0, 0xaf)) // overlong '/'
    assert(!v(0xe0, 0x80, 0x80)) // overlong
    assert(!v(0xed, 0xa0, 0x80)) // surrogate
    assert(!v(0xf4, 0x90, 0x80, 0x80)) // beyond U+10FFFF
    assert(!v(0xc3)) // truncated tail
    assert(!v(0x80)) // bare continuation
    assert(!v(0xf5, 0x80, 0x80, 0x80)) // invalid lead
  }

  test("HttpDecode kernel: CRLF + bare-LF envelopes, torn, charset param") {
    def row(payload: String, cs: Charset = ISO_8859_1) =
      HttpDecodeKernel.decode(payload.getBytes(cs))
    val r = row("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\n\r\ncaf\u00e9")
    assert(r.getLong(0) === 200L)
    assert(r.getUTF8String(1).toString === "text/html")
    assert(r.getUTF8String(2).toString === "windows-1252")
    assert(r.getUTF8String(3).toString === "header")
    assert(r.getUTF8String(4).toString === "caf\u00e9")
    // bare-LF termination; body containing CRLFCRLF must stay in the body
    val lf = row("HTTP/1.1 404 No\nContent-Type: a/b\n\nx\r\n\r\ny")
    assert(lf.getLong(0) === 404L)
    assert(lf.getUTF8String(4).toString === "x\r\n\r\ny")
    // torn: all null
    val torn = row("HTTP/1.1 200 OK\r\nNo-Terminator: here")
    assert((0 until 5).forall(torn.isNullAt))
    // non-HTTP status line: null status, headers still scanned
    val weird = row("ICY 200 OK\r\nContent-Type: audio/mpeg\r\n\r\nz")
    assert(weird.isNullAt(0))
    assert(weird.getUTF8String(1).toString === "audio/mpeg")
    // Shift_JIS declared and decoded
    val jp = HttpDecodeKernel.decode(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=Shift_JIS\r\n\r\n".getBytes(ISO_8859_1) ++
        "\u3053\u3093\u306b\u3061\u306f".getBytes(sjis))
    assert(jp.getUTF8String(4).toString === "\u3053\u3093\u306b\u3061\u306f")
  }

  test("malformed bytes under a declared charset decode to U+FFFD, never throw") {
    // 0xFF 0x41 0xFE: invalid UTF-8 but NOT a BOM prefix (FF FE would
    // legitimately win as a UTF-16LE BOM under the WHATWG order)
    val bad = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n".getBytes(ISO_8859_1) ++
      Array(0xff.toByte, 0x41.toByte, 0xfe.toByte)
    val r = HttpDecodeKernel.decode(bad)
    assert(r.getUTF8String(2).toString === "utf-8")
    assert(r.getUTF8String(3).toString === "header")
    assert(r.getUTF8String(4).toString === "\ufffdA\ufffd")
  }

  test("CharsetDecode kernel + Spark expressions (codegen path)") {
    val r = CharsetKernel.decode("caf\u00e9".getBytes(ISO_8859_1),
      UTF8String.fromString("text/plain; charset=iso-8859-1"))
    assert(r.getUTF8String(0).toString === "windows-1252")
    assert(r.getUTF8String(2).toString === "caf\u00e9")
    // through the session: SQL registration + codegen evaluation
    import spark.implicits._
    graft.functions.GraftFunctionRegistry.register(spark)
    val df = Seq(
      ("caf\u00e9", "iso-8859-1"),
      ("\u3053\u3093", "shift_jis"))
      .toDF("text", "cs")
      .select(col("text"), col("cs"),
        graft.text.TextAnalysis.decodeCharset(
          // re-encode through the declared charset: the wire bytes
          encodeVia(col("text"), col("cs")), concat(lit("x/y; charset="), col("cs"))).as("d"))
    val out = df.select(col("text"), col("d.text").as("decoded"),
      col("d.charset_source").as("src")).collect()
    assert(out.forall(r0 => r0.getString(0) === r0.getString(1)))
    assert(out.forall(_.getString(2) === "header"))
    // SQL surface
    val sql = spark.sql(
      "SELECT http_decode(CAST(concat('HTTP/1.1 200 OK\r\n\r\nbody') AS BINARY)).body AS b").collect()
    assert(sql.head.getString(0) === "body")
  }

  /** Encode a string column through an arbitrary charset on the executor
    * (test-only UDF \u2014 the library itself never needs arbitrary-charset
    * ENCODING, only decoding).
    */
  private def encodeVia(text: org.apache.spark.sql.Column, cs: org.apache.spark.sql.Column) =
    udf((t: String, c: String) => t.getBytes(Charset.forName(c))).apply(text, cs)
}
