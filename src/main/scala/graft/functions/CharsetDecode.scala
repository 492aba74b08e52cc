package graft.functions

import java.nio.charset.{Charset, StandardCharsets}
import java.util.Locale

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Charset sniffing + decoding for raw crawl payloads — the step between
  * the WARC source's `payload` bytes and every text operator downstream.
  *
  * A large fraction of real crawl bodies is NOT UTF-8 (ISO-8859-1,
  * Windows-1252, Shift_JIS, GBK, ...); `payload.cast("string")` assumes
  * UTF-8 and mojibakes those documents silently through every digest,
  * shingle, and tokenizer that follows. This kernel runs the standard
  * detection cascade in one pass per document:
  *
  *  1. **Byte-order mark** — UTF-8 / UTF-16LE/BE / UTF-32LE/BE. The BOM
  *     outranks the transport declaration (WHATWG "decode" step 1): a
  *     BOM'd UTF-8 body behind a stale `charset=iso-8859-1` header is a
  *     common server misconfiguration, and browsers decode it by BOM.
  *  2. **Transport declaration** — a `charset=` PARAMETER of the
  *     Content-Type header value (parsed as `;`-separated parameters
  *     with quote handling — `boundary="x charset=y"` or a `nocharset=`
  *     attribute must not match), from the HTTP envelope or WARC's own
  *     header for conversion records.
  *  3. **In-document declaration** — the WHATWG prescan over the first
  *     1024 bytes: comments stripped, each `<meta>` tag's attributes
  *     scanned properly — a `charset` ATTRIBUTE, or the `charset=` param
  *     of a `content` attribute when `http-equiv=content-type` — so a
  *     commented-out legacy meta or a `charset=` inside a description
  *     string cannot hijack the document. A meta label naming a UTF-16/32
  *     family is read as UTF-8 (a meta READABLE as ASCII cannot be wide).
  *  4. **UTF-8 validity** — bytes that strictly validate are UTF-8.
  *  5. **windows-1252 fallback** — the WHATWG default; every byte
  *     sequence decodes, so nothing is dropped.
  *
  * Label resolution follows the published WHATWG encoding mappings where
  * they matter in practice: `iso-8859-1` / `us-ascii` / `latin1` labels
  * decode as windows-1252 (1252's 0x80–0x9F are real characters — curly
  * quotes, en dash — where 8859-1's are never-used controls; on bytes
  * the two agree everywhere else). Unknown labels fall through to the
  * next cascade step rather than failing the document. Malformed byte
  * sequences under the chosen charset decode to U+FFFD (the
  * java.lang.String REPLACE convention every production pipeline uses) —
  * a crawl row never throws. A leading U+FEFF is stripped after decode
  * in every path, so a BOM'd body and its BOM-less twin hash alike.
  */
object CharsetKernel {

  private val Windows1252 = Charset.forName("windows-1252")

  /** WHATWG: these labels all decode as windows-1252. */
  private val Latin1Labels = Set(
    "iso-8859-1", "iso8859-1", "iso_8859-1", "iso88591", "iso-ir-100",
    "latin1", "latin-1", "l1", "us-ascii", "ascii", "ansi_x3.4-1968",
    "cp819", "ibm819", "csisolatin1", "cp1252")

  private val MetaTagPattern = java.util.regex.Pattern.compile(
    "(?is)<meta[\\s/]([^>]{0,512})")
  private val CommentPattern = java.util.regex.Pattern.compile(
    "(?s)<!--.*?(-->|$)") // unterminated comment swallows the rest

  /** A charset LABEL → JVM Charset, or null when unknown/unsupported
    * (the cascade then falls through — an unrecognized declaration must
    * not fail the document).
    */
  def resolve(label: String): Charset = {
    var t = label.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t = t.substring(1, t.length - 1).trim
    if (t.isEmpty) return null
    if (Latin1Labels.contains(t.toLowerCase(Locale.ROOT))) return Windows1252
    try Charset.forName(t)
    catch { case _: IllegalArgumentException => null } // bad/unsupported name
  }

  /** The `charset` PARAMETER of a Content-Type header value (e.g.
    * `text/html; charset=Shift_JIS`), or null. Parsed as `;`-separated
    * `name=value` parameters with double-quote awareness, so a
    * `boundary="x; charset=y"` value or a `nocharset=` parameter name
    * never matches (raw substring search would take both).
    */
  def headerCharset(contentType: String): Charset = {
    if (contentType == null) return null
    // split on ';' outside double quotes; the first piece is the media type
    val params = Seq.newBuilder[String]
    var start = 0
    var inQuote = false
    var i = 0
    while (i < contentType.length) {
      val c = contentType.charAt(i)
      if (c == '"') inQuote = !inQuote
      else if (c == ';' && !inQuote) { params += contentType.substring(start, i); start = i + 1 }
      i += 1
    }
    params += contentType.substring(start)
    params.result().drop(1).foreach { p =>
      val eq = p.indexOf('=')
      if (eq > 0 && p.substring(0, eq).trim.equalsIgnoreCase("charset")) {
        val cs = resolve(p.substring(eq + 1).trim)
        if (cs != null) return cs
      }
    }
    null
  }

  /** (charset, bytes to skip) for a leading BOM, or (null, 0). UTF-32
    * before UTF-16LE — FF FE 00 00 prefixes FF FE.
    */
  def bomCharset(b: Array[Byte], off: Int, len: Int): (Charset, Int) = {
    def at(i: Int): Int = b(off + i) & 0xff
    if (len >= 3 && at(0) == 0xef && at(1) == 0xbb && at(2) == 0xbf)
      (StandardCharsets.UTF_8, 3)
    else if (len >= 4 && at(0) == 0xff && at(1) == 0xfe && at(2) == 0x00 && at(3) == 0x00)
      (Charset.forName("UTF-32LE"), 4)
    else if (len >= 4 && at(0) == 0x00 && at(1) == 0x00 && at(2) == 0xfe && at(3) == 0xff)
      (Charset.forName("UTF-32BE"), 4)
    else if (len >= 2 && at(0) == 0xfe && at(1) == 0xff) (StandardCharsets.UTF_16BE, 2)
    else if (len >= 2 && at(0) == 0xff && at(1) == 0xfe) (StandardCharsets.UTF_16LE, 2)
    else (null, 0)
  }

  /** Parse one tag body's attributes (lowercased name → value, FIRST
    * occurrence wins, per the WHATWG prescan): names run to `=`, space,
    * `/` or end; values are optionally single/double-quoted.
    */
  private def tagAttributes(tag: String): Map[String, String] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    while (i < tag.length) {
      while (i < tag.length && (tag.charAt(i).isWhitespace || tag.charAt(i) == '/')) i += 1
      val nameStart = i
      while (i < tag.length && !tag.charAt(i).isWhitespace &&
        tag.charAt(i) != '=' && tag.charAt(i) != '/') i += 1
      val name = tag.substring(nameStart, i).toLowerCase(Locale.ROOT)
      while (i < tag.length && tag.charAt(i).isWhitespace) i += 1
      var value = ""
      if (i < tag.length && tag.charAt(i) == '=') {
        i += 1
        while (i < tag.length && tag.charAt(i).isWhitespace) i += 1
        if (i < tag.length && (tag.charAt(i) == '"' || tag.charAt(i) == '\'')) {
          val q = tag.charAt(i); i += 1
          val vs = i
          while (i < tag.length && tag.charAt(i) != q) i += 1
          value = tag.substring(vs, i)
          if (i < tag.length) i += 1
        } else {
          val vs = i
          while (i < tag.length && !tag.charAt(i).isWhitespace) i += 1
          value = tag.substring(vs, i)
        }
      }
      if (name.nonEmpty && !out.contains(name)) out(name) = value
    }
    out.toMap
  }

  /** WHATWG-prescan charset extraction over the first 1024 bytes (read
    * as Latin-1 — the scan only needs ASCII positions): comments are
    * stripped first, then each `<meta>` tag's ATTRIBUTES are parsed — a
    * `charset` attribute wins, else the `charset=` parameter of the
    * `content` attribute when `http-equiv` is `content-type`. A
    * `charset=` inside some other attribute's string (description text,
    * a commented-out legacy tag) never matches. Wide labels → UTF-8 per
    * the WHATWG rule (see class doc).
    */
  def metaCharset(b: Array[Byte], off: Int, len: Int): Charset = {
    val n = math.min(len, 1024)
    if (n <= 0) return null
    val prelude = CommentPattern.matcher(
      new String(b, off, n, StandardCharsets.ISO_8859_1)).replaceAll(" ")
    val m = MetaTagPattern.matcher(prelude)
    while (m.find()) {
      val attrs = tagAttributes(m.group(1))
      val label = attrs.get("charset").orElse {
        if (attrs.get("http-equiv").exists(_.equalsIgnoreCase("content-type")))
          attrs.get("content").flatMap { c =>
            Option(headerCharset(c)).map(_.name())
          }
        else None
      }
      label.foreach { l =>
        val cs = resolve(l)
        if (cs != null) {
          val nm = cs.name().toLowerCase(Locale.ROOT)
          return if (nm.startsWith("utf-16") || nm.startsWith("utf-32") ||
            nm == "x-utf-32le-bom") StandardCharsets.UTF_8
          else cs
        }
      }
    }
    null
  }

  /** Strict UTF-8 validation (RFC 3629: no overlongs, no surrogates, max
    * U+10FFFF) — one branchy byte scan, no allocation.
    */
  def utf8Valid(b: Array[Byte], off: Int, len: Int): Boolean = {
    var i = off
    val end = off + len
    while (i < end) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xc2) return false // continuation byte or overlong lead
      else if (c < 0xe0) { // 2-byte
        if (i + 1 >= end || (b(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (c < 0xf0) { // 3-byte
        if (i + 2 >= end) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xe0) 0xa0 else 0x80 // no overlong
        val hi = if (c == 0xed) 0x9f else 0xbf // no surrogates
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80) return false
        i += 3
      } else if (c < 0xf5) { // 4-byte
        if (i + 3 >= end) return false
        val c1 = b(i + 1) & 0xff
        val lo = if (c == 0xf0) 0x90 else 0x80
        val hi = if (c == 0xf4) 0x8f else 0xbf
        if (c1 < lo || c1 > hi || (b(i + 2) & 0xc0) != 0x80 || (b(i + 3) & 0xc0) != 0x80)
          return false
        i += 4
      } else return false // 0xf5..0xff: beyond U+10FFFF
    }
    true
  }

  /** The cascade: (charset, which step decided). BOM first (WHATWG — it
    * outranks a possibly-stale transport declaration), then the header
    * param, the meta prescan, UTF-8 validity, and the 1252 fallback.
    */
  def sniff(b: Array[Byte], off: Int, len: Int, declaredContentType: String)
      : (Charset, String) = {
    val (fromBom, _) = bomCharset(b, off, len)
    if (fromBom != null) return (fromBom, "bom")
    val fromHeader = headerCharset(declaredContentType)
    if (fromHeader != null) return (fromHeader, "header")
    val fromMeta = metaCharset(b, off, len)
    if (fromMeta != null) return (fromMeta, "meta")
    if (utf8Valid(b, off, len)) (StandardCharsets.UTF_8, "utf8")
    else (Windows1252, "fallback")
  }

  /** Decode with the chosen charset; malformed sequences → U+FFFD (the
    * String-constructor REPLACE convention); a leading U+FEFF stripped.
    */
  def decodeWith(b: Array[Byte], off: Int, len: Int, cs: Charset): String = {
    val s = new String(b, off, len, cs)
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') s.substring(1) else s
  }

  /** (charset name, cascade step, decoded text) for a raw body + its
    * declared Content-Type value ("" = undeclared). Entry point for the
    * [[CharsetDecode]] expression (WET conversion records, or any body
    * whose envelope is already stripped).
    */
  def decode(body: Array[Byte], declared: UTF8String): InternalRow = {
    val d = if (declared == null) "" else declared.toString
    val (cs, source) = sniff(body, 0, body.length, if (d.isEmpty) null else d)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(cs.name().toLowerCase(Locale.ROOT)),
      UTF8String.fromString(source),
      UTF8String.fromString(decodeWith(body, 0, body.length, cs))))
  }
}

/** `(payload binary, content_type string) → struct(charset, charset_source,
  * text)` — run the [[CharsetKernel]] cascade and decode in one pass.
  * Pass `''` (or `coalesce(ct, '')`) when no transport declaration exists.
  */
case class CharsetDecode(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("charset", StringType, nullable = false),
    StructField("charset_source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "charset_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"charset_decode payload must be binary, got ${left.dataType.catalogString}")
    else if (right.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"charset_decode content_type must be string, got ${right.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  override def nullSafeEval(p: Any, d: Any): Any =
    CharsetKernel.decode(p.asInstanceOf[Array[Byte]], d.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (p, d) =>
      s"${ev.value} = graft.functions.CharsetKernel.decode($p, $d);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Byte-level HTTP response-envelope split + transfer/content decode +
  * charset decode in ONE kernel pass — the charset-correct form of
  * [[graft.text.TextAnalysis.httpResponse]], which (by design, for SQL
  * replay) casts the payload to string as UTF-8 BEFORE splitting and so
  * mojibakes every non-UTF-8 body. This expression splits the envelope
  * on the raw bytes (earliest of CRLFCRLF / bare-LF LFLF — lenient
  * servers emit the latter), parses the status line and Content-Type
  * from the ASCII header block, UNWRAPS the body's wire encodings, then
  * runs the [[CharsetKernel]] cascade on the final BODY BYTES with the
  * header's charset parameter as the transport declaration.
  *
  * Wire encodings — crawlers capture responses AS TRANSMITTED, so real
  * WARC payloads arrive chunked and/or compressed, and skipping this
  * step feeds chunk-size lines and gzip bytes into every digest and
  * tokenizer downstream:
  *
  *  - `Transfer-Encoding` codings are undone first (they wrap content
  *    codings on the wire), then `Content-Encoding`, each list in
  *    REVERSE order of application. Supported: `chunked` (size lines in
  *    hex with optional `;ext`, CRLF or lenient bare-LF line ends,
  *    trailers ignored), `gzip`/`x-gzip` (multi-member via the JDK
  *    reader), `deflate` (zlib-wrapped tried first, then the raw form
  *    broken servers send), `identity` (no-op).
  *  - The `encoding` output field reports what was APPLIED, in order,
  *    comma-joined (`"chunked,gzip"`), or `"identity"`. Tolerance is
  *    deliberate and VISIBLE, matching browser behavior on the same
  *    malformed inputs: a truncated chunk stream or compressed stream
  *    keeps the bytes recovered so far and marks the coding
  *    `(truncated)` (crawlers truncate long bodies mid-stream); a
  *    declared gzip/deflate whose bytes are not that format at all is
  *    skipped — body kept raw — and marked `(skipped)` (servers lie
  *    about Content-Encoding); an unparseable chunk framing keeps the
  *    raw body and marks `chunked(malformed)`. Unlike the WARC layer
  *    (which fails loudly — archive corruption is an error), a document
  *    row never throws.
  *  - An UNSUPPORTED coding (e.g. `br`: no JDK decoder) nulls the body
  *    and reports `"br(unsupported)"` — surfacing garbage-as-text into
  *    dedup would be the silent-mojibake bug all over again. Status and
  *    Content-Type still parse.
  */
object HttpDecodeKernel {

  private val StatusPattern = java.util.regex.Pattern.compile(
    "^HTTP/[0-9.]+ ([0-9]{3})")
  private val ContentTypePattern = java.util.regex.Pattern.compile(
    "(?im)^content-type:[ \\t]*([^\\r\\n]+)")
  private val TransferEncodingPattern = java.util.regex.Pattern.compile(
    "(?im)^transfer-encoding:[ \\t]*([^\\r\\n]+)")
  private val ContentEncodingPattern = java.util.regex.Pattern.compile(
    "(?im)^content-encoding:[ \\t]*([^\\r\\n]+)")

  private def allNull = new GenericInternalRow(6)

  private def isHex(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'f') || (b >= 'A' && b <= 'F')
  private def hexVal(b: Byte): Int =
    if (b <= '9') b - '0' else (b | 0x20) - 'a' + 10

  /** De-chunk a Transfer-Encoding: chunked body. Returns the payload
    * data plus a tolerance marker: "" (clean), "(truncated)" (stream
    * ended mid-chunk — bytes so far kept), or "(malformed)" (framing
    * unparseable — ORIGINAL bytes returned untouched).
    */
  private def dechunk(b: Array[Byte]): (Array[Byte], String) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (true) {
      var j = i
      var size = 0L
      var digits = 0
      while (j < b.length && isHex(b(j))) {
        size = size * 16 + hexVal(b(j)); digits += 1; j += 1
        if (digits > 8) return (b, "(malformed)") // > 4 GiB chunk: framing lie
      }
      // stream cut exactly at a chunk boundary (before the next size
      // line): that is TRUNCATION of a well-formed stream — keep the
      // cleanly recovered prefix, do not degrade to raw framed bytes
      if (digits == 0 && i >= b.length) return (out.toByteArray, "(truncated)")
      if (digits == 0) return (b, "(malformed)")
      if (j < b.length && b(j) != '\r' && b(j) != '\n' && b(j) != ';' &&
        b(j) != ' ' && b(j) != '\t') return (b, "(malformed)")
      while (j < b.length && b(j) != '\n') j += 1 // skip extensions to line end
      if (j >= b.length) { // size line never terminated
        return if (size == 0) (out.toByteArray, "") // final 0 at EOF: accept
        else (out.toByteArray, "(truncated)")
      }
      j += 1 // past '\n'
      if (size == 0) return (out.toByteArray, "") // trailers ignored
      val avail = math.min(size, (b.length - j).toLong).toInt
      out.write(b, j, avail)
      if (avail < size) return (out.toByteArray, "(truncated)")
      j += avail
      // data must be followed by CRLF (or lenient LF); EOF here = truncated
      if (j >= b.length) return (out.toByteArray, "(truncated)")
      if (b(j) == '\r') j += 1
      if (j >= b.length) return (out.toByteArray, "(truncated)")
      if (b(j) != '\n') return (b, "(malformed)")
      i = j + 1
    }
    throw new IllegalStateException("unreachable")
  }

  /** Multi-member gzip inflate, tolerant of mid-stream truncation. */
  private def gunzipTolerant(b: Array[Byte]): (Array[Byte], String) = {
    val out = new java.io.ByteArrayOutputStream()
    try {
      val in = new java.util.zip.GZIPInputStream(new java.io.ByteArrayInputStream(b))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      (out.toByteArray, "")
    } catch {
      case _: java.io.IOException => (out.toByteArray, "(truncated)")
    }
  }

  /** One Inflater pass; None if the stream yields nothing in this mode. */
  private def inflateTolerant(b: Array[Byte], raw: Boolean): Option[(Array[Byte], String)] = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(b)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) { // ran dry mid-stream
          inf.end()
          return if (out.size() == 0) None else Some((out.toByteArray, "(truncated)"))
        }
      }
      inf.end()
      Some((out.toByteArray, ""))
    } catch {
      case _: java.util.zip.DataFormatException =>
        inf.end()
        if (out.size() == 0) None else Some((out.toByteArray, "(truncated)"))
    }
  }

  private def codings(head: String, p: java.util.regex.Pattern): Seq[String] = {
    // RFC 7230 §3.2.2 list semantics: repeated header LINES concatenate
    // ("Content-Encoding: gzip" + "Content-Encoding: br" == "gzip, br")
    val m = p.matcher(head)
    val out = Seq.newBuilder[String]
    while (m.find()) out ++= m.group(1).split(',')
    out.result().map(_.trim.toLowerCase(Locale.ROOT))
      .filter(t => t.nonEmpty && t != "identity")
  }

  def decode(payload: Array[Byte]): InternalRow = {
    // earliest of \r\n\r\n and \n\n terminates the header block (CRLFCRLF
    // never contains LFLF, so "earliest" is unambiguous)
    var headEnd = -1
    var bodyStart = -1
    var i = 0
    while (bodyStart < 0 && i + 1 < payload.length) {
      if (payload(i) == '\n' && payload(i + 1) == '\n') {
        headEnd = i; bodyStart = i + 2
      } else if (i + 3 < payload.length && payload(i) == '\r' && payload(i + 1) == '\n' &&
          payload(i + 2) == '\r' && payload(i + 3) == '\n') {
        headEnd = i; bodyStart = i + 4
      }
      i += 1
    }
    if (bodyStart < 0) return allNull // torn envelope: no trusted fields
    // HTTP headers are byte-oriented; Latin-1 maps each byte to one char
    val head = new String(payload, 0, headEnd, StandardCharsets.ISO_8859_1)
    val sm = StatusPattern.matcher(head)
    val status: Any = if (sm.find()) java.lang.Long.valueOf(sm.group(1).toLong) else null
    val cm = ContentTypePattern.matcher(head)
    val ctypeFull = if (cm.find()) cm.group(1).trim else null
    val mediaType =
      if (ctypeFull == null) null
      else {
        val semi = ctypeFull.indexOf(';')
        val t = (if (semi < 0) ctypeFull else ctypeFull.substring(0, semi)).trim
        if (t.isEmpty) null else t
      }
    // undo wire encodings: transfer codings first (outermost), then
    // content codings, each list in reverse order of application
    val stack = codings(head, TransferEncodingPattern).reverse ++
      codings(head, ContentEncodingPattern).reverse
    if (stack.isEmpty) {
      // identity fast path — the common case at framing scale: decode in
      // place from (payload, offset), no second body buffer allocated
      val bodyLen = payload.length - bodyStart
      val (cs, source) = CharsetKernel.sniff(payload, bodyStart, bodyLen, ctypeFull)
      return new GenericInternalRow(Array[Any](
        status,
        if (mediaType == null) null else UTF8String.fromString(mediaType),
        UTF8String.fromString(cs.name().toLowerCase(Locale.ROOT)),
        UTF8String.fromString(source),
        UTF8String.fromString(CharsetKernel.decodeWith(payload, bodyStart, bodyLen, cs)),
        UTF8String.fromString("identity")))
    }
    var body = java.util.Arrays.copyOfRange(payload, bodyStart, payload.length)
    val applied = new scala.collection.mutable.ArrayBuffer[String]
    for (tok <- stack) tok match {
      case "chunked" =>
        val (d, flag) = dechunk(body)
        if (flag != "(malformed)") body = d
        applied += s"chunked$flag"
      case "gzip" | "x-gzip" =>
        if (body.length >= 2 && (body(0) & 0xff) == 0x1f && (body(1) & 0xff) == 0x8b) {
          val (d, flag) = gunzipTolerant(body)
          body = d
          applied += s"$tok$flag"
        } else applied += s"$tok(skipped)" // declared but not gzip bytes
      case "deflate" =>
        inflateTolerant(body, raw = false).orElse(inflateTolerant(body, raw = true)) match {
          case Some((d, flag)) => body = d; applied += s"deflate$flag"
          case None => applied += "deflate(skipped)"
        }
      case other =>
        // no decoder for this layer: decoding past it would hand
        // compressed bytes to the charset cascade as "text". The report
        // keeps the transforms already applied — an auditor must see
        // that de-chunking ran before the unsupported layer stopped us
        return new GenericInternalRow(Array[Any](
          status,
          if (mediaType == null) null else UTF8String.fromString(mediaType),
          null, null, null,
          UTF8String.fromString(
            (applied :+ s"$other(unsupported)").mkString(","))))
    }
    val encoding = applied.mkString(",")
    val (cs, source) = CharsetKernel.sniff(body, 0, body.length, ctypeFull)
    new GenericInternalRow(Array[Any](
      status,
      if (mediaType == null) null else UTF8String.fromString(mediaType),
      UTF8String.fromString(cs.name().toLowerCase(Locale.ROOT)),
      UTF8String.fromString(source),
      UTF8String.fromString(CharsetKernel.decodeWith(body, 0, body.length, cs)),
      UTF8String.fromString(encoding)))
  }
}

/** `payload binary → struct(status, content_type, charset,
  * charset_source, body, encoding)` — see [[HttpDecodeKernel]].
  */
case class HttpDecode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("status", LongType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("charset", StringType, nullable = true),
    StructField("charset_source", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
    StructField("encoding", StringType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "http_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"http_decode payload must be binary, got ${child.dataType.catalogString}")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(p: Any): Any =
    HttpDecodeKernel.decode(p.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, p =>
      s"${ev.value} = graft.functions.HttpDecodeKernel.decode($p);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
