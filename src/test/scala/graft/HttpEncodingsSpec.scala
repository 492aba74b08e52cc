package graft

import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.UTF_8

import graft.functions.HttpDecodeKernel
import org.apache.spark.sql.functions._

/** Wire-encoding unwrap in HttpDecodeKernel: chunked transfer framing and
  * gzip/deflate content codings, with the documented tolerance markers
  * (truncated / skipped / malformed / unsupported) — the shapes real
  * crawl captures actually carry.
  */
class HttpEncodingsSpec extends SparkTestBase {

  // the SHARED fixture builders the planted catalog cases also use —
  // framing here can never drift from what the oracle pins
  private def gzip(b: Array[Byte]): Array[Byte] =
    graft.sources.WarcFormat.gzipMember(b)

  private def zlib(b: Array[Byte], raw: Boolean = false): Array[Byte] =
    WireFixtures.deflate(b, raw)

  private def chunk(b: Array[Byte], sizes: Seq[Int], ext: String = "",
      eol: String = "\r\n", trailers: String = ""): Array[Byte] =
    WireFixtures.chunk(b, sizes, eol, ext, trailers)

  private def resp(headers: Seq[String], body: Array[Byte]): Array[Byte] = {
    val head = ("HTTP/1.1 200 OK" +: headers).mkString("", "\r\n", "\r\n\r\n")
    head.getBytes(UTF_8) ++ body
  }

  private def decode(p: Array[Byte]): (Long, String, String, String) = {
    val r = HttpDecodeKernel.decode(p)
    (if (r.isNullAt(0)) -1L else r.getLong(0),
      if (r.isNullAt(4)) null else r.getUTF8String(4).toString,
      if (r.isNullAt(5)) null else r.getUTF8String(5).toString,
      if (r.isNullAt(2)) null else r.getUTF8String(2).toString)
  }

  private val text = ("the quick brown fox " * 20).trim

  test("chunked: CRLF, bare-LF, extensions, trailers all unwrap") {
    val b = text.getBytes(UTF_8)
    val sizes = Seq(7, 100, b.length - 107)
    for ((eol, ext, tr) <- Seq(("\r\n", "", ""), ("\n", "", ""),
        ("\r\n", ";name=v", "X-Trailer: t\r\n"))) {
      val (st, body, enc, _) = decode(resp(
        Seq("Transfer-Encoding: chunked", "Content-Type: text/plain"),
        chunk(b, sizes, ext, eol, tr)))
      assert(st === 200L)
      assert(body === text, s"eol=${eol.length} ext=$ext")
      assert(enc === "chunked")
    }
  }

  test("chunked tolerance: truncated keeps prefix; malformed keeps raw") {
    val b = text.getBytes(UTF_8)
    val full = chunk(b, Seq(50, b.length - 50))
    // cut mid-second-chunk: first chunk + partial second recovered
    val cut = full.take(full.length - 80)
    val (_, body1, enc1, _) = decode(resp(Seq("Transfer-Encoding: chunked"), cut))
    assert(enc1 === "chunked(truncated)")
    assert(body1.nonEmpty && text.startsWith(body1))
    // garbage size line: framing untrusted, raw bytes kept
    val (_, body2, enc2, _) = decode(resp(
      Seq("Transfer-Encoding: chunked"), "zz\r\nnot-chunked".getBytes(UTF_8)))
    assert(enc2 === "chunked(malformed)")
    assert(body2 === "zz\r\nnot-chunked")
  }

  test("truncation exactly at a chunk boundary keeps the clean prefix") {
    val b = text.getBytes(UTF_8)
    val full = chunk(b, Seq(20, b.length - 20))
    // cut right after chunk 1's trailing CRLF, before chunk 2's size line
    val keep = (20.toHexString.length + 2) + 20 + 2
    val (_, body, enc, _) = decode(resp(Seq("Transfer-Encoding: chunked"),
      full.take(keep)))
    assert(enc === "chunked(truncated)")
    assert(body === text.take(20)) // NOT the raw framed bytes
  }

  test("repeated header lines concatenate per RFC 7230 list semantics") {
    val b = text.getBytes(UTF_8)
    // two Content-Encoding LINES == "gzip, gzip": both layers undone
    val (_, body, enc, _) = decode(resp(
      Seq("Content-Encoding: gzip", "Content-Encoding: gzip"), gzip(gzip(b))))
    assert((body, enc) === ((text, "gzip,gzip")))
  }

  test("unsupported layer report keeps the transforms already applied") {
    val (st, body, enc, _) = decode(resp(
      Seq("Transfer-Encoding: chunked", "Content-Encoding: br"),
      chunk(Array[Byte](1, 2, 3), Seq(3))))
    assert((st, body, enc) === ((200L, null, "chunked,br(unsupported)")))
  }

  test("gzip / x-gzip / multi-member / deflate both forms unwrap") {
    val b = text.getBytes(UTF_8)
    val (_, g1, e1, _) = decode(resp(Seq("Content-Encoding: gzip"), gzip(b)))
    assert((g1, e1) === ((text, "gzip")))
    val (_, g2, e2, _) = decode(resp(Seq("Content-Encoding: x-gzip"), gzip(b)))
    assert((g2, e2) === ((text, "x-gzip")))
    val half = b.length / 2
    val two = gzip(b.take(half)) ++ gzip(b.drop(half))
    val (_, g3, e3, _) = decode(resp(Seq("Content-Encoding: gzip"), two))
    assert((g3, e3) === ((text, "gzip")))
    val (_, d1, e4, _) = decode(resp(Seq("Content-Encoding: deflate"), zlib(b)))
    assert((d1, e4) === ((text, "deflate")))
    // the raw-deflate form broken servers send
    val (_, d2, e5, _) = decode(resp(Seq("Content-Encoding: deflate"), zlib(b, raw = true)))
    assert((d2, e5) === ((text, "deflate")))
  }

  test("tolerance: lying gzip header skipped; truncated gzip keeps prefix") {
    val (_, body1, enc1, _) = decode(resp(
      Seq("Content-Encoding: gzip"), text.getBytes(UTF_8)))
    assert(enc1 === "gzip(skipped)")
    assert(body1 === text) // raw bytes fall through to the charset cascade
    val gz = gzip(text.getBytes(UTF_8))
    val (_, body2, enc2, _) = decode(resp(
      Seq("Content-Encoding: gzip"), gz.take(gz.length - 12)))
    assert(enc2 === "gzip(truncated)")
    assert(text.startsWith(body2))
  }

  test("stacked codings unwrap in reverse; unsupported nulls the body") {
    val b = text.getBytes(UTF_8)
    // applied gzip (content) then chunked (transfer): undo chunked, then gzip
    val (st, body, enc, _) = decode(resp(
      Seq("Transfer-Encoding: chunked", "Content-Encoding: gzip"),
      chunk(gzip(b), Seq(gzip(b).length))))
    assert((st, body, enc) === ((200L, text, "chunked,gzip")))
    // TE lists its own stack: "gzip, chunked" applied left-to-right
    val (_, body2, enc2, _) = decode(resp(
      Seq("Transfer-Encoding: gzip, chunked"),
      chunk(gzip(b), Seq(17, gzip(b).length - 17))))
    assert((body2, enc2) === ((text, "chunked,gzip")))
    // brotli: no JDK decoder — body null, status still parsed, reported
    val (st3, body3, enc3, cs3) = decode(resp(
      Seq("Content-Encoding: br", "Content-Type: text/html"),
      Array[Byte](1, 2, 3)))
    assert((st3, body3, enc3, cs3) === ((200L, null, "br(unsupported)", null)))
  }

  test("charset cascade composes on the DECODED bytes; identity reported") {
    val sjis = Charset.forName("Shift_JIS")
    // explicit escapes: byte-exact regardless of source-file encoding
    val jp = "\u3053\u3093\u306b\u3061\u306f\u4e16\u754c" // konnichiwa sekai
    val wire = chunk(gzip(jp.getBytes(sjis)), Seq(gzip(jp.getBytes(sjis)).length))
    val (_, body, enc, cs) = decode(resp(
      Seq("Transfer-Encoding: chunked", "Content-Encoding: gzip",
        "Content-Type: text/html; charset=Shift_JIS"), wire))
    assert((body, enc, cs) === ((jp, "chunked,gzip", "shift_jis")))
    // no encodings: identity, body untouched
    val (_, b2, e2, _) = decode(resp(Seq("Content-Type: text/plain"),
      text.getBytes(UTF_8)))
    assert((b2, e2) === ((text, "identity")))
  }

  test("codegen path: the expression exposes the encoding field") {
    import spark.implicits._
    val b = text.getBytes(UTF_8)
    val rows = Seq(
      (1L, resp(Seq("Transfer-Encoding: chunked", "Content-Encoding: gzip"),
        chunk(gzip(b), Seq(gzip(b).length)))),
      (2L, resp(Seq("Content-Type: text/plain"), b)))
      .toDF("id", "payload")
      .select(col("id"),
        graft.text.TextAnalysis.httpResponseDecoded(col("payload")).as("h"))
      .select(col("id"), col("h.body"), col("h.encoding"))
      .orderBy("id").collect()
    assert(rows(0).getString(1) === text)
    assert(rows(0).getString(2) === "chunked,gzip")
    assert(rows(1).getString(2) === "identity")
  }
}
