package graft

/** Shared builders for HTTP wire-encoding fixtures — ONE implementation
  * of deflate compression and chunked transfer framing used by both the
  * planted `http_encodings` catalog cases ([[Queries.encodingCases]])
  * and HttpEncodingsSpec, so the framing the unit tests exercise can
  * never drift from the framing the oracle pins. (gzip members come from
  * [[graft.sources.WarcFormat.gzipMember]] for the same reason.)
  */
private[graft] object WireFixtures {

  /** Deflate `b`: zlib-wrapped (raw = false) or the raw form broken
    * servers send (raw = true).
    */
  def deflate(b: Array[Byte], raw: Boolean): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, raw)
    d.setInput(b); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Frame `b` as a chunked transfer body: one chunk per entry of
    * `sizes` (which must cover `b` exactly), hex size lines with
    * optional extension suffix, `eol` line endings (CRLF or the lenient
    * bare LF), terminating 0-chunk, optional trailer block.
    */
  def chunk(b: Array[Byte], sizes: Seq[Int], eol: String = "\r\n",
      ext: String = "", trailers: String = ""): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    for (s <- sizes) {
      out.write((s.toHexString + ext + eol).getBytes(ascii))
      out.write(b, off, s); off += s
      out.write(eol.getBytes(ascii))
    }
    require(off == b.length, "sizes must cover the body exactly")
    out.write(("0" + eol + trailers + eol).getBytes(ascii))
    out.toByteArray
  }
}
