package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.functions.HttpDecodeKernel
import graft.sources.WarcFormat
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the HTTP wire-encoding unwrap: for ANY body
  * and ANY framing the builders can produce, decode(encode(x)) == x —
  * and for ANY truncation point, the recovered body is a prefix of x
  * (never raw framing bytes, never an exception).
  */
object WireEncodingProps extends Properties("WireEncoding") {

  // printable-ASCII bodies: the charset cascade is identity on them, so
  // these properties isolate the FRAMING layer (charset has its own spec)
  private val body: Gen[String] =
    Gen.nonEmptyListOf(Gen.choose(32, 126).map(_.toChar)).map(_.mkString)

  /** Random chunk split of n bytes into positive sizes covering n. */
  private def splits(n: Int): Gen[List[Int]] =
    if (n == 0) Gen.const(Nil)
    else Gen.choose(1, n).flatMap(h => splits(n - h).map(h :: _))

  private def resp(headers: Seq[String], b: Array[Byte]): Array[Byte] =
    ("HTTP/1.1 200 OK" +: headers).mkString("", "\r\n", "\r\n\r\n").getBytes(UTF_8) ++ b

  private def decoded(p: Array[Byte]): (String, String) = {
    val r = HttpDecodeKernel.decode(p)
    (if (r.isNullAt(4)) null else r.getUTF8String(4).toString,
      if (r.isNullAt(5)) null else r.getUTF8String(5).toString)
  }

  property("chunked round-trip at every split, both line endings") =
    forAll(body, Gen.oneOf("\r\n", "\n")) { (s, eol) =>
      val b = s.getBytes(UTF_8)
      forAll(splits(b.length)) { sz =>
        val (got, enc) = decoded(resp(Seq("Transfer-Encoding: chunked"),
          WireFixtures.chunk(b, sz, eol)))
        got == s && enc == "chunked"
      }
    }

  property("chunked + gzip stack round-trips at every split") =
    forAll(body) { s =>
      val gz = WarcFormat.gzipMember(s.getBytes(UTF_8))
      forAll(splits(gz.length)) { sz =>
        val (got, enc) = decoded(resp(
          Seq("Transfer-Encoding: chunked", "Content-Encoding: gzip"),
          WireFixtures.chunk(gz, sz)))
        got == s && enc == "chunked,gzip"
      }
    }

  property("deflate round-trips in both zlib and raw forms") =
    forAll(body, Gen.oneOf(true, false)) { (s, raw) =>
      val (got, enc) = decoded(resp(Seq("Content-Encoding: deflate"),
        WireFixtures.deflate(s.getBytes(UTF_8), raw)))
      got == s && enc == "deflate"
    }

  property("ANY truncation of a chunked stream yields a prefix of the body, no throw") =
    forAll(body) { s =>
      val b = s.getBytes(UTF_8)
      val full = WireFixtures.chunk(b, List(math.max(1, b.length / 2),
        b.length - math.max(1, b.length / 2)).filter(_ > 0))
      forAll(Gen.choose(0, full.length - 1)) { cut =>
        val (got, enc) = decoded(resp(Seq("Transfer-Encoding: chunked"),
          full.take(cut)))
        // tolerance contract: truncated/malformed never throws; a
        // truncated stream's recovered body is a prefix of the original
        enc != null && (!enc.contains("(truncated)") || s.startsWith(got))
      }
    }

  property("ANY truncation of a gzip body decodes to a prefix, no throw") =
    forAll(body) { s =>
      val gz = WarcFormat.gzipMember(s.getBytes(UTF_8))
      forAll(Gen.choose(2, gz.length - 1)) { cut =>
        val (got, enc) = decoded(resp(Seq("Content-Encoding: gzip"), gz.take(cut)))
        enc != null && (got == null || s.startsWith(got))
      }
    }
}

/** Registered-domain invariants over arbitrary host shapes. */
object RegisteredDomainProps extends Properties("RegisteredDomain") {
  private val label: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
  private val host: Gen[String] =
    Gen.nonEmptyListOf(label).map(_.take(6).mkString("."))

  private lazy val spark = SparkTestBase.session

  property("output is null or a lowercase dot-suffix of the cleaned host") = {
    import org.apache.spark.sql.functions._
    forAll(Gen.listOfN(20, host)) { hs =>
      import spark.implicits._
      val rows = hs.toDF("host")
        .select(col("host"),
          graft.text.TextAnalysis.registeredDomain(col("host")).as("rd"))
        .collect()
      rows.forall { r =>
        // Locale.ROOT: default-locale toLowerCase would diverge from
        // Spark's locale-independent lower() under tr_TR ('I' -> dotless)
        val h = r.getString(0).toLowerCase(java.util.Locale.ROOT)
        val rd = r.getString(1)
        rd == null || (rd == rd.toLowerCase(java.util.Locale.ROOT) &&
          (h == rd || h.endsWith("." + rd)) &&
          rd.split("\\.").length >= 2)
      }
    }
  }
}
