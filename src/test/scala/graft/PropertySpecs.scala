package graft

import graft.core.Distances
import graft.functions.{SetSimilarityKernel, ShingleKernel}
import graft.hnsw.DistHeap
import graft.knn.TopK
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the pure kernels (run by sbt's ScalaCheck
  * framework alongside the ScalaTest suites).
  */
object TopKProps extends Properties("TopK") {
  private val entries = Gen.listOf(Gen.zip(Gen.choose(0.0, 1e9), Gen.choose(0L, 1000L)))

  property("sorted == global sort take k, with (dist,id) tie-break") =
    forAll(entries, Gen.choose(0, 20)) { (xs, k) =>
      val t = new TopK(k)
      xs.foreach { case (d, i) => t.push(d, i) }
      val expected = xs.sorted.take(k)
      t.sorted.toSeq == expected
    }

  property("merge of arbitrary partitions == global top-k") =
    forAll(entries, Gen.choose(1, 10)) { (xs, parts) =>
      val k = 8
      val global = new TopK(k)
      xs.foreach { case (d, i) => global.push(d, i) }
      val merged = new TopK(k)
      xs.grouped(math.max(1, xs.size / parts)).foreach { chunk =>
        val h = new TopK(k)
        chunk.foreach { case (d, i) => h.push(d, i) }
        merged.mergeFrom(h)
      }
      merged.sorted.toSeq == global.sorted.toSeq
    }

  property("scanBlocked == row-major scan for every block size") = {
    val vecs = Gen.listOf(Gen.zip(Gen.choose(0L, 500L),
      Gen.listOfN(4, Gen.choose(-10f, 10f)).map(_.toArray)))
    val queries = Gen.choose(1, 5).flatMap(n =>
      Gen.listOfN(n, Gen.listOfN(4, Gen.choose(-10f, 10f)).map(_.toArray)))
    forAll(vecs, queries, Gen.choose(1, 7)) { (rows, qs, blockSize) =>
      val kernel = Distances.distance(Distances.Euclidean) _
      val k = 5
      val blocked = Array.fill(qs.length)(new TopK(k))
      TopK.scanBlocked(rows.iterator, qs.toArray, blocked, kernel, blockSize)
      val naive = Array.fill(qs.length)(new TopK(k))
      rows.foreach { case (id, v) =>
        qs.indices.foreach(qi => naive(qi).push(kernel(v, qs(qi)), id))
      }
      qs.indices.forall(qi => blocked(qi).sorted.toSeq == naive(qi).sorted.toSeq)
    }
  }
}

object DistHeapProps extends Properties("DistHeap") {
  private val entries = Gen.listOf(Gen.zip(Gen.choose(0.0, 1e6), Gen.choose(0, 10000)))

  property("min-heap polls ascending (dist, slot)") = forAll(entries) { xs =>
    val h = new DistHeap(4, max = false)
    xs.foreach { case (d, s) => h.push(d, s) }
    val out = Seq.fill(h.size) { h.poll(); (h.polledDist, h.polledSlot) }
    out == xs.sorted
  }

  property("max-heap polls descending") = forAll(entries) { xs =>
    val h = new DistHeap(4, max = true)
    xs.foreach { case (d, s) => h.push(d, s) }
    val out = Seq.fill(h.size) { h.poll(); (h.polledDist, h.polledSlot) }
    out == xs.sorted.reverse
  }
}

object KernelProps extends Properties("kernels") {
  private val floats = Gen.listOfN(16, Gen.choose(-100f, 100f)).map(_.toArray)

  property("euclideanF32/SIMD agree with exact double fold within 1e-3 rel") =
    forAll(floats, floats) { (a, b) =>
      val exact = Distances.euclidean(a, b)
      val fast = Distances.euclideanF32(a, b)
      val simd = graft.core.DistKernel.best.euclidean(a, b)
      val tol = math.max(1e-6, exact * 1e-3)
      math.abs(fast - exact) <= tol && math.abs(simd - exact) <= tol
    }

  property("cosine symmetric and zero on self") = forAll(floats) { a =>
    val nonZero = a.exists(_ != 0f)
    !nonZero || {
      val d = Distances.cosine(a, a)
      math.abs(d) < 1e-9 && Distances.cosine(a, a.map(x => x * 2)) < 1e-6
    }
  }

  private val tokenLists = Gen.listOf(Gen.oneOf("a", "b", "cc", "dd", "eee", "f", "gg", "hh"))

  property("sortedIntersectCount == set intersection size") =
    forAll(tokenLists, tokenLists) { (x, y) =>
      def hs(l: List[String]) = ShingleKernel.shingleHashSet(
        UTF8String.fromString(l.mkString(" ")), 1)
      val a = hs(x)
      val b = hs(y)
      val expected =
        if (x.isEmpty || y.isEmpty) {
          // empty token list degenerates to the empty-string shingle
          val sa = (if (x.isEmpty) Set("") else x.toSet)
          val sb = (if (y.isEmpty) Set("") else y.toSet)
          sa.intersect(sb).size
        } else x.toSet.intersect(y.toSet).size
      SetSimilarityKernel.sortedIntersectCount(a, b) == expected.toLong
    }
}

object WavCodecProps extends Properties("WavCodec") {
  import graft.multimodal.Multimodal

  private val samples = Gen.listOf(Gen.chooseNum(Short.MinValue, Short.MaxValue)).map(_.map(_.toShort).toArray)
  private val rates = Gen.oneOf(8000, 16000, 22050, 44100, 48000)

  property("encodeWav -> decodePcm is lossless for any 16-bit PCM payload") =
    forAll(samples, rates) { (s, rate) =>
      Multimodal.WavDecoder.decodePcm(Multimodal.encodeWav(s, rate)) match {
        case Some((decoded, r, ch)) =>
          r == rate && ch == 1 && decoded.toSeq == s.toSeq
        case None => false
      }
    }

  property("decodeFrames covers every decoded byte exactly once, over any maxFrames") =
    forAll(samples, Gen.choose(1, 9)) { (s, maxFrames) =>
      val frames = Multimodal.WavDecoder.decodeFrames(Multimodal.encodeWav(s, 16000), maxFrames)
      val total = frames.map(_.length).sum
      (s.isEmpty && frames.isEmpty) ||
        (total == s.length * 2 && frames.length <= maxFrames)
    }

  property("arbitrary byte garbage never throws, yields None") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.map(_.toByte).toArray)) { junk =>
      // a random payload is (astronomically) never a valid RIFF/WAVE file
      Multimodal.WavDecoder.decodePcm(junk).isEmpty || junk.length >= 44
    }
}

object MjpegCodecProps extends Properties("MjpegCodec") {
  import graft.multimodal.Multimodal

  private val dims = for {
    w <- Gen.choose(1, 10)
    h <- Gen.choose(1, 10)
  } yield (w, h)
  private val frameCounts = Gen.choose(0, 6)

  property("encodeMjpeg -> segments finds exactly the encoded frames; decode keeps dims") =
    forAll(dims, frameCounts, Gen.choose(0, 255)) { case ((w, h), n, seed) =>
      val frames = (0 until n).map(f =>
        Array.tabulate(w * h * 3)(i => ((seed + f * 37 + i * 11) & 0xff).toByte))
      val mjpeg = Multimodal.encodeMjpeg(frames, w, h)
      val segs = Multimodal.MjpegDecoder.segments(mjpeg)
      val decoded = Multimodal.MjpegDecoder.decodeFrames(mjpeg, math.max(1, n))
      segs.length == n &&
        decoded.length == n &&
        decoded.forall(_.length == w * h * 3)
    }

  property("sampleIndices: evenly spaced, strictly increasing, bounded") =
    forAll(Gen.choose(0, 1000), Gen.choose(1, 64)) { (n, k) =>
      val idx = Multimodal.MjpegDecoder.sampleIndices(n, k)
      idx.length == math.min(n, k) &&
        idx.sliding(2).forall { case Array(a, b) => a < b; case _ => true } &&
        (n == 0 || (idx.head == 0 && idx.last < n))
    }

  property("arbitrary byte garbage never throws") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.map(_.toByte).toArray)) { junk =>
      // random bytes can contain spurious SOI/EOI markers; the per-segment
      // ImageIO decode then yields no frame — but never an exception
      val frames = Multimodal.MjpegDecoder.decodeFrames(junk, 4)
      frames.forall(_.length % 3 == 0)
    }
}

object ApngCodecProps extends Properties("ApngCodec") {
  import graft.multimodal.Multimodal

  private val dims = for {
    w <- Gen.choose(1, 8)
    h <- Gen.choose(1, 8)
  } yield (w, h)

  property("encode -> decode is byte-exact on every frame (lossless)") =
    forAll(dims, Gen.choose(1, 5), Gen.choose(0, 255)) { case ((w, h), n, seed) =>
      val frames = (0 until n).map(f =>
        Array.tabulate(w * h * 3)(i => ((seed + f * 37 + i * 11) & 0xff).toByte))
      val apng = Multimodal.encodeApng(frames, w, h)
      val decoded = Multimodal.ApngDecoder.decodeFrames(apng, n)
      decoded.length == n &&
        decoded.zip(frames).forall { case (g, e) => java.util.Arrays.equals(g, e) }
    }

  property("arbitrary byte garbage never throws, yields no frames") =
    forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.map(_.toByte).toArray)) { junk =>
      // the walk may salvage nothing or (for junk that is a valid PNG
      // prefix) a well-formed frame — either way: no exception, and any
      // frame is packed RGB
      Multimodal.ApngDecoder.decodeFrames(junk, 4).forall(_.length % 3 == 0)
    }

  property("truncation of a valid APNG never throws") =
    forAll(dims, Gen.choose(1, 3), Gen.choose(0.0, 1.0)) { case ((w, h), n, frac) =>
      val frames = (0 until n).map(f =>
        Array.tabulate(w * h * 3)(i => ((f * 53 + i * 17) & 0xff).toByte))
      val apng = Multimodal.encodeApng(frames, w, h)
      val cut = java.util.Arrays.copyOfRange(apng, 0, (apng.length * frac).toInt)
      val out = Multimodal.ApngDecoder.decodeFrames(cut, 4)
      out.forall(_.length == w * h * 3)
    }
}

object BpeProps extends Properties("Bpe") {
  import graft.text.Bpe

  private val symbol = Gen.oneOf("a", "b", "c", "Ġ", "ab", "bc", "ca", "aa")
  private val mergeTables: Gen[Map[(String, String), Int]] =
    Gen.listOf(Gen.zip(symbol, symbol)).map(_.distinct.zipWithIndex.toMap)
  private val pretokens = Gen.listOfN(12, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)
    .flatMap(s => Gen.choose(0, s.length).map(s.take))

  /** Obviously-correct immutable-list reference of the published encode
    * loop: lowest-rank pair, merge all non-overlapping occurrences left to
    * right, repeat.
    */
  private def naive(pretoken: String, ranks: Map[(String, String), Int]): Int = {
    var word: List[String] = pretoken.map(c => if (c == ' ') "Ġ" else c.toString).toList
    var continue = true
    while (continue && word.length > 1) {
      val ranked = word.zip(word.tail).flatMap(p => ranks.get(p).map(r => (r, p)))
      if (ranked.isEmpty) continue = false
      else {
        val best = ranked.minBy(_._1)._2
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = word
        while (rest.nonEmpty) rest match {
          case a :: b :: tail if (a, b) == best => out += a + b; rest = tail
          case a :: tail => out += a; rest = tail
        }
        word = out.toList
      }
    }
    word.length
  }

  property("countTokens equals the immutable-list reference on random tables") =
    forAll(pretokens, mergeTables) { (tok, ranks) =>
      Bpe.countTokens(tok, ranks) == naive(tok, ranks)
    }

  property("count bounds: 1..length for nonempty, 0 for empty") =
    forAll(pretokens, mergeTables) { (tok, ranks) =>
      val n = Bpe.countTokens(tok, ranks)
      if (tok.isEmpty) n == 0 else n >= 1 && n <= tok.length
    }

  property("appending lower-priority rules never increases the count") =
    forAll(pretokens, mergeTables, Gen.listOf(Gen.zip(symbol, symbol))) { (tok, ranks, extra) =>
      // appended rules rank strictly below every existing one, so the merge
      // sequence under the extended table is a strict extension
      val base = ranks.size
      val extended = ranks ++ extra.distinct.filterNot(ranks.contains)
        .zipWithIndex.map { case (p, i) => p -> (base + i) }
      Bpe.countTokens(tok, extended) <= Bpe.countTokens(tok, ranks)
    }

  property("kernel spec roundtrip: full-text count = sum of per-pretoken counts") =
    forAll(Gen.listOfN(20, Gen.oneOf('t', 'h', 'e', 'a', 'n', 'd', ' ', ',', '1')).map(_.mkString)) { text =>
      val spec = graft.functions.BpeKernel.encode(Bpe.DemoMerges)
      val ranks = Bpe.loadMerges(Bpe.DemoMerges)
      val m = java.util.regex.Pattern.compile(graft.text.TextAnalysis.BpeTokenPattern).matcher(text)
      var expect = 0L
      while (m.find()) expect += Bpe.countTokens(m.group(), ranks)
      graft.functions.BpeKernel.count(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), spec) == expect
    }
}

object ProbeSequenceProps extends Properties("ProbeSequence") {
  private val margins = Gen.choose(1, 10).flatMap(n =>
    Gen.listOfN(n, Gen.choose(0.001, 100.0)).map(_.toArray))

  property("prefix of the brute-force subset enumeration by (score, then stable)") =
    forAll(margins, Gen.choose(1, 40), Gen.choose(0L, 1000L)) { (ms, t, sig) =>
      val got = graft.dedup.Dedup.probeSequence(sig, ms, t)
      // brute force: all 2^n masks scored by summed flipped margins
      val n = ms.length
      val all = (0 until (1 << n)).map { mask =>
        val score = (0 until n).filter(b => (mask & (1 << b)) != 0).map(ms).sum
        (score, mask.toLong ^ sig)
      }.sortBy(_._1)
      val budget = math.min(t, 1 << n)
      // scores must match the best-possible prefix (signatures may permute
      // within exact score ties, which random doubles make measure-zero —
      // still compare scores, not sigs, to stay robust)
      val gotScores = got.map { g =>
        val mask = (g ^ sig).toInt
        (0 until n).filter(b => (mask & (1 << b)) != 0).map(ms).sum
      }
      got.length == budget &&
        got.toSet.size == got.length && // no duplicate probes
        got.head == sig && // exact signature first
        gotScores.zip(all.take(budget).map(_._1)).forall { case (a, b) => math.abs(a - b) < 1e-9 }
    }
}

object BinaryKernelProps extends Properties("BinaryKernels") {
  import graft.functions.BinaryKernels

  private val dimGen = Gen.choose(1, 200)
  private def vecGen(dim: Int): Gen[Array[Float]] =
    Gen.listOfN(dim, Gen.choose(-10.0f, 10.0f)).map(_.toArray)

  property("pack sets exactly the bits of dims above threshold") =
    forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d)))) { case (v, thr) =>
      val words = BinaryKernels.pack(v, thr)
      words.length == (v.length + 63) / 64 &&
        v.indices.forall { i =>
          (((words(i >> 6) >>> (i & 63)) & 1L) == 1L) == (v(i) > thr(i))
        } &&
        // bits past the dimension stay zero (the partial last word)
        (v.length % 64 == 0 ||
          (words.last >>> (v.length % 64)) == 0L)
    }

  property("hamming == per-bit disagreement count; metric axioms hold") =
    forAll(dimGen.flatMap(d => Gen.zip(vecGen(d), vecGen(d), vecGen(d), vecGen(d)))) {
      case (a, b, c, thr) =>
        val (sa, sb, sc) = (BinaryKernels.pack(a, thr), BinaryKernels.pack(b, thr),
          BinaryKernels.pack(c, thr))
        val naive = a.indices.count(i => (a(i) > thr(i)) != (b(i) > thr(i)))
        BinaryKernels.hamming(sa, sb) == naive &&
          BinaryKernels.hamming(sa, sa) == 0 &&
          BinaryKernels.hamming(sa, sb) == BinaryKernels.hamming(sb, sa) &&
          BinaryKernels.hamming(sa, sc) <=
            BinaryKernels.hamming(sa, sb) + BinaryKernels.hamming(sb, sc)
    }
}

object FirstFitTreeProps extends Properties("FirstFitTree") {
  import graft.ops.Packing.FirstFitTree

  private val itemsGen = Gen.nonEmptyListOf(Gen.choose(1L, 200L))
  private val blockGen = Gen.choose(1L, 128L)

  /** The textbook linear first-fit scan the tree replaces. */
  private def linearFirstFit(sizes: List[Long], blockLen: Long): List[Int] = {
    val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
    sizes.map { n =>
      var b = 0
      while (b < rem.length && rem(b) < n) b += 1
      if (b == rem.length) rem += blockLen - n else rem(b) -= n
      b
    }
  }

  property("bin choices identical to the linear first-fit scan") =
    forAll(itemsGen, blockGen) { (sizes, blockLen) =>
      // same decreasing order packBestFit feeds (includes oversized items:
      // sizes up to 200 vs blockLen <= 128 exercise the negative-capacity
      // own-bin path)
      val ordered = sizes.sorted(Ordering[Long].reverse)
      val tree = new FirstFitTree(ordered.length)
      val treeBins = ordered.map { n =>
        tree.findFirst(n) match {
          case -1 => val nb = tree.size; tree.set(nb, blockLen - n); nb
          case f => tree.set(f, tree.remaining(f) - n); f
        }
      }
      treeBins == linearFirstFit(ordered, blockLen)
    }

  property("arbitrary (non-decreasing) arrival order still matches") =
    forAll(itemsGen, blockGen) { (sizes, blockLen) =>
      val tree = new FirstFitTree(sizes.length)
      val treeBins = sizes.map { n =>
        tree.findFirst(n) match {
          case -1 => val nb = tree.size; tree.set(nb, blockLen - n); nb
          case f => tree.set(f, tree.remaining(f) - n); f
        }
      }
      treeBins == linearFirstFit(sizes, blockLen)
    }
}

object ImageDHashProps extends Properties("ImageDHash") {
  import graft.dedup.ImageDedup
  import graft.multimodal.Multimodal

  /** Random small RGB image: dims 1..24, pixel range [40, 183] so a +s
    * (s <= 40) brightness shift never clips.
    */
  private val imgGen: Gen[(Array[Byte], Int, Int)] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 24)
    px <- Gen.listOfN(w * h * 3, Gen.choose(40, 183))
  } yield (px.map(_.toByte).toArray, w, h)

  property("lossless re-encode round-trip preserves the hash") =
    forAll(imgGen) { case (rgb, w, h) =>
      val png = Multimodal.encodePng(rgb, w, h)
      val (decoded, dw, dh) = Multimodal.PngDecoder.decodeRgb(png).get
      val png2 = Multimodal.encodePng(decoded, dw, dh)
      ImageDedup.dHash(png) == ImageDedup.dHash(png2) &&
        ImageDedup.dHash(png).isDefined
    }

  property("non-clipping brightness shift preserves the hash exactly") =
    forAll(imgGen, Gen.choose(1, 40)) { case ((rgb, w, h), s) =>
      val shifted = rgb.map(b => ((b & 0xff) + s).toByte)
      ImageDedup.dHash(Multimodal.encodePng(rgb, w, h)) ==
        ImageDedup.dHash(Multimodal.encodePng(shifted, w, h))
    }

  property("pigeonhole: hashes within hamming 3 share at least one of 4 band slices") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue),
        Gen.listOfN(3, Gen.choose(0, 63))) { (h, flips) =>
      val h2 = flips.foldLeft(h)((acc, b) => acc ^ (1L << b))
      // <= 3 distinct flips => hamming(h, h2) <= 3 < 4 bands
      (0 until 4).exists { b =>
        ((h >>> (16 * b)) & 0xffffL) == ((h2 >>> (16 * b)) & 0xffffL)
      }
    }

  property("dHashFromGray: each bit is exactly its gradient comparison") =
    forAll(Gen.listOfN(72, Gen.choose(0, 255))) { g0 =>
      val g = g0.toArray
      val h = ImageDedup.dHashFromGray(g)
      (0 until 64).forall { bit =>
        val (y, x) = (bit / 8, bit % 8)
        (((h >>> bit) & 1L) == 1L) == (g(y * 9 + x + 1) > g(y * 9 + x))
      }
    }
}

object WordPieceProps extends Properties("WordPiece") {
  import graft.text.WordPiece
  import org.scalacheck.{Gen, Properties}
  import org.scalacheck.Prop.forAll

  // vocab pools over a tiny alphabet so random words hit real pieces
  private val piece = Gen.oneOf("a", "b", "c", "ab", "abc", "bc", "ca")
  private val vocabs: Gen[Set[String]] = Gen.listOf(Gen.zip(Gen.oneOf(true, false), piece))
    .map(_.map { case (cont, p) => if (cont) "##" + p else p }.toSet + "a" + "##a")
  private val words = Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString)
    .flatMap(s => Gen.choose(0, s.length).map(s.take))

  property("pieces reconstruct the word exactly, or are the single [UNK]") =
    forAll(words, vocabs) { (w, v) =>
      val p = WordPiece.encodePieces(w, v)
      if (w.isEmpty) p.isEmpty
      else if (p.sameElements(Array(WordPiece.Unk))) true
      else p.head.take(2) != "##" &&
        p.tail.forall(_.startsWith("##")) &&
        (p.head +: p.tail.map(_.stripPrefix("##"))).mkString == w
    }

  property("count-only walk equals the piece walk everywhere") =
    forAll(words, vocabs) { (w, v) =>
      WordPiece.countPieces(w, v) == WordPiece.encodePieces(w, v).length
    }

  property("greedy: each piece is the longest vocab prefix at its position") =
    forAll(words, vocabs) { (w, v) =>
      val p = WordPiece.encodePieces(w, v)
      if (p.sameElements(Array(WordPiece.Unk)) || w.isEmpty) true
      else {
        var pos = 0
        p.forall { piece =>
          val raw = piece.stripPrefix("##")
          val longerExists = (raw.length + 1 to w.length - pos).exists { len =>
            val cand = w.substring(pos, pos + len)
            v.contains(if (pos > 0) "##" + cand else cand)
          }
          pos += raw.length
          !longerExists
        }
      }
    }
}

object NormalizeProps extends Properties("NormalizeKernel") {
  import org.scalacheck.{Gen, Properties}
  import org.scalacheck.Prop.forAll
  import org.apache.spark.unsafe.types.UTF8String

  // strings mixing ASCII, precomposed, decomposed, and combining marks
  private val chars = Gen.frequency(
    (6, Gen.alphaNumChar),
    (1, Gen.oneOf('é', 'Å', '́', '̊', '中', ' ')))
  private val strs = Gen.listOf(chars).map(_.mkString)

  private def nfc(s: String): String =
    graft.functions.NormalizeKernel.nfc(UTF8String.fromString(s)).toString

  property("idempotent: nfc(nfc(s)) == nfc(s)") = forAll(strs) { s =>
    nfc(nfc(s)) == nfc(s)
  }

  property("agrees with the JDK normalizer") = forAll(strs) { s =>
    nfc(s) == java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
  }

  property("ASCII passes through unchanged (same instance fast path)") =
    forAll(Gen.asciiPrintableStr) { s =>
      val u = UTF8String.fromString(s)
      graft.functions.NormalizeKernel.nfc(u) eq u
    }
}
