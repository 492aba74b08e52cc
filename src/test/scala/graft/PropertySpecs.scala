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
