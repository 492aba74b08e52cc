package graft.core

/** Plain-Scala distance kernels over float vectors, shared by the
  * `mapPartitions` search paths and the HNSW index. Double accumulation in
  * element order — bit-identical to the Catalyst expressions in
  * [[graft.functions.VectorDistance]] so partitioned results hash-match the
  * SQL-expressible formulations.
  *
  * Semantics follow `/root/reference/index/space/native_impl.go:9-40` (+ the
  * cosine abs in `space.go:73`).
  */
object Distances {
  final val Euclidean = 0
  final val Manhattan = 1
  final val Cosine = 2

  def metricId(name: String): Int = name match {
    case "euclidean" => Euclidean
    case "manhattan" => Manhattan
    case "cosine" => Cosine
    case other => throw new IllegalArgumentException(s"unknown metric: $other")
  }

  def euclidean(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }

  def manhattan(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += math.abs(a(i).toDouble - b(i).toDouble)
      i += 1
    }
    acc
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    math.abs(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def distance(metric: Int)(a: Array[Float], b: Array[Float]): Double = metric match {
    case Euclidean => euclidean(a, b)
    case Manhattan => manhattan(a, b)
    case Cosine => cosine(a, b)
  }

  // ---------------------------------------------------------------- fast f32
  // 4-lane float-accumulation kernels for graph-internal distance calls
  // (HNSW build/search, IVF assignment). Independent accumulator chains give
  // the JIT instruction-level parallelism the strictly-ordered double fold
  // cannot; ~3-4x faster at dim>=64. NOT for oracle-matched outputs — the
  // expression path keeps exact element-ordered double accumulation.

  def euclideanF32(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc0 = 0f; var acc1 = 0f; var acc2 = 0f; var acc3 = 0f
    var i = 0
    val n4 = n - (n & 3)
    while (i < n4) {
      val d0 = a(i) - b(i)
      val d1 = a(i + 1) - b(i + 1)
      val d2 = a(i + 2) - b(i + 2)
      val d3 = a(i + 3) - b(i + 3)
      acc0 += d0 * d0; acc1 += d1 * d1; acc2 += d2 * d2; acc3 += d3 * d3
      i += 4
    }
    while (i < n) { val d = a(i) - b(i); acc0 += d * d; i += 1 }
    math.sqrt(((acc0 + acc1) + (acc2 + acc3)).toDouble)
  }

  def manhattanF32(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var acc0 = 0f; var acc1 = 0f; var acc2 = 0f; var acc3 = 0f
    var i = 0
    val n4 = n - (n & 3)
    while (i < n4) {
      acc0 += math.abs(a(i) - b(i))
      acc1 += math.abs(a(i + 1) - b(i + 1))
      acc2 += math.abs(a(i + 2) - b(i + 2))
      acc3 += math.abs(a(i + 3) - b(i + 3))
      i += 4
    }
    while (i < n) { acc0 += math.abs(a(i) - b(i)); i += 1 }
    ((acc0 + acc1) + (acc2 + acc3)).toDouble
  }

  def cosineF32(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot0 = 0f; var dot1 = 0f
    var na0 = 0f; var na1 = 0f
    var nb0 = 0f; var nb1 = 0f
    var i = 0
    val n2 = n - (n & 1)
    while (i < n2) {
      val x0 = a(i); val y0 = b(i)
      val x1 = a(i + 1); val y1 = b(i + 1)
      dot0 += x0 * y0; na0 += x0 * x0; nb0 += y0 * y0
      dot1 += x1 * y1; na1 += x1 * x1; nb1 += y1 * y1
      i += 2
    }
    while (i < n) { val x = a(i); val y = b(i); dot0 += x * y; na0 += x * x; nb0 += y * y; i += 1 }
    val dot = (dot0 + dot1).toDouble
    val na = (na0 + na1).toDouble
    val nb = (nb0 + nb1).toDouble
    math.abs(1.0 - dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  def distanceF32(metric: Int)(a: Array[Float], b: Array[Float]): Double = metric match {
    case Euclidean => euclideanF32(a, b)
    case Manhattan => manhattanF32(a, b)
    case Cosine => cosineF32(a, b)
  }
}
