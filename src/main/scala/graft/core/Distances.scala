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
}
