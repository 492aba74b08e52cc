package graft.core

/** Pluggable distance kernel for graph-internal calls. The SIMD
  * implementation (`graft.internal.VectorKernels`, Panama Vector API) is
  * loaded reflectively so the library still runs on JVMs without
  * `--add-modules jdk.incubator.vector` — mirroring the reference's CPU
  * dispatch (`index/space/space.go:23-31`: AVX → SSE → native).
  */
trait DistKernel {
  def euclidean(a: Array[Float], b: Array[Float]): Double
  def manhattan(a: Array[Float], b: Array[Float]): Double
  def cosine(a: Array[Float], b: Array[Float]): Double
}

object DistKernel {
  private object Scalar extends DistKernel {
    def euclidean(a: Array[Float], b: Array[Float]): Double = Distances.euclideanF32(a, b)
    def manhattan(a: Array[Float], b: Array[Float]): Double = Distances.manhattanF32(a, b)
    def cosine(a: Array[Float], b: Array[Float]): Double = Distances.cosineF32(a, b)
  }

  /** Best available kernel: SIMD when the incubator module is present. */
  val best: DistKernel = {
    try {
      val cls = Class.forName("graft.internal.VectorKernels")
      val k = cls.getDeclaredConstructor().newInstance().asInstanceOf[DistKernel]
      // exercise once so linkage errors surface here, not mid-query
      val probe = Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f, 9f)
      require(math.abs(k.euclidean(probe, probe)) < 1e-9)
      k
    } catch {
      case _: Throwable => Scalar
    }
  }

  def isSimd: Boolean = best ne Scalar
}
