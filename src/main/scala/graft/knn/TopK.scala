package graft.knn

/** Bounded top-k collector keeping the k smallest (distance, id) pairs with
  * deterministic lexicographic tie-break (distance, then id).
  *
  * Binary max-heap on (dist, id): the root is the current worst kept
  * candidate, so an incoming element only displaces it when strictly better.
  * This reproduces the reference's max-priority-queue result semantics
  * (`/root/reference/utils/priority_queue.go`, used by `index/hnsw.go:314`)
  * with an explicit id tie-break so distributed merges are deterministic.
  */
final class TopK(k: Int) {
  private val dists = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var count = 0

  def size: Int = count

  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (worse(dists(pos), ids(pos), dists(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(): Unit = {
    var pos = 0
    while (true) {
      val l = 2 * pos + 1
      val r = l + 1
      var largest = pos
      if (l < count && worse(dists(l), ids(l), dists(largest), ids(largest))) largest = l
      if (r < count && worse(dists(r), ids(r), dists(largest), ids(largest))) largest = r
      if (largest == pos) return
      swap(pos, largest)
      pos = largest
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = dists(i); dists(i) = dists(j); dists(j) = td
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
  }

  def push(dist: Double, id: Long): Unit = {
    if (count < k) {
      dists(count) = dist
      ids(count) = id
      count += 1
      siftUp(count - 1)
    } else if (k > 0 && worse(dists(0), ids(0), dist, id)) {
      dists(0) = dist
      ids(0) = id
      siftDown()
    }
  }

  /** Ascending (dist, id) order. */
  def sorted: Array[(Double, Long)] = {
    val out = Array.tabulate(count)(i => (dists(i), ids(i)))
    scala.util.Sorting.stableSort(out, (a: (Double, Long), b: (Double, Long)) =>
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2))
    out
  }

  def mergeFrom(other: TopK): Unit = {
    var i = 0
    while (i < other.count) {
      push(other.dists(i), other.ids(i))
      i += 1
    }
  }
}
