package graft.hnsw

/** Allocation-free binary heap over (distance: Double, slot: Int) pairs with
  * deterministic (dist, slot) lexicographic ordering — the primitive-array
  * replacement for boxed priority queues in the HNSW hot path (the
  * reference's `utils/priority_queue.go` min/max heaps).
  *
  * `max = true` → root is the LARGEST element (poll evicts worst, peek is
  * the current lower bound); `max = false` → root is the smallest.
  */
final class DistHeap(initialCapacity: Int, val max: Boolean) {
  private var dists = new Array[Double](math.max(4, initialCapacity))
  private var slots = new Array[Int](math.max(4, initialCapacity))
  private var count = 0

  /** Outputs of the last [[poll]]. */
  var polledDist: Double = 0.0
  var polledSlot: Int = -1

  def size: Int = count
  def isEmpty: Boolean = count == 0
  def peekDist: Double = dists(0)
  def peekSlot: Int = slots(0)

  @inline private def rootward(d1: Double, s1: Int, d2: Double, s2: Int): Boolean =
    if (max) d1 > d2 || (d1 == d2 && s1 > s2)
    else d1 < d2 || (d1 == d2 && s1 < s2)

  private def grow(): Unit = {
    dists = java.util.Arrays.copyOf(dists, dists.length * 2)
    slots = java.util.Arrays.copyOf(slots, slots.length * 2)
  }

  def push(d: Double, s: Int): Unit = {
    if (count == dists.length) grow()
    var pos = count
    dists(pos) = d
    slots(pos) = s
    count += 1
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (rootward(dists(pos), slots(pos), dists(parent), slots(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  def poll(): Unit = {
    polledDist = dists(0)
    polledSlot = slots(0)
    count -= 1
    if (count > 0) {
      dists(0) = dists(count)
      slots(0) = slots(count)
      var pos = 0
      var done = false
      while (!done) {
        val l = 2 * pos + 1
        val r = l + 1
        var best = pos
        if (l < count && rootward(dists(l), slots(l), dists(best), slots(best))) best = l
        if (r < count && rootward(dists(r), slots(r), dists(best), slots(best))) best = r
        if (best == pos) done = true
        else { swap(pos, best); pos = best }
      }
    }
  }

  @inline private def swap(i: Int, j: Int): Unit = {
    val td = dists(i); dists(i) = dists(j); dists(j) = td
    val ts = slots(i); slots(i) = slots(j); slots(j) = ts
  }

  def clear(): Unit = count = 0

  /** Unordered view of the backing arrays (first `size` entries valid). */
  def distAt(i: Int): Double = dists(i)
  def slotAt(i: Int): Int = slots(i)
}
