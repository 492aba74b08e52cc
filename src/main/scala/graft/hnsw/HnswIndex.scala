package graft.hnsw

import graft.core.Distances

import java.io.{DataInputStream, DataOutputStream}
import scala.collection.mutable

/** HNSW configuration, mirroring the reference defaults and derived values
  * (`/root/reference/index/config.go:104-133`): m=16, mMax=m, mMax0=2m,
  * ef=20, efConstruction=200, levelMultiplier=1/ln(m), simple neighbor
  * selection by default.
  */
final case class HnswConfig(
    m: Int = 16,
    mMaxOpt: Int = -1,
    mMax0Opt: Int = -1,
    ef: Int = 20,
    efConstruction: Int = 200,
    levelMultiplierOpt: Double = -1,
    heuristic: Boolean = false,
    extendCandidates: Boolean = false,
    keepPruned: Boolean = true) {
  val mMax: Int = if (mMaxOpt == -1) m else mMaxOpt
  val mMax0: Int = if (mMax0Opt == -1) 2 * m else mMax0Opt
  val levelMultiplier: Double =
    if (levelMultiplierOpt == -1) 1.0 / math.log(m.toDouble) else levelMultiplierOpt
}

/** Hierarchical Navigable Small World index (Malkov & Yashunin,
  * arXiv:1603.09320), matching the reference implementation's semantics
  * (`/root/reference/index/hnsw.go`):
  *
  *  - Insert (`hnsw.go:80-140`): greedy descent above the vertex level, then
  *    per-level ef-search, neighbor selection, bidirectional edges, prune
  *    past mMax (mMax0 at level 0).
  *  - Search (`hnsw.go:216-248`): greedy descent to level 1, ef-search at
  *    level 0, k best ascending.
  *  - Remove (`hnsw.go:164-215`): tombstone + entrypoint handoff to its
  *    closest neighbor + re-prune of touched neighbors. Deleted vertices are
  *    skipped during traversal (`hnsw.go:296,332`) but remain usable as
  *    through-nodes until pruned.
  *  - Deterministic level assignment: `floor(-ln(U)*levelMultiplier)`
  *    (`hnsw.go:249`, `math.RandomExponential`) with U derived from a
  *    splitmix64 hash of the item id, so distributed builds are reproducible.
  *
  * Hot paths are allocation-free: primitive [[DistHeap]]s (the analog of
  * `utils/priority_queue.go`), `java.util.BitSet` visited sets, tableswitch
  * metric dispatch.
  *
  * Single-threaded by design: one index per Spark partition, built inside
  * `mapPartitions` (see [[HnswSpark]]), which is the Spark-native analog of
  * the reference's per-partition indexes (`storage/partition.go`).
  */
final class HnswIndex(val metric: Int, val config: HnswConfig, val seed: Long = 42L) {

  /** Per-level adjacency: parallel primitive arrays (slot, dist). Edge
    * lists are bounded by mMax/mMax0 (≤ 32 by default), so linear append /
    * swap-remove beats hashing and avoids value boxing entirely.
    */
  final class EdgeList(initCap: Int) {
    var slots: Array[Int] = new Array[Int](initCap)
    var dists: Array[Double] = new Array[Double](initCap)
    var size: Int = 0
    def add(slot: Int, d: Double): Unit = {
      if (size == slots.length) {
        slots = java.util.Arrays.copyOf(slots, slots.length * 2)
        dists = java.util.Arrays.copyOf(dists, dists.length * 2)
      }
      slots(size) = slot; dists(size) = d; size += 1
    }
    def remove(slot: Int): Unit = {
      var i = 0
      while (i < size) {
        if (slots(i) == slot) {
          size -= 1
          slots(i) = slots(size); dists(i) = dists(size)
          return
        }
        i += 1
      }
    }
    def clear(): Unit = size = 0
  }

  /** `metadata`: opaque per-vertex payload carried through insert, search
    * results, and persistence (reference `index/hnsw.go:80` Insert,
    * `hnsw.go:242` search results, `hnsw_persistence.go:87,191`). Null when
    * the vertex has none.
    */
  final class Vertex(val id: Long, val vector: Array[Float], var level: Int,
      val metadata: Array[Byte] = null) {
    /** edges(l): per-level neighbor adjacency */
    var edges: Array[EdgeList] = Array.fill(level + 1)(new EdgeList(8))
    var deleted: Boolean = false
  }

  private val vertices = mutable.ArrayBuffer.empty[Vertex]
  private val idToSlot = mutable.LongMap.empty[Int]
  private var entrypoint: Int = -1

  def size: Int = idToSlot.size
  def entrypointId: Long = if (entrypoint == -1) -1L else vertices(entrypoint).id

  private val kernel = graft.core.DistKernel.best

  private def dist(a: Array[Float], b: Array[Float]): Double = metric match {
    case Distances.Euclidean => kernel.euclidean(a, b)
    case Distances.Manhattan => kernel.manhattan(a, b)
    case _ => kernel.cosine(a, b)
  }

  // -------------------------------------------------------- level assignment

  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Deterministic analog of `hnsw.go:249` RandomLevel. */
  def levelFor(id: Long): Int = {
    val bits = splitmix64(id ^ seed) >>> 11
    val u = (bits + 1).toDouble / (1L << 53).toDouble // (0, 1]
    math.floor(-math.log(u) * config.levelMultiplier).toInt
  }

  // ------------------------------------------------------------- primitives

  /** Greedy closest-neighbor descent at one level (`hnsw.go:289-312`). */
  private def greedyClosest(query: Array[Float], start: Int, startDist: Double, level: Int): (Int, Double) = {
    var ep = start
    var minDist = startDist
    var improved = true
    while (improved) {
      improved = false
      val edges = vertices(ep).edges(level)
      var bestN = -1
      var bestD = minDist
      var ei = 0
      while (ei < edges.size) {
        val n = edges.slots(ei)
        val v = vertices(n)
        if (!v.deleted) {
          val d = dist(query, v.vector)
          if (d < bestD) { bestD = d; bestN = n }
        }
        ei += 1
      }
      if (bestN != -1) { ep = bestN; minDist = bestD; improved = true }
    }
    (ep, minDist)
  }

  /** ef-bounded best-first search at one level (`hnsw.go:314-359`).
    * Returns up to ef nearest in a max-heap (root = worst kept).
    */
  private def searchLevel(query: Array[Float], entry: Int, ef: Int, level: Int): DistHeap = {
    val entryDist = dist(query, vertices(entry).vector)
    val candidates = new DistHeap(ef, max = false)
    val results = new DistHeap(ef + 1, max = true)
    candidates.push(entryDist, entry)
    results.push(entryDist, entry)
    val visited = new java.util.BitSet(vertices.size)
    visited.set(entry)

    var stop = false
    while (!stop && !candidates.isEmpty) {
      candidates.poll()
      val cd = candidates.polledDist
      val c = candidates.polledSlot
      if (cd > results.peekDist) {
        stop = true // reference hnsw.go:334: best candidate worse than worst result
      } else {
        val edges = vertices(c).edges(level)
        var ei = 0
        while (ei < edges.size) {
          val n = edges.slots(ei)
          if (!visited.get(n)) {
            visited.set(n)
            val v = vertices(n)
            if (!v.deleted) {
              val d = dist(query, v.vector)
              if (d < results.peekDist || results.size < ef) {
                candidates.push(d, n)
                results.push(d, n)
                if (results.size > ef) results.poll()
              }
            }
          }
          ei += 1
        }
      }
    }
    results
  }

  /** Simple selection (`hnsw.go:361-367`): keep the k closest. */
  private def selectSimple(neighbors: DistHeap, k: Int): DistHeap = {
    while (neighbors.size > k) neighbors.poll()
    neighbors
  }

  /** Heuristic selection (`hnsw.go:369-417`): optionally extend the candidate
    * set with candidate neighbors, then keep the k closest (the reference's
    * heuristic has no occlusion pruning; keepPruned only refills to k).
    */
  private def selectHeuristic(query: Array[Float], neighbors: DistHeap, k: Int, level: Int): DistHeap = {
    val candidates = new DistHeap(neighbors.size, max = false)
    val seen = new java.util.BitSet(vertices.size)
    val origSlots = new Array[Int](neighbors.size)
    var i = 0
    while (i < neighbors.size) {
      candidates.push(neighbors.distAt(i), neighbors.slotAt(i))
      seen.set(neighbors.slotAt(i))
      origSlots(i) = neighbors.slotAt(i)
      i += 1
    }

    if (config.extendCandidates) {
      var oi = 0
      while (oi < origSlots.length) {
        val edges = vertices(origSlots(oi)).edges(level)
        var ei = 0
        while (ei < edges.size) {
          val n = edges.slots(ei)
          val v = vertices(n)
          if (!v.deleted && !seen.get(n)) {
            seen.set(n)
            candidates.push(dist(query, v.vector), n)
          }
          ei += 1
        }
        oi += 1
      }
    }

    val result = new DistHeap(k + 1, max = true)
    while (!candidates.isEmpty && result.size < k) {
      candidates.poll()
      result.push(candidates.polledDist, candidates.polledSlot)
    }
    result
  }

  private def select(query: Array[Float], neighbors: DistHeap, k: Int, level: Int): DistHeap =
    if (config.heuristic) selectHeuristic(query, neighbors, k, level) else selectSimple(neighbors, k)

  /** Re-prune a vertex's level edges to k best (`hnsw.go:419-444`). */
  private def pruneNeighbors(slot: Int, k: Int, level: Int): Unit = {
    val v = vertices(slot)
    val el = v.edges(level)
    val q = new DistHeap(el.size, max = true)
    var ei = 0
    while (ei < el.size) {
      if (!vertices(el.slots(ei)).deleted) q.push(el.dists(ei), el.slots(ei))
      ei += 1
    }
    val kept = select(v.vector, q, k, level)
    el.clear()
    var i = 0
    while (i < kept.size) {
      el.add(kept.slotAt(i), kept.distAt(i))
      i += 1
    }
  }

  // ------------------------------------------------------------------ insert

  /** Insert with an explicit level (`hnsw.go:80-140`, which carries the
    * item's metadata the same way); use [[add]] for the deterministic
    * hashed level.
    */
  def insert(id: Long, vector: Array[Float], vertexLevel: Int,
      metadata: Array[Byte] = null): Unit = {
    if (idToSlot.contains(id)) throw new IllegalArgumentException(s"item already exists: $id")

    if (entrypoint == -1) {
      val v = new Vertex(id, vector, 0, metadata)
      vertices += v
      val slot = vertices.size - 1
      idToSlot(id) = slot
      entrypoint = slot
      return
    }

    val v = new Vertex(id, vector, vertexLevel, metadata)
    vertices += v
    val slot = vertices.size - 1
    idToSlot(id) = slot

    var ep = entrypoint
    val epVertex = vertices(ep)
    var minDist = dist(vector, epVertex.vector)
    var l = epVertex.level
    while (l > vertexLevel) {
      val r = greedyClosest(vector, ep, minDist, l)
      ep = r._1; minDist = r._2
      l -= 1
    }

    var level = math.min(vertices(ep).level, vertexLevel)
    while (level >= 0) {
      val found = searchLevel(vector, ep, config.efConstruction, level)
      val neighbors = select(vector, found, config.m, level)
      val mMax = if (level == 0) config.mMax0 else config.mMax

      while (!neighbors.isEmpty) {
        neighbors.poll() // max-heap: farthest first, last popped is closest
        val d = neighbors.polledDist
        val n = neighbors.polledSlot
        ep = n
        v.edges(level).add(n, d)
        val nv = vertices(n)
        nv.edges(level).add(slot, d)
        if (nv.edges(level).size > mMax) pruneNeighbors(n, mMax, level)
      }
      level -= 1
    }

    if (vertexLevel > vertices(entrypoint).level) entrypoint = slot
  }

  /** Insert with the deterministic hashed level (`hnsw.go:249` RandomLevel). */
  def add(id: Long, vector: Array[Float], metadata: Array[Byte] = null): Unit =
    insert(id, vector, levelFor(id), metadata)

  def contains(id: Long): Boolean = idToSlot.contains(id)

  def get(id: Long): Option[Array[Float]] = idToSlot.get(id).map(vertices(_).vector)

  /** Per-vertex metadata (reference `hnsw.go` vertex.Metadata()); None for
    * unknown ids, null element for vertices inserted without metadata.
    */
  def getMetadata(id: Long): Option[Array[Byte]] = idToSlot.get(id).map(vertices(_).metadata)

  // ------------------------------------------------------------------ remove

  /** Tombstone removal with entrypoint handoff (`hnsw.go:164-215`). */
  def remove(id: Long): Boolean = idToSlot.remove(id) match {
    case None => false
    case Some(slot) =>
      val v = vertices(slot)
      v.deleted = true

      if (entrypoint == slot) {
        var closest = -1
        var minDist = Double.MaxValue
        var l = v.level
        var found = false
        while (l >= 0 && !found) {
          val el = v.edges(l)
          var ei = 0
          while (ei < el.size) {
            val n = el.slots(ei)
            if (!vertices(n).deleted && el.dists(ei) < minDist) { minDist = el.dists(ei); closest = n }
            ei += 1
          }
          if (closest != -1) found = true
          l -= 1
        }
        entrypoint = closest // -1 when no live neighbor remains
        if (entrypoint == -1 && size > 0) {
          // graph disconnected from tombstone: fall back to any live vertex
          entrypoint = idToSlot.head._2
        }
      }

      var l = v.level
      while (l >= 0) {
        val mMax = if (l == 0) config.mMax0 else config.mMax
        val neighborSlots = java.util.Arrays.copyOf(v.edges(l).slots, v.edges(l).size)
        neighborSlots.foreach { n =>
          vertices(n).edges(l).remove(slot)
          pruneNeighbors(n, mMax, l)
        }
        l -= 1
      }
      true
  }

  // ------------------------------------------------------------------ search

  /** Filtered top-k search: like [[search]] but only ids satisfying
    * `allow` are returned. Filtered-out vertices still serve as
    * through-nodes (same mechanics as tombstones), so recall degrades
    * gracefully under selective filters instead of the graph disconnecting.
    * ef is widened by the caller via `k` when filters are very selective.
    */
  def searchFiltered(query: Array[Float], k: Int, allow: Long => Boolean, efOverride: Int = 0): Array[(Long, Double)] = {
    if (entrypoint == -1) return Array.empty
    var ep = entrypoint
    var minDist = dist(query, vertices(ep).vector)
    var l = vertices(ep).level
    while (l > 0) {
      val r = greedyClosest(query, ep, minDist, l)
      ep = r._1; minDist = r._2
      l -= 1
    }
    // widen ef under selective filters so enough allowed candidates survive
    val ef = math.max(math.max(config.ef, k), efOverride)
    val found = searchLevel(query, ep, ef, 0)
    // drain ascending, keep allowed
    val buf = new Array[(Long, Double)](found.size)
    var i = found.size - 1
    while (i >= 0) {
      found.poll()
      buf(i) = (vertices(found.polledSlot).id, found.polledDist)
      i -= 1
    }
    buf.iterator.filter { case (id, _) => allow(id) }.take(k).toArray
  }

  /** Shared search core: ascending (slot, distance) of the k best. */
  private def searchSlots(query: Array[Float], k: Int): Array[(Int, Double)] = {
    if (entrypoint == -1) return Array.empty
    var ep = entrypoint
    var minDist = dist(query, vertices(ep).vector)
    var l = vertices(ep).level
    while (l > 0) {
      val r = greedyClosest(query, ep, minDist, l)
      ep = r._1; minDist = r._2
      l -= 1
    }

    val ef = math.max(config.ef, k)
    val found = searchLevel(query, ep, ef, 0)
    val selected = select(query, found, k, 0)

    val n = math.min(k, selected.size)
    val out = new Array[(Int, Double)](n)
    var i = n - 1
    while (i >= 0) {
      selected.poll()
      out(i) = (selected.polledSlot, selected.polledDist)
      i -= 1
    }
    out
  }

  /** Top-k search (`hnsw.go:216-248`): ascending (id, distance). */
  def search(query: Array[Float], k: Int): Array[(Long, Double)] =
    searchSlots(query, k).map { case (s, d) => (vertices(s).id, d) }

  /** Top-k search carrying per-vertex metadata (`hnsw.go:242`: results are
    * (id, metadata, distance)). Metadata element is null for vertices
    * inserted without it.
    */
  def searchWithMeta(query: Array[Float], k: Int): Array[(Long, Double, Array[Byte])] =
    searchSlots(query, k).map { case (s, d) => (vertices(s).id, d, vertices(s).metadata) }

  private[hnsw] def restoreVertex(v: Vertex): Unit = {
    vertices += v
    idToSlot(v.id) = vertices.size - 1
  }

  /** Live vertices as (id, vector, level, metadata) rows — the relational
    * view of the graph that [[graft.sources.HnswDataSource]] exposes as a
    * Spark table. Tombstoned vertices are excluded: they are through-nodes
    * of the graph, not members of the dataset.
    */
  def vertexRows: Iterator[(Long, Array[Float], Int, Array[Byte])] =
    vertices.iterator.filter(!_.deleted).map(v => (v.id, v.vector, v.level, v.metadata))

  private[hnsw] def restoreEntrypoint(slot: Int): Unit = entrypoint = slot

  // ------------------------------------------------------------- persistence

  /** Big-endian binary save (semantics of `index/hnsw_persistence.go`,
    * which persists vertex metadata at `hnsw_persistence.go:87,191`):
    * header + config + live vertices (id, level, vector, metadata) +
    * per-level edges. Format v2 adds the per-vertex metadata section
    * (length-prefixed, -1 = none); v1 files still load.
    */
  def save(out: DataOutputStream): Unit = {
    out.writeInt(0x47484e57) // "GHNW"
    out.writeInt(2)
    out.writeInt(metric)
    out.writeInt(config.m); out.writeInt(config.mMax); out.writeInt(config.mMax0)
    out.writeInt(config.ef); out.writeInt(config.efConstruction)
    out.writeDouble(config.levelMultiplier)
    out.writeBoolean(config.heuristic); out.writeBoolean(config.extendCandidates)
    out.writeBoolean(config.keepPruned)
    out.writeLong(seed)

    val live = vertices.zipWithIndex.filter(!_._1.deleted)
    val slotToOrd = live.map(_._2).zipWithIndex.toMap
    out.writeInt(live.size)
    out.writeInt(if (entrypoint != -1 && slotToOrd.contains(entrypoint)) slotToOrd(entrypoint) else -1)
    live.foreach { case (v, _) =>
      out.writeLong(v.id)
      out.writeInt(v.level)
      out.writeInt(v.vector.length)
      v.vector.foreach(out.writeFloat)
      if (v.metadata == null) out.writeInt(-1)
      else { out.writeInt(v.metadata.length); out.write(v.metadata) }
    }
    live.foreach { case (v, _) =>
      var l = 0
      while (l <= v.level) {
        val el = v.edges(l)
        val kept = (0 until el.size).flatMap { i =>
          slotToOrd.get(el.slots(i)).map(ord => (ord, el.dists(i)))
        }.sortBy(_._1)
        out.writeInt(kept.length)
        kept.foreach { case (ord, d) => out.writeInt(ord); out.writeDouble(d) }
        l += 1
      }
    }
    out.flush()
  }
}

object HnswIndex {
  def load(in: DataInputStream): HnswIndex = {
    require(in.readInt() == 0x47484e57, "bad magic")
    val version = in.readInt()
    require(version == 1 || version == 2, s"bad version: $version")
    val metric = in.readInt()
    val m = in.readInt(); val mMax = in.readInt(); val mMax0 = in.readInt()
    val ef = in.readInt(); val efC = in.readInt()
    val lm = in.readDouble()
    val heuristic = in.readBoolean(); val extend = in.readBoolean(); val keep = in.readBoolean()
    val seed = in.readLong()
    val config = HnswConfig(m, mMax, mMax0, ef, efC, lm, heuristic, extend, keep)
    val idx = new HnswIndex(metric, config, seed)

    val n = in.readInt()
    val epOrd = in.readInt()
    val verts = (0 until n).map { _ =>
      val id = in.readLong()
      val level = in.readInt()
      val dim = in.readInt()
      val vec = Array.fill(dim)(in.readFloat())
      val meta =
        if (version < 2) null
        else {
          val len = in.readInt()
          if (len < 0) null
          else { val b = new Array[Byte](len); in.readFully(b); b }
        }
      val v = new idx.Vertex(id, vec, level, meta)
      idx.restoreVertex(v)
      v
    }
    (0 until n).foreach { i =>
      val v = verts(i)
      var l = 0
      while (l <= v.level) {
        val cnt = in.readInt()
        (0 until cnt).foreach { _ =>
          val ord = in.readInt()
          val d = in.readDouble()
          v.edges(l).add(ord, d)
        }
        l += 1
      }
    }
    idx.restoreEntrypoint(epOrd)
    idx
  }
}
