package graft.core

/** Shared splitmix64 finalizer — THE deterministic hash/stream primitive the
  * engine's seeded choices come from (IVF seeding, LSH planes, HNSW levels
  * use the same constants). One definition so a constant tweak cannot
  * silently fork the deterministic streams the call sites promise.
  */
object SplitMix {

  /** splitmix64 finalizer of a single value. */
  @inline def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** [[mix]] mapped to a uniform double in [0, 1). */
  @inline def unit(x: Long): Double = (mix(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Seeded deterministic stream of uniform [0, 1) doubles. */
  final class Stream(seed: Long) {
    private var state = seed
    def nextUnit(): Double = {
      state += 0x9e3779b97f4a7c15L
      var x = state
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      ((x ^ (x >>> 31)) >>> 11).toDouble / (1L << 53).toDouble
    }
  }
}
