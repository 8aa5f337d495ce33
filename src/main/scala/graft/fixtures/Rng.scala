package graft.fixtures

/** SplitMix64 — deterministic, allocation-free, identical on every JVM.
  * One independent stream per document id, so corpus generation parallelizes
  * embarrassingly inside Spark tasks (no shared state).
  */
final class Rng(seed: Long) {
  private var s: Long = seed

  def nextLong(): Long = {
    s += 0x9E3779B97F4A7C15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def nextInt(bound: Int): Int = java.lang.Math.floorMod(nextLong(), bound.toLong).toInt

  /** i in [lo, hi] inclusive */
  def range(lo: Int, hi: Int): Int = lo + nextInt(hi - lo + 1)

  def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))

  def chance(pct: Int): Boolean = nextInt(100) < pct
}

object Rng {
  final val GlobalSeed = 42L

  /** Stable per-document stream: mix the corpus seed with the row id. */
  def forDoc(id: Long): Rng = new Rng(GlobalSeed * 0x9E3779B97F4A7C15L + id * 0xC2B2AE3D27D4EB4FL)
}
