package graft.core

/** Deterministic, allocation-free hashing used for synthetic-data generation
  * and content-derived ids (SURVEY.md §2.7 F19: the reference's
  * `Element_<monotonic index>` ids — /root/reference/code/graph/html_edges.py:116 —
  * are run-order-dependent; we require content-derived ids for reproducibility
  * across runs and parallelism levels).
  *
  * Inside Spark plans we use the built-in `xxhash64` expression (codegen'd);
  * this object is for driver/generator-side pure functions only.
  */
object Hashing {
  /** SplitMix64 finalizer — public-domain mixing function (Steele et al.). */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Combine a seed with ints into one well-mixed long (pure function). */
  def h(seed: Long, ks: Long*): Long = {
    var acc = mix64(seed)
    var i = 0
    while (i < ks.length) { acc = mix64(acc ^ ks(i)); i += 1 }
    acc
  }

  /** Uniform int in [0, n) from a hash. */
  @inline def bounded(hash: Long, n: Int): Int = {
    val m = hash % n
    (if (m < 0) m + n else m).toInt
  }
}
