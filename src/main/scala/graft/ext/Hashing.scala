package graft.ext

/** Deterministic 64-bit mixing used to derive hash families (MinHash
  * permutations, LSH hyperplane signs) from a base hash. Splitmix64
  * finalizer over `a ^ (b * GOLDEN)` — wraparound Java long arithmetic,
  * replicable in any engine with 128-bit integers as mod-2^64 unsigned
  * arithmetic (see the DuckDB oracles in [[ExtQueries]]).
  */
object Hashing {
  def mix64(a: Long, b: Long): Long = {
    var z = a ^ (b * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}
