package graft.combiners

/** Deterministic, content-based 64-bit hashing shared by the sketch
  * aggregators.
  *
  * The reference derives sketch randomness from a zero-seeded /
  * value-derived hash so sequential and parallel runs agree
  * (reference: src/combiners/distinct.rs:232-272 `rank_from_value`,
  * src/combiners/sampling.rs:60-66). We keep that contract: priorities
  * and register ranks are functions of (value, seed) only — never of
  * partition layout or task-local RNG state — so results are stable
  * under repartitioning, AQE re-planning and task retries.
  */
object Hashing {

  /** xxHash-style avalanche finalizer (public domain construction,
    * same mixing as SplitMix64's finalizer).
    */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64 over UTF-8 bytes, then avalanched. */
  def hashString(s: String, seed: Long = 0L): Long = {
    var h = 0xcbf29ce484222325L ^ mix64(seed)
    val bytes = s.getBytes("UTF-8")
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    mix64(h)
  }

  def hashLong(v: Long, seed: Long = 0L): Long = mix64(v ^ mix64(seed))
}
