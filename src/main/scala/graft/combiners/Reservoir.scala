package graft.combiners

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Parallel arrays of (priority, value); kept sorted ascending by
  * priority, length <= k. O(k) memory per group.
  */
case class ReservoirBuffer(k: Int, priorities: Array[Long], values: Array[String])

/** Deterministic, mergeable, fixed-size sample: Efraimidis-Spirakis
  * priority sampling where the priority is a *content-based* hash of
  * (value, seed) — NOT a per-task RNG draw.
  *
  * Mirrors the reference's contract (reference:
  * src/combiners/sampling.rs:60-188): the sample is a pure function of
  * the input multiset and the seed, so sequential == parallel == any
  * repartitioning, and Spark task retries cannot change the result
  * (SURVEY.md §7.4 risk #2). Spark's df.sample is neither fixed-size
  * nor deterministic under re-planning, hence the custom Aggregator.
  *
  * Duplicate values get identical priorities (they tie; ties broken by
  * keeping the first insert), matching hash-priority semantics.
  */
class ReservoirAggregator(k: Int, seed: Long)
    extends Aggregator[String, ReservoirBuffer, Array[String]] {
  require(k > 0, s"ReservoirAggregator requires k > 0, got $k")

  override def zero: ReservoirBuffer =
    ReservoirBuffer(k, Array.empty[Long], Array.empty[String])

  private def insert(buf: ReservoirBuffer, p: Long, v: String): ReservoirBuffer = {
    val n = buf.priorities.length
    if (n >= buf.k && p >= buf.priorities(n - 1)) return buf
    var ins = java.util.Arrays.binarySearch(buf.priorities, p)
    if (ins >= 0) {
      // equal priority: identical value already sampled -> keep one
      if (buf.values(ins) == v) return buf
      ins += 1 // distinct value colliding on priority: insert after
    } else ins = -ins - 1
    val len = math.min(n + 1, buf.k)
    val outP = new Array[Long](len)
    val outV = new Array[String](len)
    var i = 0; var j = 0
    while (j < len) {
      if (j == ins && i == j) { outP(j) = p; outV(j) = v }
      else { outP(j) = buf.priorities(i); outV(j) = buf.values(i); i += 1 }
      j += 1
    }
    ReservoirBuffer(buf.k, outP, outV)
  }

  override def reduce(buf: ReservoirBuffer, v: String): ReservoirBuffer =
    insert(buf, Hashing.hashString(v, seed), v)

  override def merge(a: ReservoirBuffer, b: ReservoirBuffer): ReservoirBuffer = {
    var acc = a
    var i = 0
    while (i < b.priorities.length) {
      acc = insert(acc, b.priorities(i), b.values(i))
      i += 1
    }
    acc
  }

  override def finish(buf: ReservoirBuffer): Array[String] = buf.values

  override def bufferEncoder: Encoder[ReservoirBuffer] = Encoders.product[ReservoirBuffer]
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
