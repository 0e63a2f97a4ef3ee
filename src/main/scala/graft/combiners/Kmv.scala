package graft.combiners

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer: the k smallest *distinct* 64-bit hashes seen so far, kept
  * sorted ascending (unsigned order mapped to signed by flipping the
  * sign bit on insert). Constant memory per group: O(k).
  */
case class KmvBuffer(k: Int, hashes: Array[Long])

/** KMV (k-minimum-values) distinct-count estimator.
  *
  * Mirrors the reference's estimator semantics
  * (reference: src/combiners/distinct.rs:107-228): exact count when
  * fewer than k distinct values have been seen; otherwise the classic
  * estimate `(k - 1) / r_k` where `r_k` is the k-th smallest hash
  * normalized to (0, 1). `k` is clamped to >= 4 like the reference
  * (src/combiners/distinct.rs:119-124).
  *
  * Spark has no KMV built-in (its approx_count_distinct is HLL++), so
  * this is a custom `Aggregator` — mergeable, so Catalyst runs it as
  * partial aggregation map-side with a constant-size shuffle payload.
  */
class KmvAggregator(kRaw: Int, seed: Long = 0L)
    extends Aggregator[String, KmvBuffer, Double] {
  private val k = math.max(kRaw, 4)

  override def zero: KmvBuffer = KmvBuffer(k, Array.empty[Long])

  /** Insert keeping the array sorted, distinct, and <= k long. Values
    * are stored sign-flipped so signed sort == unsigned hash order.
    */
  private def insert(buf: KmvBuffer, hRaw: Long): KmvBuffer = {
    val h = hRaw ^ Long.MinValue // unsigned -> signed order
    val a = buf.hashes
    val pos = java.util.Arrays.binarySearch(a, h)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (a.length < k) {
        val out = new Array[Long](a.length + 1)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, a.length - ins)
        KmvBuffer(k, out)
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(a, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(a, ins, out, ins + 1, k - ins - 1)
        KmvBuffer(k, out)
      } else buf
    }
  }

  override def reduce(buf: KmvBuffer, v: String): KmvBuffer =
    insert(buf, Hashing.hashString(v, seed))

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer =
    b.hashes.foldLeft(a)((acc, h) => insert(acc, h ^ Long.MinValue))

  override def finish(buf: KmvBuffer): Double = {
    val n = buf.hashes.length
    if (n < k) n.toDouble
    else {
      // stored values are sign-flipped (signed s = unsigned u - 2^63), so
      // u = s - Long.MinValue; normalize the k-th minimum to (0,1)
      val kth = buf.hashes(k - 1).toDouble - Long.MinValue.toDouble
      val r = kth / 1.8446744073709552e19 // 2^64
      if (r <= 0.0) n.toDouble else (k - 1).toDouble / r
    }
  }

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Kmv {
  def column(k: Int, seed: Long = 0L): TypedColumn[String, Double] =
    new KmvAggregator(k, seed).toColumn.name("kmv_distinct")
}
