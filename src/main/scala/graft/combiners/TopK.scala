package graft.combiners

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.ClassTag

/** Bounded top-k aggregator: O(k) memory per group, mergeable, output
  * sorted descending (largest first) — the distributed analog of the
  * reference's bounded min-heap combiner (reference:
  * src/combiners/topk.rs:23-126). Use `bottomK = true` for the k
  * smallest (topk.rs:128-205).
  *
  * For DataFrame-level top-k prefer the declarative forms (window
  * row_number <= k, or orderBy().limit(k) which Catalyst plans as
  * TakeOrderedAndProject) — this Aggregator is the typed/Dataset path
  * and the building block for `top_k_per_key` on arbitrary ordered T.
  */
class TopKAggregator[T: Ordering: ClassTag](k: Int, bottomK: Boolean = false)
    extends Aggregator[T, Array[T], Array[T]] {
  require(k > 0, s"TopKAggregator requires k > 0, got $k")

  private val ord0 = implicitly[Ordering[T]]
  // internal order: "better" elements are GREATER; we keep the k best
  private val ord = if (bottomK) ord0.reverse else ord0

  override def zero: Array[T] = Array.empty[T]

  /** Insertion point for v in a descending-sorted buffer (first index
    * whose element is strictly worse), by binary search — O(log k)
    * compares + one O(k) shift per accepted element instead of a full
    * O(k log k) re-sort.
    */
  private def insertionPoint(buf: Array[T], v: T, len: Int): Int = {
    var lo = 0
    var hi = len
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.gteq(buf(mid), v)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def reduce(buf: Array[T], v: T): Array[T] = {
    if (buf.length < k) {
      val pos = insertionPoint(buf, v, buf.length)
      val out = new Array[T](buf.length + 1)
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = v
      System.arraycopy(buf, pos, out, pos + 1, buf.length - pos)
      out
    } else if (ord.gt(v, buf(k - 1))) {
      val pos = insertionPoint(buf, v, k - 1)
      val out = new Array[T](k)
      System.arraycopy(buf, 0, out, 0, pos)
      out(pos) = v
      System.arraycopy(buf, pos, out, pos + 1, k - 1 - pos)
      out
    } else buf
  }

  override def merge(a: Array[T], b: Array[T]): Array[T] =
    (a ++ b).sorted(ord.reverse).take(k)

  override def finish(buf: Array[T]): Array[T] = buf

  override def bufferEncoder: Encoder[Array[T]] = Encoders.kryo[Array[T]]
  override def outputEncoder: Encoder[Array[T]] = Encoders.kryo[Array[T]]
}

/** Latest-by-timestamp (reference: src/combiners/latest.rs:61). The
  * DataFrame path is the built-in `max_by(value, ts)`; this typed form
  * serves Dataset pipelines of `Timestamped` values.
  *
  * Equal timestamps break ties by the greater value, so the result is a
  * pure max over (ts, value) — merge-order, partitioning and
  * task-retry invariant (a plain `if (a.ts >= b.ts) a else b` would let
  * the merge tree's shape pick the winner on ties).
  */
class LatestAggregator
    extends Aggregator[(Long, String), (Long, String), String] {
  override def zero: (Long, String) = (Long.MinValue, null)
  private def best(a: (Long, String), b: (Long, String)): (Long, String) =
    if (a._1 > b._1) a
    else if (a._1 < b._1) b
    else if (a._2 == null) b
    else if (b._2 == null) a
    else if (a._2.compareTo(b._2) >= 0) a
    else b
  override def reduce(b: (Long, String), a: (Long, String)): (Long, String) = best(a, b)
  override def merge(a: (Long, String), b: (Long, String)): (Long, String) = best(a, b)
  override def finish(r: (Long, String)): String = r._2
  override def bufferEncoder: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
