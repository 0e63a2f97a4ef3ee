package graft.combiners

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Centroid arrays kept parallel (means(i), weights(i)); only the first
  * `used` entries are logical content — the arrays may carry spare
  * capacity so the per-row insert path is O(1) amortized instead of a
  * full array copy per input (`means :+ v` was the hot-path cost of
  * every quantile query). Array-based case class so the Encoder stays
  * Catalyst-native (no Kryo) per SURVEY.md §7.4.
  */
case class TDigestBuffer(
    compression: Double,
    means: Array[Double],
    weights: Array[Double],
    used: Int
)

/** t-digest (Dunning) streaming quantile sketch.
  *
  * Mirrors the reference's estimator (reference:
  * src/combiners/quantiles.rs:34-310): default compression 100,
  * buffered inserts compressed once the centroid count exceeds
  * 2 x compression (quantiles.rs:84-86), non-finite inputs skipped
  * (quantiles.rs:74-77), quantile read by linear interpolation between
  * centroid means.
  *
  * Spark's built-in percentile_approx is Greenwald-Khanna; this
  * Aggregator exists for estimator-level parity and as the
  * constant-memory scale path (O(compression) per group regardless of
  * input size — shuffle payload is a few KB at compression=100).
  */
class TDigestAggregator(compression: Double = 100.0)
    extends Aggregator[Double, TDigestBuffer, TDigestBuffer] {

  private val comp = math.min(math.max(compression, 20.0), 1000.0)
  private val maxUnmerged = (2 * comp).toInt

  override def zero: TDigestBuffer =
    TDigestBuffer(comp, Array.empty[Double], Array.empty[Double], 0)

  override def reduce(buf: TDigestBuffer, v: Double): TDigestBuffer = {
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) buf
    else {
      var b = buf
      if (b.used >= b.means.length) {
        // capacity exhausted: compress the logical prefix, then move the
        // centroids into arrays with insertion headroom. Amortized O(1)
        // per row — the compress runs once per ~maxUnmerged inserts.
        val c = TDigest.compress(b)
        val cap = math.max(maxUnmerged, c.used * 2) + 64
        b = TDigestBuffer(
          b.compression,
          java.util.Arrays.copyOf(c.means, cap),
          java.util.Arrays.copyOf(c.weights, cap),
          c.used)
      }
      b.means(b.used) = v
      b.weights(b.used) = 1.0
      // new case-class instance shares the arrays — no per-row copy
      b.copy(used = b.used + 1)
    }
  }

  override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
    val n = a.used + b.used
    val m = new Array[Double](n)
    val w = new Array[Double](n)
    System.arraycopy(a.means, 0, m, 0, a.used)
    System.arraycopy(b.means, 0, m, a.used, b.used)
    System.arraycopy(a.weights, 0, w, 0, a.used)
    System.arraycopy(b.weights, 0, w, a.used, b.used)
    TDigest.compress(TDigestBuffer(comp, m, w, n))
  }

  override def finish(buf: TDigestBuffer): TDigestBuffer = TDigest.compress(buf)

  override def bufferEncoder: Encoder[TDigestBuffer] = Encoders.product[TDigestBuffer]
  override def outputEncoder: Encoder[TDigestBuffer] = Encoders.product[TDigestBuffer]
}

object TDigest {

  /** Merge-compress: sort centroids by mean, then greedily merge
    * neighbors subject to the k-size bound q(1-q) scaling (Dunning's
    * merging digest, as in the published t-digest paper). Output arrays
    * are exact-sized (used == length).
    */
  def compress(buf: TDigestBuffer): TDigestBuffer = {
    val n = buf.used
    if (n <= 1) {
      return TDigestBuffer(
        buf.compression,
        java.util.Arrays.copyOf(buf.means, n),
        java.util.Arrays.copyOf(buf.weights, n),
        n)
    }
    val idx = (0 until n).sortBy(buf.means(_))
    var total = 0.0
    var t = 0
    while (t < n) { total += buf.weights(t); t += 1 }
    val outM = new scala.collection.mutable.ArrayBuffer[Double](n)
    val outW = new scala.collection.mutable.ArrayBuffer[Double](n)
    var curM = buf.means(idx(0))
    var curW = buf.weights(idx(0))
    var wSoFar = 0.0
    var i = 1
    while (i < n) {
      val m = buf.means(idx(i))
      val w = buf.weights(idx(i))
      val q = (wSoFar + (curW + w) / 2.0) / total
      val limit = 4.0 * total * q * (1.0 - q) / buf.compression
      if (curW + w <= math.max(limit, 1.0)) {
        // weighted merge into the current centroid
        curM = (curM * curW + m * w) / (curW + w)
        curW += w
      } else {
        outM += curM; outW += curW
        wSoFar += curW
        curM = m; curW = w
      }
      i += 1
    }
    outM += curM; outW += curW
    TDigestBuffer(buf.compression, outM.toArray, outW.toArray, outM.length)
  }

  /** Quantile estimate by interpolation between centroid means. */
  def quantile(buf: TDigestBuffer, q: Double): Double = {
    val n = buf.used
    if (n == 0) return Double.NaN
    if (n == 1) return buf.means(0)
    val total = {
      var s = 0.0; var t = 0
      while (t < n) { s += buf.weights(t); t += 1 }
      s
    }
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < n) {
      val half = buf.weights(i) / 2.0
      if (cum + half >= target) {
        if (i == 0) return buf.means(0)
        val prevHalf = buf.weights(i - 1) / 2.0
        val lo = cum - prevHalf
        val hi = cum + half
        val t = if (hi == lo) 0.0 else (target - lo) / (hi - lo)
        return buf.means(i - 1) + t * (buf.means(i) - buf.means(i - 1))
      }
      cum += buf.weights(i)
      i += 1
    }
    buf.means(n - 1)
  }

  def median(buf: TDigestBuffer): Double = quantile(buf, 0.5)
}
