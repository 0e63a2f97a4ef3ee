package graft.combiners

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Dense HyperLogLog++ register set. Only the first `1 << precision`
  * bytes are logical registers; encoded as a byte array so the Encoder
  * stays Catalyst-native.
  */
case class HllBuffer(precision: Int, registers: Array[Byte])

/** HyperLogLog++ distinct-count estimator, mirroring the reference's
  * combiner surface and guarantees (reference:
  * src/combiners/distinct.rs:274-389 `HllApproxDistinctCount`):
  *
  *  - default precision 12 (~1.6% relative standard error, the
  *    canonical Beam/Spark default — distinct.rs:286-295 error table);
  *  - [[HllAggregator.withError]] maps an error bound to the smallest
  *    precision with `1.04 / sqrt(2^p) <= error`, clamped to [4, 18]
  *    (distinct.rs:309-330 `with_error`);
  *  - zero-seeded deterministic hashing, so sequential and parallel
  *    runs — and any partitioning/retry — produce the SAME estimate
  *    (distinct.rs:269-272 determinism note);
  *  - merge is register-wise max: associative, commutative, idempotent.
  *
  * Estimator: dense registers, harmonic mean with the standard alpha_m
  * constant, and HLL++'s small-range correction (linear counting below
  * 5/2·m) — the reference's sparse-representation memory optimization
  * is intentionally omitted (register arrays are at most 256 KiB at
  * p=18, irrelevant beside Spark task overhead).
  */
class HllAggregator(precisionIn: Int = 12)
    extends Aggregator[String, HllBuffer, Long] {

  private val p = math.min(math.max(precisionIn, HllAggregator.MinPrecision), HllAggregator.MaxPrecision)
  private val m = 1 << p

  override def zero: HllBuffer = HllBuffer(p, new Array[Byte](m))

  override def reduce(buf: HllBuffer, v: String): HllBuffer = {
    val h = Hashing.hashString(v)
    // top p bits select the register; rank = leading zeros of the rest + 1
    val idx = (h >>> (64 - p)).toInt
    val rest = h << p
    val rank = (if (rest == 0L) (64 - p) else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > (buf.registers(idx) & 0xff))
      buf.registers(idx) = rank.toByte
    buf
  }

  override def merge(a: HllBuffer, b: HllBuffer): HllBuffer = {
    var i = 0
    while (i < m) {
      if ((b.registers(i) & 0xff) > (a.registers(i) & 0xff)) a.registers(i) = b.registers(i)
      i += 1
    }
    a
  }

  override def finish(buf: HllBuffer): Long = HllAggregator.estimate(buf)

  override def bufferEncoder: Encoder[HllBuffer] = Encoders.product[HllBuffer]
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllAggregator {

  /** Same precision range the reference accepts (distinct.rs:283-285). */
  val MinPrecision = 4
  val MaxPrecision = 18

  /** Smallest precision whose relative standard error 1.04/sqrt(2^p)
    * is at most `error` (reference: with_error, distinct.rs:309-330).
    */
  def withError(error: Double): HllAggregator = {
    require(!error.isNaN && !error.isInfinite && error > 0.0 && error < 1.0,
      s"approx_count_distinct error bound must be in (0, 1), got $error")
    val raw = math.ceil(2.0 * (math.log(1.04 / error) / math.log(2.0))).toInt
    new HllAggregator(math.min(math.max(raw, MinPrecision), MaxPrecision))
  }

  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Raw harmonic-mean estimate with HLL++ small-range linear-counting
    * correction (the published algorithm's estimator path).
    */
  def estimate(buf: HllBuffer): Long = {
    val m = 1 << buf.precision
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf.registers(i) & 0xff
      invSum += 1.0 / (1L << r).toDouble
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha(m) * m.toDouble * m.toDouble / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }
}
