package graft

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.combiners._

/** Global combines + sketch surface on the typed facade (reference:
  * src/helpers/basic.rs, combine_global.rs, distinct.rs, statistical.rs,
  * sampling.rs). All are single Aggregators — Catalyst plans partial
  * aggregation map-side and a 1-row final merge; constant memory per
  * partition regardless of input size.
  */
object Sketches {

  implicit final class GlobalOps[T](private val self: PCollection[T]) {

    /** reference: combine_globally, src/helpers/combine_global.rs:50 */
    def combineGlobally[A, O](fn: CombineFn[T, A, O])(implicit
        be: Encoder[A],
        oe: Encoder[O]
    ): PCollection[O] =
      new PCollection(self.ds.select(CombineFn.toColumn(fn)))

    /** reference: count_globally, src/helpers/count.rs:38. Stays a lazy
      * 1-row agg plan (map-side partial count) — no eager action, so a
      * downstream pipeline keeps a single job.
      */
    def countGlobally(implicit e: Encoder[Long]): PCollection[Long] =
      new PCollection(
        self.ds.select(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).as[Long](e))

    def sumGlobally(implicit num: Numeric[T], e: Encoder[T]): PCollection[T] =
      reduceGlobally(num.plus)

    def minGlobally(implicit ord: Ordering[T], e: Encoder[T]): PCollection[T] =
      reduceGlobally((a, b) => if (ord.lteq(a, b)) a else b)

    def maxGlobally(implicit ord: Ordering[T], e: Encoder[T]): PCollection[T] =
      reduceGlobally((a, b) => if (ord.gteq(a, b)) a else b)

    def averageGlobally(implicit num: Numeric[T], e: Encoder[Double]): PCollection[Double] = {
      val fn = new CombineFn[T, (Double, Long), Double] {
        def create(): (Double, Long) = (0.0, 0L)
        def addInput(acc: (Double, Long), v: T): (Double, Long) = (acc._1 + num.toDouble(v), acc._2 + 1)
        def mergeAccumulators(a: (Double, Long), b: (Double, Long)): (Double, Long) = (a._1 + b._1, a._2 + b._2)
        def extractOutput(acc: (Double, Long)): Double = if (acc._2 == 0) Double.NaN else acc._1 / acc._2
      }
      implicit val be: Encoder[(Double, Long)] = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      combineGlobally(fn)
    }

    def meanGlobally(implicit num: Numeric[T], e: Encoder[Double]): PCollection[Double] = averageGlobally

    /** Lazy distributed reduce: a constant-key `reduceGroups` is
      * partially reduced map-side (one row per partition shuffles), and
      * the plan composes downstream without forcing an eager action.
      */
    private def reduceGlobally(f: (T, T) => T)(implicit e: Encoder[T]): PCollection[T] =
      new PCollection(
        self.ds.groupByKey(_ => 0)(Encoders.scalaInt).reduceGroups(f).map(_._2)(e))
  }

  implicit final class StringSketchOps(private val self: PCollection[String]) {

    /** KMV distinct estimate (reference: approx_distinct_count,
      * src/helpers/distinct.rs:90) — exact below k.
      */
    def approxDistinctCountKmv(k: Int, seed: Long = 0L)(implicit e: Encoder[Double]): PCollection[Double] =
      new PCollection(self.ds.select(new KmvAggregator(k, seed).toColumn))

    /** HLL++ distinct estimate with the reference's error-to-precision
      * mapping (reference: approx_count_distinct,
      * src/combiners/distinct.rs:274-389) — deterministic zero-seeded
      * hashing, so seq/par runs agree.
      */
    def approxDistinctCountHll(error: Double = 0.016)(implicit e: Encoder[Long]): PCollection[Long] =
      new PCollection(self.ds.select(HllAggregator.withError(error).toColumn))

    /** Deterministic mergeable fixed-size sample (reference:
      * sample_reservoir, src/helpers/sampling.rs:43) — a pure function
      * of (input multiset, seed).
      */
    def sampleReservoir(k: Int, seed: Long)(implicit e: Encoder[Array[String]]): PCollection[Array[String]] =
      new PCollection(self.ds.select(new ReservoirAggregator(k, seed).toColumn))
  }

  implicit final class KeyedSketchOps[K](private val self: PCollection[(K, String)]) {

    /** Per-key deterministic reservoir (reference: sample_per_key,
      * src/helpers/sampling.rs:164) — same content-hash priorities, so
      * the per-key samples are partition- and retry-invariant.
      */
    def samplePerKey(k: Int, seed: Long)(implicit
        ke: Encoder[K],
        e: Encoder[(K, Array[String])]
    ): PCollection[(K, Array[String])] = {
      val agg = new Aggregator[(K, String), ReservoirBuffer, Array[String]] {
        private val inner = new ReservoirAggregator(k, seed)
        override def zero: ReservoirBuffer = inner.zero
        override def reduce(b: ReservoirBuffer, a: (K, String)): ReservoirBuffer = inner.reduce(b, a._2)
        override def merge(a: ReservoirBuffer, b: ReservoirBuffer): ReservoirBuffer = inner.merge(a, b)
        override def finish(r: ReservoirBuffer): Array[String] = inner.finish(r)
        override def bufferEncoder: Encoder[ReservoirBuffer] = inner.bufferEncoder
        override def outputEncoder: Encoder[Array[String]] = inner.outputEncoder
      }
      new PCollection(self.ds.groupByKey(_._1).agg(agg.toColumn))
    }

    /** Per-key HLL++ distinct estimate — the per-key sibling of
      * [[StringSketchOps.approxDistinctCountHll]] (reference pattern:
      * approx_distinct_count_per_key, src/helpers/distinct.rs:290).
      */
    def approxDistinctCountHllPerKey(error: Double = 0.016)(implicit
        ke: Encoder[K],
        e: Encoder[(K, Long)]
    ): PCollection[(K, Long)] = {
      val agg = new Aggregator[(K, String), HllBuffer, Long] {
        private val inner = HllAggregator.withError(error)
        override def zero: HllBuffer = inner.zero
        override def reduce(b: HllBuffer, a: (K, String)): HllBuffer = inner.reduce(b, a._2)
        override def merge(a: HllBuffer, b: HllBuffer): HllBuffer = inner.merge(a, b)
        override def finish(r: HllBuffer): Long = inner.finish(r)
        override def bufferEncoder: Encoder[HllBuffer] = inner.bufferEncoder
        override def outputEncoder: Encoder[Long] = inner.outputEncoder
      }
      new PCollection(self.ds.groupByKey(_._1).agg(agg.toColumn))
    }

    /** Per-key KMV distinct estimate (reference:
      * approx_distinct_count_per_key, src/helpers/distinct.rs:290).
      */
    def approxDistinctCountKmvPerKey(kmvK: Int, seed: Long = 0L)(implicit
        ke: Encoder[K],
        e: Encoder[(K, Double)]
    ): PCollection[(K, Double)] = {
      val agg = new Aggregator[(K, String), KmvBuffer, Double] {
        private val inner = new KmvAggregator(kmvK, seed)
        override def zero: KmvBuffer = inner.zero
        override def reduce(b: KmvBuffer, a: (K, String)): KmvBuffer = inner.reduce(b, a._2)
        override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = inner.merge(a, b)
        override def finish(r: KmvBuffer): Double = inner.finish(r)
        override def bufferEncoder: Encoder[KmvBuffer] = inner.bufferEncoder
        override def outputEncoder: Encoder[Double] = inner.outputEncoder
      }
      new PCollection(self.ds.groupByKey(_._1).agg(agg.toColumn))
    }
  }

  implicit final class DoubleKeyedSketchOps[K](private val self: PCollection[(K, Double)]) {

    /** Per-key t-digest quantile set (reference:
      * approx_quantiles_per_key, src/helpers/statistical.rs:157) —
      * O(compression) state per key with map-side partial aggregation,
      * so shuffle payload per (key, map task) is a few KB regardless of
      * group size.
      */
    def approxQuantilesPerKey(qs: Seq[Double], compression: Double = 100.0)(implicit
        ke: Encoder[K],
        e: Encoder[(K, Seq[Double])]
    ): PCollection[(K, Seq[Double])] = {
      val agg = new Aggregator[(K, Double), TDigestBuffer, Seq[Double]] {
        private val inner = new TDigestAggregator(compression)
        override def zero: TDigestBuffer = inner.zero
        override def reduce(b: TDigestBuffer, a: (K, Double)): TDigestBuffer = inner.reduce(b, a._2)
        override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = inner.merge(a, b)
        override def finish(r: TDigestBuffer): Seq[Double] = {
          val d = inner.finish(r)
          qs.map(q => TDigest.quantile(d, q))
        }
        override def bufferEncoder: Encoder[TDigestBuffer] = Encoders.product[TDigestBuffer]
        override def outputEncoder: Encoder[Seq[Double]] =
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
      }
      new PCollection(self.ds.groupByKey(_._1).agg(agg.toColumn))
    }

    /** reference: approx_median_per_key, src/helpers/statistical.rs:127 */
    def approxMedianPerKey(compression: Double = 100.0)(implicit
        ke: Encoder[K],
        e: Encoder[(K, Double)]
    ): PCollection[(K, Double)] = {
      val agg = new Aggregator[(K, Double), TDigestBuffer, Double] {
        private val inner = new TDigestAggregator(compression)
        override def zero: TDigestBuffer = inner.zero
        override def reduce(b: TDigestBuffer, a: (K, Double)): TDigestBuffer = inner.reduce(b, a._2)
        override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = inner.merge(a, b)
        override def finish(r: TDigestBuffer): Double = TDigest.median(inner.finish(r))
        override def bufferEncoder: Encoder[TDigestBuffer] = Encoders.product[TDigestBuffer]
        override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
      }
      new PCollection(self.ds.groupByKey(_._1).agg(agg.toColumn))
    }
  }

  implicit final class DoubleSketchOps(private val self: PCollection[Double]) {

    /** t-digest quantiles (reference: approx_quantiles_globally,
      * src/helpers/statistical.rs:86).
      */
    def approxQuantiles(qs: Seq[Double], compression: Double = 100.0)(implicit
        e: Encoder[Seq[Double]]
    ): PCollection[Seq[Double]] = {
      implicit val bufEnc: Encoder[TDigestBuffer] = Encoders.product[TDigestBuffer]
      new PCollection(
        self.ds.select(new TDigestAggregator(compression).toColumn)
          .map(buf => qs.map(q => TDigest.quantile(buf, q)))
      )
    }

    /** reference: approx_median_globally, statistical.rs:54 */
    def approxMedian(compression: Double = 100.0)(implicit e: Encoder[Seq[Double]], de: Encoder[Double]): PCollection[Double] = {
      implicit val bufEnc: Encoder[TDigestBuffer] = Encoders.product[TDigestBuffer]
      new PCollection(
        self.ds.select(new TDigestAggregator(compression).toColumn).map(TDigest.median)
      )
    }
  }
}
