package graft

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import scala.language.implicitConversions
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Keyed operations on `PCollection[(K, V)]`, mirroring the reference's
  * impl blocks on `PCollection<(K, V)>` (reference: src/helpers/keyed.rs,
  * basic.rs, count.rs, collect_values.rs, joins.rs, co_gbk.rs).
  *
  * All shuffling ops go through `groupByKey` / `joinWith`, i.e. Catalyst
  * plans them as HashAggregate(partial) -> Exchange -> HashAggregate
  * (final) or broadcast/sort-merge joins with AQE — the distributed
  * versions of the reference's single-threaded barrier merges
  * (src/runner.rs:679-715, the reference's scalability bottleneck).
  */
final class KeyedPCollection[K, V](val self: PCollection[(K, V)]) extends Serializable {
  private def ds: Dataset[(K, V)] = self.ds

  // ---- projections (reference: src/helpers/keyed.rs:130,153,279) ----

  def keys(implicit e: Encoder[K]): PCollection[K] =
    new PCollection(ds.map(_._1))

  def values(implicit e: Encoder[V]): PCollection[V] =
    new PCollection(ds.map(_._2))

  def kvSwap(implicit e: Encoder[(V, K)]): PCollection[(V, K)] =
    new PCollection(ds.map { case (k, v) => (v, k) })

  // ---- value-only transforms (reference: src/helpers/values.rs:67,105) ----

  def mapValues[O](f: V => O)(implicit e: Encoder[(K, O)]): PCollection[(K, O)] =
    new PCollection(ds.map { case (k, v) => (k, f(v)) })

  def filterValues(p: V => Boolean): PCollection[(K, V)] =
    new PCollection(ds.filter(kv => p(kv._2)))

  // ---- grouping (reference: src/helpers/keyed.rs:213-252) ----

  def groupByKey(implicit ke: Encoder[K], e: Encoder[(K, Seq[V])]): PCollection[(K, Seq[V])] =
    new PCollection(
      ds.groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).toSeq))
    )

  /** Per-key batches (reference: group_into_batches,
    * src/helpers/batches.rs:297).
    */
  def groupIntoBatches(size: Int)(implicit
      ke: Encoder[K],
      e: Encoder[(K, Seq[V])]
  ): PCollection[(K, Seq[V])] =
    new PCollection(
      ds.groupByKey(_._1)
        .flatMapGroups((k, it) => it.map(_._2).grouped(size).map(b => (k, b.toSeq)))
    )

  /** Batched value transform, arity-preserving (reference:
    * map_values_batches, src/helpers/batches.rs:231 — asserts
    * out.len == in.len like the reference).
    */
  def mapValuesBatches[O](size: Int)(f: Seq[V] => Seq[O])(implicit
      e: Encoder[(K, O)]
  ): PCollection[(K, O)] =
    new PCollection(ds.mapPartitions { it =>
      it.grouped(size).flatMap { chunk =>
        val out = f(chunk.map(_._2))
        require(out.size == chunk.size,
          s"mapValuesBatches: arity mismatch (${chunk.size} in, ${out.size} out)")
        chunk.map(_._1).zip(out)
      }
    })

  // ---- combining (reference: src/helpers/combine.rs:66-143) ----

  /** Combine-per-key with a user CombineFn. Catalyst runs the partial /
    * merge phases map-side and post-shuffle respectively — the lifted
    * form the reference's planner pass #6 (src/planner.rs:1603) creates
    * by hand is automatic here.
    */
  def combineValues[A, O](fn: CombineFn[V, A, O])(implicit
      ke: Encoder[K],
      be: Encoder[A],
      oe: Encoder[O],
      pe: Encoder[(K, O)]
  ): PCollection[(K, O)] = {
    val agg: Aggregator[(K, V), A, O] = new Aggregator[(K, V), A, O] {
      override def zero: A = fn.create()
      override def reduce(b: A, a: (K, V)): A = fn.addInput(b, a._2)
      override def merge(b1: A, b2: A): A = fn.mergeAccumulators(b1, b2)
      override def finish(r: A): O = fn.extractOutput(r)
      override def bufferEncoder: Encoder[A] = be
      override def outputEncoder: Encoder[O] = oe
    }
    new PCollection(ds.groupByKey(_._1).agg(agg.toColumn))
  }

  // ---- convenience per-key reductions (reference: src/helpers/basic.rs) ----

  def sumPerKey(implicit num: Numeric[V], ke: Encoder[K], e: Encoder[(K, V)]): PCollection[(K, V)] =
    new PCollection(ds.groupByKey(_._1).reduceGroups((a: (K, V), b: (K, V)) => (a._1, num.plus(a._2, b._2))).map(_._2))

  def minPerKey(implicit ord: Ordering[V], ke: Encoder[K], e: Encoder[(K, V)]): PCollection[(K, V)] =
    new PCollection(ds.groupByKey(_._1).reduceGroups((a: (K, V), b: (K, V)) => if (ord.lteq(a._2, b._2)) a else b).map(_._2))

  def maxPerKey(implicit ord: Ordering[V], ke: Encoder[K], e: Encoder[(K, V)]): PCollection[(K, V)] =
    new PCollection(ds.groupByKey(_._1).reduceGroups((a: (K, V), b: (K, V)) => if (ord.gteq(a._2, b._2)) a else b).map(_._2))

  def averagePerKey(implicit num: Numeric[V], ke: Encoder[K], e: Encoder[(K, Double)],
      be: Encoder[(Double, Long)]): PCollection[(K, Double)] = {
    val agg = new Aggregator[(K, V), (Double, Long), Double] {
      override def zero: (Double, Long) = (0.0, 0L)
      override def reduce(b: (Double, Long), a: (K, V)): (Double, Long) =
        (b._1 + num.toDouble(a._2), b._2 + 1)
      override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      override def finish(r: (Double, Long)): Double = if (r._2 == 0) Double.NaN else r._1 / r._2
      override def bufferEncoder: Encoder[(Double, Long)] = be
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
    new PCollection(ds.groupByKey(_._1)(ke).agg(agg.toColumn))
  }

  def meanPerKey(implicit num: Numeric[V], ke: Encoder[K], e: Encoder[(K, Double)],
      be: Encoder[(Double, Long)]): PCollection[(K, Double)] = averagePerKey

  // ---- counting (reference: src/helpers/count.rs:116) ----

  def countPerKey(implicit ke: Encoder[K], e: Encoder[(K, Long)]): PCollection[(K, Long)] =
    new PCollection(ds.groupByKey(_._1).count())

  // ---- collecting (reference: src/helpers/collect_values.rs) ----

  def toListPerKey(implicit ke: Encoder[K], e: Encoder[(K, Seq[V])]): PCollection[(K, Seq[V])] =
    groupByKey

  def toSetPerKey(implicit ke: Encoder[K], e: Encoder[(K, Seq[V])]): PCollection[(K, Seq[V])] =
    new PCollection(
      ds.groupByKey(_._1).mapGroups((k, it) => (k, it.map(_._2).toSet.toSeq))
    )

  /** Driver-side materialization to a Map (reference: to_dict,
    * src/helpers/collect_values.rs:212; to_hashmap keyed.rs:181).
    *
    * This is BY CONTRACT a bounded-result operation — the reference's
    * to_dict collects into process memory too, and the contract the
    * reference leaves implicit holds here: call it only on relations
    * already reduced to driver scale (a config table, an aggregate's
    * output), never on a corpus-sized stream. `maxRows` makes the
    * expectation enforceable: the default (1 M entries) fails loudly
    * before a runaway collect kills the driver, and callers with a
    * genuinely larger bounded result can raise it deliberately. Later
    * duplicate keys overwrite earlier ones, as in the reference —
    * but note the bound counts collected ROWS, pre-dedup: a
    * many-rows-few-keys relation should aggregate (e.g.
    * [[latestPerKey]]) before collecting, not lean on overwrite.
    */
  def toDict: Map[K, V] = toDict(1000000L)

  /** [[toDict]] with an explicit row bound. */
  def toDict(maxRows: Long): Map[K, V] = {
    require(maxRows >= 1L, s"toDict: maxRows must be >= 1, got $maxRows")
    val rows = ds.limit(
      // limit takes an Int; clamp so a caller-raised bound above 2^31
      // degrades to "no practical limit" instead of overflowing
      if (maxRows >= Int.MaxValue.toLong) Int.MaxValue else maxRows.toInt + 1).collect()
    require(rows.length <= maxRows,
      s"toDict: relation exceeds $maxRows rows — toDict is a driver-side " +
        "materialization for bounded relations; aggregate first or raise maxRows deliberately")
    rows.toMap
  }

  // ---- distinct (reference: src/helpers/distinct.rs:271) ----

  def distinctPerKey(implicit ke: Encoder[K], e: Encoder[(K, V)]): PCollection[(K, V)] =
    new PCollection(ds.distinct())

  def distinctCountPerKey(implicit ke: Encoder[K], e: Encoder[(K, Long)]): PCollection[(K, Long)] =
    new PCollection(
      ds.distinct().groupByKey(_._1).count()
    )

  // ---- joins (reference: src/helpers/joins.rs) ----
  //
  // The reference does Bloom-prefiltered in-memory hash joins with full
  // per-key cross products (src/helpers/joins.rs:148-252). Spark's
  // joinWith gives identical cross-product semantics; Catalyst picks
  // broadcast-hash vs sort-merge, and InjectRuntimeFilter provides the
  // Bloom semi-join pruning (enabled in Sessions).

  // join conditions resolve through per-side ALIASES, not ds("_1") ===
  // other.ds("_1"): when both sides share lineage (a self-join, or a
  // join against a projection of the same collection) the raw column
  // references carry the same dataset id and Spark's ambiguous-self-
  // join check rejects the query
  private def joinWithAliased[W, O: Encoder](
      other: PCollection[(K, W)], joinType: String)(
      f: ((K, V), (K, W)) => O): PCollection[O] =
    new PCollection({
      import org.apache.spark.sql.functions.col
      val joined = ds.alias("graft_l").joinWith(
        other.ds.alias("graft_r"), col("graft_l._1") === col("graft_r._1"), joinType)
      joined.map { case (l, r) => f(l, r) }
    })

  def joinInner[W](other: PCollection[(K, W)])(implicit
      e: Encoder[(K, (V, W))]
  ): PCollection[(K, (V, W))] =
    joinWithAliased(other, "inner")((l, r) => (l._1, (l._2, r._2)))

  def joinLeft[W](other: PCollection[(K, W)])(implicit
      e: Encoder[(K, (V, Option[W]))]
  ): PCollection[(K, (V, Option[W]))] =
    joinWithAliased(other, "left_outer")((l, r) => (l._1, (l._2, Option(r).map(_._2))))

  def joinRight[W](other: PCollection[(K, W)])(implicit
      e: Encoder[(K, (Option[V], W))]
  ): PCollection[(K, (Option[V], W))] =
    joinWithAliased(other, "right_outer")((l, r) => (r._1, (Option(l).map(_._2), r._2)))

  def joinFull[W](other: PCollection[(K, W)])(implicit
      e: Encoder[(K, (Option[V], Option[W]))]
  ): PCollection[(K, (Option[V], Option[W]))] =
    joinWithAliased(other, "full_outer") { (l, r) =>
      val k = if (l != null) l._1 else r._1
      (k, (Option(l).map(_._2), Option(r).map(_._2)))
    }

  /** 2-way co-group (reference: cogroup_by_key!, src/helpers/co_gbk.rs).
    * Full-outer grouping: every key present on either side appears once,
    * with the (possibly empty) value lists from each side.
    */
  def coGroupByKey[W](other: PCollection[(K, W)])(implicit
      ke: Encoder[K],
      e: Encoder[(K, (Seq[V], Seq[W]))]
  ): PCollection[(K, (Seq[V], Seq[W]))] = {
    val left = ds.groupByKey(_._1)
    val right = other.ds.groupByKey(_._1)
    new PCollection(
      left.cogroup(right)((k, ls, rs) =>
        Iterator.single((k, (ls.map(_._2).toSeq, rs.map(_._2).toSeq)))
      )
    )
  }

  /** 3-way co-group via the reference's own tagged-union strategy
    * (co_gbk.rs:8-15: tag each input, Flatten, GroupByKey, partition by
    * tag) — ONE shuffle for all three inputs instead of chained 2-way
    * cogroups, which is the shape that scales to the reference's
    * 10-way macro.
    */
  def coGroupByKey3[W, X](b: PCollection[(K, W)], c: PCollection[(K, X)])(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[W], Option[X]))],
      outEnc: Encoder[(K, (Seq[V], Seq[W], Seq[X]))]
  ): PCollection[(K, (Seq[V], Seq[W], Seq[X]))] = {
    type Tagged = (Int, Option[V], Option[W], Option[X])
    val ta = ds.map { case (k, v) => (k, (0, Some(v), None, None): Tagged) }
    val tb = b.ds.map { case (k, w) => (k, (1, None, Some(w), None): Tagged) }
    val tc = c.ds.map { case (k, x) => (k, (2, None, None, Some(x)): Tagged) }
    new PCollection(
      ta.union(tb).union(tc)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (
            items.collect { case (0, Some(v), _, _) => v },
            items.collect { case (1, _, Some(w), _) => w },
            items.collect { case (2, _, _, Some(x)) => x }
          ))
        }
    )
  }

  /** 4-way typed co-group, same tagged-union single-shuffle strategy as
    * [[coGroupByKey3]] (arbitrary-N DataFrame form:
    * [[graft.operators.CoGroup.coGroupN]]).
    */
  def coGroupByKey4[W, X, Y](
      b: PCollection[(K, W)],
      c: PCollection[(K, X)],
      d: PCollection[(K, Y)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[W], Option[X], Option[Y]))],
      outEnc: Encoder[(K, (Seq[V], Seq[W], Seq[X], Seq[Y]))]
  ): PCollection[(K, (Seq[V], Seq[W], Seq[X], Seq[Y]))] = {
    type Tagged = (Int, Option[V], Option[W], Option[X], Option[Y])
    val ta = ds.map { case (k, v) => (k, (0, Some(v), None, None, None): Tagged) }
    val tb = b.ds.map { case (k, w) => (k, (1, None, Some(w), None, None): Tagged) }
    val tc = c.ds.map { case (k, x) => (k, (2, None, None, Some(x), None): Tagged) }
    val td = d.ds.map { case (k, y) => (k, (3, None, None, None, Some(y)): Tagged) }
    new PCollection(
      ta.union(tb).union(tc).union(td)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (
            items.collect { case (0, Some(v), _, _, _) => v },
            items.collect { case (1, _, Some(w), _, _) => w },
            items.collect { case (2, _, _, Some(x), _) => x },
            items.collect { case (3, _, _, _, Some(y)) => y }
          ))
        }
    )
  }
  /** 5-way typed co-group (reference: cogroup_by_key! Tagged5,
    * src/helpers/co_gbk.rs:60-402) — same tagged-union single-shuffle
    * strategy as [[coGroupByKey3]]. Each tagged row has Some only in
    * its own slot, so per-slot extraction is a flatMap.
    */
  def coGroupByKey5[V2, V3, V4, V5](
      b: PCollection[(K, V2)],
      c: PCollection[(K, V3)],
      d: PCollection[(K, V4)],
      e: PCollection[(K, V5)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5]))],
      outEnc: Encoder[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5]))]
  ): PCollection[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5]))] = {
    type Tagged = (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5])
    val t1 = ds.map { case (k, v) => (k, (0, Some(v), None, None, None, None): Tagged) }
    val t2 = b.ds.map { case (k, v) => (k, (1, None, Some(v), None, None, None): Tagged) }
    val t3 = c.ds.map { case (k, v) => (k, (2, None, None, Some(v), None, None): Tagged) }
    val t4 = d.ds.map { case (k, v) => (k, (3, None, None, None, Some(v), None): Tagged) }
    val t5 = e.ds.map { case (k, v) => (k, (4, None, None, None, None, Some(v)): Tagged) }
    new PCollection(
      t1.union(t2).union(t3).union(t4).union(t5)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (items.flatMap(_._2), items.flatMap(_._3), items.flatMap(_._4),
            items.flatMap(_._5), items.flatMap(_._6)))
        }
    )
  }

  /** 6-way typed co-group (reference Tagged6). */
  def coGroupByKey6[V2, V3, V4, V5, V6](
      b: PCollection[(K, V2)],
      c: PCollection[(K, V3)],
      d: PCollection[(K, V4)],
      e: PCollection[(K, V5)],
      f: PCollection[(K, V6)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6]))],
      outEnc: Encoder[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6]))]
  ): PCollection[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6]))] = {
    type Tagged = (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6])
    val t1 = ds.map { case (k, v) => (k, (0, Some(v), None, None, None, None, None): Tagged) }
    val t2 = b.ds.map { case (k, v) => (k, (1, None, Some(v), None, None, None, None): Tagged) }
    val t3 = c.ds.map { case (k, v) => (k, (2, None, None, Some(v), None, None, None): Tagged) }
    val t4 = d.ds.map { case (k, v) => (k, (3, None, None, None, Some(v), None, None): Tagged) }
    val t5 = e.ds.map { case (k, v) => (k, (4, None, None, None, None, Some(v), None): Tagged) }
    val t6 = f.ds.map { case (k, v) => (k, (5, None, None, None, None, None, Some(v)): Tagged) }
    new PCollection(
      t1.union(t2).union(t3).union(t4).union(t5).union(t6)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (items.flatMap(_._2), items.flatMap(_._3), items.flatMap(_._4),
            items.flatMap(_._5), items.flatMap(_._6), items.flatMap(_._7)))
        }
    )
  }

  /** 7-way typed co-group (reference Tagged7). */
  def coGroupByKey7[V2, V3, V4, V5, V6, V7](
      b: PCollection[(K, V2)],
      c: PCollection[(K, V3)],
      d: PCollection[(K, V4)],
      e: PCollection[(K, V5)],
      f: PCollection[(K, V6)],
      g: PCollection[(K, V7)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7]))],
      outEnc: Encoder[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7]))]
  ): PCollection[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7]))] = {
    type Tagged = (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7])
    val t1 = ds.map { case (k, v) => (k, (0, Some(v), None, None, None, None, None, None): Tagged) }
    val t2 = b.ds.map { case (k, v) => (k, (1, None, Some(v), None, None, None, None, None): Tagged) }
    val t3 = c.ds.map { case (k, v) => (k, (2, None, None, Some(v), None, None, None, None): Tagged) }
    val t4 = d.ds.map { case (k, v) => (k, (3, None, None, None, Some(v), None, None, None): Tagged) }
    val t5 = e.ds.map { case (k, v) => (k, (4, None, None, None, None, Some(v), None, None): Tagged) }
    val t6 = f.ds.map { case (k, v) => (k, (5, None, None, None, None, None, Some(v), None): Tagged) }
    val t7 = g.ds.map { case (k, v) => (k, (6, None, None, None, None, None, None, Some(v)): Tagged) }
    new PCollection(
      t1.union(t2).union(t3).union(t4).union(t5).union(t6).union(t7)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (items.flatMap(_._2), items.flatMap(_._3), items.flatMap(_._4),
            items.flatMap(_._5), items.flatMap(_._6), items.flatMap(_._7),
            items.flatMap(_._8)))
        }
    )
  }

  /** 8-way typed co-group (reference Tagged8). */
  def coGroupByKey8[V2, V3, V4, V5, V6, V7, V8](
      b: PCollection[(K, V2)],
      c: PCollection[(K, V3)],
      d: PCollection[(K, V4)],
      e: PCollection[(K, V5)],
      f: PCollection[(K, V6)],
      g: PCollection[(K, V7)],
      h: PCollection[(K, V8)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7], Option[V8]))],
      outEnc: Encoder[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7], Seq[V8]))]
  ): PCollection[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7], Seq[V8]))] = {
    type Tagged = (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7], Option[V8])
    val t1 = ds.map { case (k, v) => (k, (0, Some(v), None, None, None, None, None, None, None): Tagged) }
    val t2 = b.ds.map { case (k, v) => (k, (1, None, Some(v), None, None, None, None, None, None): Tagged) }
    val t3 = c.ds.map { case (k, v) => (k, (2, None, None, Some(v), None, None, None, None, None): Tagged) }
    val t4 = d.ds.map { case (k, v) => (k, (3, None, None, None, Some(v), None, None, None, None): Tagged) }
    val t5 = e.ds.map { case (k, v) => (k, (4, None, None, None, None, Some(v), None, None, None): Tagged) }
    val t6 = f.ds.map { case (k, v) => (k, (5, None, None, None, None, None, Some(v), None, None): Tagged) }
    val t7 = g.ds.map { case (k, v) => (k, (6, None, None, None, None, None, None, Some(v), None): Tagged) }
    val t8 = h.ds.map { case (k, v) => (k, (7, None, None, None, None, None, None, None, Some(v)): Tagged) }
    new PCollection(
      t1.union(t2).union(t3).union(t4).union(t5).union(t6).union(t7).union(t8)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (items.flatMap(_._2), items.flatMap(_._3), items.flatMap(_._4),
            items.flatMap(_._5), items.flatMap(_._6), items.flatMap(_._7),
            items.flatMap(_._8), items.flatMap(_._9)))
        }
    )
  }

  /** 9-way typed co-group (reference Tagged9). */
  def coGroupByKey9[V2, V3, V4, V5, V6, V7, V8, V9](
      b: PCollection[(K, V2)],
      c: PCollection[(K, V3)],
      d: PCollection[(K, V4)],
      e: PCollection[(K, V5)],
      f: PCollection[(K, V6)],
      g: PCollection[(K, V7)],
      h: PCollection[(K, V8)],
      i: PCollection[(K, V9)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7], Option[V8], Option[V9]))],
      outEnc: Encoder[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7], Seq[V8], Seq[V9]))]
  ): PCollection[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7], Seq[V8], Seq[V9]))] = {
    type Tagged = (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7], Option[V8], Option[V9])
    val t1 = ds.map { case (k, v) => (k, (0, Some(v), None, None, None, None, None, None, None, None): Tagged) }
    val t2 = b.ds.map { case (k, v) => (k, (1, None, Some(v), None, None, None, None, None, None, None): Tagged) }
    val t3 = c.ds.map { case (k, v) => (k, (2, None, None, Some(v), None, None, None, None, None, None): Tagged) }
    val t4 = d.ds.map { case (k, v) => (k, (3, None, None, None, Some(v), None, None, None, None, None): Tagged) }
    val t5 = e.ds.map { case (k, v) => (k, (4, None, None, None, None, Some(v), None, None, None, None): Tagged) }
    val t6 = f.ds.map { case (k, v) => (k, (5, None, None, None, None, None, Some(v), None, None, None): Tagged) }
    val t7 = g.ds.map { case (k, v) => (k, (6, None, None, None, None, None, None, Some(v), None, None): Tagged) }
    val t8 = h.ds.map { case (k, v) => (k, (7, None, None, None, None, None, None, None, Some(v), None): Tagged) }
    val t9 = i.ds.map { case (k, v) => (k, (8, None, None, None, None, None, None, None, None, Some(v)): Tagged) }
    new PCollection(
      t1.union(t2).union(t3).union(t4).union(t5).union(t6).union(t7).union(t8).union(t9)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (items.flatMap(_._2), items.flatMap(_._3), items.flatMap(_._4),
            items.flatMap(_._5), items.flatMap(_._6), items.flatMap(_._7),
            items.flatMap(_._8), items.flatMap(_._9), items.flatMap(_._10)))
        }
    )
  }

  /** 10-way typed co-group — the reference macro's maximum arity
    * (cogroup_by_key! Tagged10, src/helpers/co_gbk.rs:402).
    */
  def coGroupByKey10[V2, V3, V4, V5, V6, V7, V8, V9, V10](
      b: PCollection[(K, V2)],
      c: PCollection[(K, V3)],
      d: PCollection[(K, V4)],
      e: PCollection[(K, V5)],
      f: PCollection[(K, V6)],
      g: PCollection[(K, V7)],
      h: PCollection[(K, V8)],
      i: PCollection[(K, V9)],
      j: PCollection[(K, V10)]
  )(implicit
      ke: Encoder[K],
      tagEnc: Encoder[(K, (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7], Option[V8], Option[V9], Option[V10]))],
      outEnc: Encoder[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7], Seq[V8], Seq[V9], Seq[V10]))]
  ): PCollection[(K, (Seq[V], Seq[V2], Seq[V3], Seq[V4], Seq[V5], Seq[V6], Seq[V7], Seq[V8], Seq[V9], Seq[V10]))] = {
    type Tagged = (Int, Option[V], Option[V2], Option[V3], Option[V4], Option[V5], Option[V6], Option[V7], Option[V8], Option[V9], Option[V10])
    val t1 = ds.map { case (k, v) => (k, (0, Some(v), None, None, None, None, None, None, None, None, None): Tagged) }
    val t2 = b.ds.map { case (k, v) => (k, (1, None, Some(v), None, None, None, None, None, None, None, None): Tagged) }
    val t3 = c.ds.map { case (k, v) => (k, (2, None, None, Some(v), None, None, None, None, None, None, None): Tagged) }
    val t4 = d.ds.map { case (k, v) => (k, (3, None, None, None, Some(v), None, None, None, None, None, None): Tagged) }
    val t5 = e.ds.map { case (k, v) => (k, (4, None, None, None, None, Some(v), None, None, None, None, None): Tagged) }
    val t6 = f.ds.map { case (k, v) => (k, (5, None, None, None, None, None, Some(v), None, None, None, None): Tagged) }
    val t7 = g.ds.map { case (k, v) => (k, (6, None, None, None, None, None, None, Some(v), None, None, None): Tagged) }
    val t8 = h.ds.map { case (k, v) => (k, (7, None, None, None, None, None, None, None, Some(v), None, None): Tagged) }
    val t9 = i.ds.map { case (k, v) => (k, (8, None, None, None, None, None, None, None, None, Some(v), None): Tagged) }
    val t10 = j.ds.map { case (k, v) => (k, (9, None, None, None, None, None, None, None, None, None, Some(v)): Tagged) }
    new PCollection(
      t1.union(t2).union(t3).union(t4).union(t5).union(t6).union(t7).union(t8).union(t9).union(t10)
        .groupByKey(_._1)
        .mapGroups { (k, it) =>
          val items = it.map(_._2).toSeq
          (k, (items.flatMap(_._2), items.flatMap(_._3), items.flatMap(_._4),
            items.flatMap(_._5), items.flatMap(_._6), items.flatMap(_._7),
            items.flatMap(_._8), items.flatMap(_._9), items.flatMap(_._10),
            items.flatMap(_._11)))
        }
    )
  }
}

object KeyedPCollection {
  implicit def toKeyed[K, V](pc: PCollection[(K, V)]): KeyedPCollection[K, V] =
    new KeyedPCollection(pc)
}
