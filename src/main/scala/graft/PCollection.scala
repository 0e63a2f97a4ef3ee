package graft

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.storage.StorageLevel

import scala.reflect.ClassTag
import scala.util.Try

/** Fluent, typed, lazy collection facade mirroring the reference's
  * `PCollection<T>` surface (reference: src/collection.rs:91-96) on top
  * of Spark `Dataset[T]`.
  *
  * Design stance (SURVEY.md §7.1): every transform is a *declarative*
  * Dataset transformation — the logical plan stays visible to Catalyst,
  * so predicate pushdown, partial aggregation, AQE, broadcast selection
  * and whole-stage codegen replace the reference's hand-rolled planner
  * (src/planner.rs) wholesale. Nothing here materializes on the driver
  * except the explicit `collect*` terminals, exactly like the
  * reference's deferred-execution contract (src/lib.rs:452-458).
  */
final class PCollection[T](dsThunk: => Dataset[T]) extends Serializable {

  /** The underlying Dataset, built on first use — so ordering barriers
    * like [[waitOn]] can defer their signal action until a downstream
    * stage actually composes on this collection.
    */
  lazy val ds: Dataset[T] = dsThunk

  def spark: SparkSession = ds.sparkSession

  // ---- element-wise (reference: src/helpers/common.rs, stdlib.rs) ----

  def map[O: Encoder](f: T => O): PCollection[O] = new PCollection(ds.map(f))

  def flatMap[O: Encoder](f: T => IterableOnce[O]): PCollection[O] =
    new PCollection(ds.flatMap(f))

  def filter(p: T => Boolean): PCollection[T] = new PCollection(ds.filter(p))

  /** reference: filter_map, src/helpers/stdlib.rs:248-265 */
  def filterMap[O: Encoder](f: T => Option[O]): PCollection[O] =
    new PCollection(ds.flatMap(t => f(t).iterator))

  /** reference: to_display_string, src/helpers/display.rs:44 */
  def toDisplayString: PCollection[String] = {
    implicit val e: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    map(_.toString)
  }

  // ---- batching (reference: src/helpers/batches.rs) ----

  /** Chunk-wise map for CPU-amortized user code. Per-partition, so no
    * shuffle; batch boundaries are partition-local (same contract as the
    * reference's map_batches, src/helpers/batches.rs:64).
    */
  def mapBatches[O: Encoder](size: Int)(f: Seq[T] => Seq[O]): PCollection[O] =
    new PCollection(ds.mapPartitions(it => it.grouped(size).flatMap(chunk => f(chunk))))

  /** reference: batch_elements, src/helpers/batches.rs:120 */
  def batchElements(size: Int)(implicit e: Encoder[Seq[T]]): PCollection[Seq[T]] =
    new PCollection(ds.mapPartitions(_.grouped(size)))

  /** Size-bounded batching; an oversized element is emitted alone
    * (reference: batch_by_size, src/helpers/batches.rs:183).
    */
  def batchBySize(maxBytes: Long)(sizeFn: T => Long)(implicit
      e: Encoder[Seq[T]]
  ): PCollection[Seq[T]] =
    new PCollection(ds.mapPartitions { it =>
      new Iterator[Seq[T]] {
        private val buf = scala.collection.mutable.ArrayBuffer.empty[T]
        private var pending: Option[T] = None
        def hasNext: Boolean = pending.nonEmpty || it.hasNext
        def next(): Seq[T] = {
          buf.clear()
          var bytes = 0L
          var full = false
          while (!full && (pending.nonEmpty || it.hasNext)) {
            val t = pending.getOrElse(it.next())
            pending = None
            val sz = sizeFn(t)
            if (buf.isEmpty || bytes + sz <= maxBytes) { buf += t; bytes += sz }
            else { pending = Some(t); full = true }
          }
          buf.toSeq
        }
      }
    })

  // ---- keys (reference: src/helpers/keyed.rs) ----

  def keyBy[K](f: T => K)(implicit e: Encoder[(K, T)]): PCollection[(K, T)] =
    new PCollection(ds.map(t => (f(t), t)))

  def withKeys[K](f: T => K)(implicit e: Encoder[(K, T)]): PCollection[(K, T)] = keyBy(f)

  def withConstantKey[K](k: K)(implicit e: Encoder[(K, T)]): PCollection[(K, T)] =
    new PCollection(ds.map(t => (k, t)))

  // ---- limits (reference: src/helpers/common.rs:113,143) ----

  /** Catalyst plans this as LocalLimit -> GlobalLimit with incremental
    * job submission (CollectLimitExec) — the distributed version of the
    * reference's early-termination runner (src/runner.rs:863-893).
    */
  def take(n: Int): PCollection[T] = new PCollection(ds.limit(n))

  def first(): PCollection[T] = take(1)

  // ---- set ops (reference: src/helpers/flatten.rs, distinct.rs) ----

  def flatten(others: PCollection[T]*): PCollection[T] =
    new PCollection(others.foldLeft(ds)((acc, o) => acc.union(o.ds)))

  def union(other: PCollection[T]): PCollection[T] = flatten(other)

  def distinct(): PCollection[T] = new PCollection(ds.distinct())

  /** Dedup by extracted key, keeping one arbitrary element per key
    * (reference: distinct_by, src/helpers/distinct.rs:200). Implemented
    * with dropDuplicates on a derived column so Catalyst plans a
    * hash-aggregate (map-side partial dedup) instead of a full GBK.
    */
  def distinctBy[K: Encoder](f: T => K)(implicit e: Encoder[(K, T)]): PCollection[T] =
    new PCollection({
      implicit val te: Encoder[T] = ds.encoder
      ds.map(t => (f(t), t)).dropDuplicates("_1").map(_._2)
    })

  // ---- shuffle control (reference: src/helpers/reshuffle.rs) ----

  def reshuffle(partitions: Int): PCollection[T] =
    new PCollection(ds.repartition(partitions))

  def reshuffle(): PCollection[T] =
    new PCollection(ds.repartition(ds.sparkSession.sessionState.conf.numShufflePartitions))

  /** Durable checkpoint barrier through a
    * [[graft.sources.CheckpointManager]]: saves this collection as a
    * recoverable parquet snapshot (metadata checksum + retention
    * applied) and returns a collection reading FROM the snapshot, so
    * downstream stages run off materialized data — and after a crash a
    * new driver resumes from `mgr.recoverLatest` instead of recomputing
    * the upstream lineage (the reference runner's auto_recover flow,
    * reference: src/checkpoint.rs usage in README "Checkpointing").
    *
    * The save runs inside the returned collection's lazy thunk — the
    * same deferred contract as [[waitOn]]: WIRING a pipeline that
    * contains a checkpoint barrier runs no job; the snapshot is written
    * when (and only when) a downstream stage first composes on the
    * result.
    */
  def checkpointWith(mgr: graft.sources.CheckpointManager, pipelineId: String)(implicit
      e: Encoder[T]
  ): PCollection[T] =
    new PCollection({
      val dir = mgr.save(ds.toDF(), pipelineId)
      ds.sparkSession.read.parquet(dir.toString).as[T]
    })

  // ---- diagnostics / structure (reference: tee.rs, named.rs, log_elements.rs) ----

  /** Fan-out is free in Spark (reuse the handle); cache to avoid
    * recompute across terminals (reference tee: src/helpers/tee.rs:54;
    * the reference's dominator-based CSE cache, src/planner.rs:1816, is
    * Spark's InMemoryRelation).
    */
  def tee(): (PCollection[T], PCollection[T]) = {
    val cached = new PCollection(ds.persist(StorageLevel.MEMORY_AND_DISK))
    (cached, cached)
  }

  /** reference: tee_n, src/helpers/tee.rs:85 */
  def teeN(n: Int): Seq[PCollection[T]] = {
    val cached = new PCollection(ds.persist(StorageLevel.MEMORY_AND_DISK))
    Seq.fill(n)(cached)
  }

  def cache(): PCollection[T] = new PCollection(ds.persist(StorageLevel.MEMORY_AND_DISK))

  /** Attach a display name, qualified by any active
    * [[PCollection.namedScope]] path: `withName("Sum")` inside
    * `namedScope("WordCount") { ... }` names the node `WordCount/Sum`
    * (reference: with_name + Pipeline::qualify_with_scope,
    * src/pipeline.rs:355-380). Realized as a Dataset alias, so the
    * path shows up as a `SubqueryAlias` in the logical plan and in
    * [[explain]] output.
    */
  def withName(name: String): PCollection[T] = {
    // qualify EAGERLY: naming is a wiring-time concept — resolving it
    // inside the lazy thunk would read the scope stack after the
    // enclosing namedScope already popped
    val qualified = PCollection.qualifyWithScope(name)
    new PCollection(ds.alias(qualified))
  }

  /** Structured plan explanation (reference: `plan.explain()` ->
    * ExecutionExplanation, planner.rs:600-786 — steps with barrier
    * flags, per-node cost estimates, and the planner's optimization
    * log). Spark realization: walk the physical plan; a "barrier" is a
    * shuffle Exchange (the cost unit the reference counts), and
    * `suggestedPartitions` is the session's shuffle parallelism (the
    * reference's partition-suggestion pass is AQE + this setting).
    * `estimates` are Catalyst's OWN per-node statistics over the
    * optimized logical plan (root first, the plan's collect order) —
    * sizeInBytes always, rowCount when the stats pipeline can derive
    * one — deliberately NOT a custom cost model: the numbers shown are
    * the numbers the join-strategy and AQE decisions actually consume.
    * `rewrites` is the per-query optimization log from Spark's
    * QueryPlanningTracker: every rule that EFFECTIVELY changed this
    * plan, with its invocation count — the counterpart of the
    * reference's OptimizationDecision list (FusedStateless,
    * LiftedGBKCombine, ...), reported from the optimizer that really
    * ran rather than re-derived. The full formatted plan is included
    * for eyeballing.
    */
  def explain(): PCollection.Explanation = {
    // AQE wraps the real tree in AdaptiveSparkPlanExec whose inner plan
    // is a field, not a child — unwrap it or collect() sees one node
    val plan = ds.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val steps = plan.collect { case node =>
      val name = node.nodeName
      // only SHUFFLE exchanges are barriers in the reference's cost
      // model: a BroadcastExchange moves the small side without
      // repartitioning, and a ReusedExchange is a read of an
      // already-counted shuffle, not a second one
      val isShuffle = name.contains("Exchange") &&
        !name.contains("Broadcast") && !name.contains("Reused")
      PCollection.ExplainStep(name, isShuffle)
    }
    val optimized = ds.queryExecution.optimizedPlan
    val estimates = optimized.collect { case node =>
      val s = node.stats
      PCollection.CostStep(node.nodeName, s.rowCount, s.sizeInBytes)
    }
    // the tracker aggregates ANALYZER rules (ResolveReferences,
    // CleanupAliases, ...) in the same map — resolution bookkeeping
    // that fires on every query and would drown the log; only
    // optimizer-package rules are plan OPTIMIZATION decisions
    val rewrites = ds.queryExecution.tracker.rules.toSeq
      .filter { case (rule, summary) =>
        summary.numEffectiveInvocations > 0 && rule.contains(".optimizer.")
      }
      .sortBy { case (_, summary) => -summary.numEffectiveInvocations }
      .map { case (rule, summary) =>
        s"${rule.substring(rule.lastIndexOf('.') + 1)} x${summary.numEffectiveInvocations}"
      }
    // withName aliases surface as SubqueryAlias nodes in the ANALYZED
    // plan (the optimizer eliminates them, so collect before it runs)
    // — the reference's ExecutionExplanation.node_names footer
    val nodeNames = ds.queryExecution.analyzed.collect {
      case s: org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias => s.alias
    }
    PCollection.Explanation(
      steps = steps,
      barriers = steps.count(_.isBarrier),
      totalOps = steps.size,
      suggestedPartitions = ds.sparkSession.sessionState.conf.numShufflePartitions,
      formatted = plan.toString,
      estimates = estimates,
      rewrites = rewrites,
      nodeNames = nodeNames
    )
  }

  def logElements(prefix: String = ""): PCollection[T] =
    new PCollection({
      implicit val te: Encoder[T] = ds.encoder
      ds.map { t => System.err.println(s"$prefix$t"); t }
    })

  // ---- error handling (reference: try_process.rs, dead_letter.rs) ----

  /** reference: try_map, src/helpers/try_process.rs:67 */
  def tryMap[O](f: T => O)(implicit e: Encoder[(Option[O], Option[String])])
      : PCollection[(Option[O], Option[String])] =
    new PCollection(ds.map { t =>
      Try(f(t)).toEither match {
        case Right(o)  => (Some(o), None)
        case Left(err) => (None, Some(Option(err.getMessage).getOrElse(err.getClass.getName)))
      }
    })

  /** reference: try_flat_map, src/helpers/try_process.rs:99 */
  def tryFlatMap[O](f: T => IterableOnce[O])(implicit
      e: Encoder[(Option[O], Option[String])]
  ): PCollection[(Option[O], Option[String])] =
    new PCollection(ds.flatMap { t =>
      Try(f(t).iterator.toSeq).toEither match {
        case Right(os) => os.map(o => (Some(o), None: Option[String]))
        case Left(err) => Seq((None: Option[O], Some(Option(err.getMessage).getOrElse(err.getClass.getName))))
      }
    })

  /** Dead-letter pattern (reference: map_catching,
    * src/helpers/dead_letter.rs:142): one cached pass, two filtered
    * projections — Catalyst shares the scan.
    */
  def mapCatching[O](f: T => O)(implicit
      okEnc: Encoder[O],
      dlqEnc: Encoder[(T, String)],
      pairEnc: Encoder[(Option[O], Option[(T, String)])]
  ): (PCollection[O], PCollection[(T, String)]) = {
    lazy val tagged = ds
      .map { t =>
        Try(f(t)).toEither match {
          case Right(o) => (Some(o), None: Option[(T, String)])
          case Left(e) =>
            (None: Option[O], Some((t, Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    (
      new PCollection(tagged.flatMap(_._1.iterator)),
      new PCollection(tagged.flatMap(_._2.iterator))
    )
  }

  /** Reusable sub-pipeline packaging (reference: CompositeTransform::
    * expand, src/extensions.rs:147) — a plain function application,
    * mirroring Dataset.transform.
    */
  def applyTransform[O](f: PCollection[T] => PCollection[O]): PCollection[O] = f(this)

  /** Dead-letter flatMap (reference: flat_map_catching,
    * src/helpers/dead_letter.rs:191).
    */
  def flatMapCatching[O](f: T => IterableOnce[O])(implicit
      okEnc: Encoder[O],
      dlqEnc: Encoder[(T, String)],
      pairEnc: Encoder[(Seq[O], Option[(T, String)])]
  ): (PCollection[O], PCollection[(T, String)]) = {
    lazy val tagged = ds
      .map { t =>
        Try(f(t).iterator.toSeq).toEither match {
          case Right(os) => (os, None: Option[(T, String)])
          case Left(e) =>
            (Seq.empty[O], Some((t, Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    (
      new PCollection(tagged.flatMap(_._1)),
      new PCollection(tagged.flatMap(_._2.iterator))
    )
  }

  /** Raw per-partition escape hatch (reference: DynOp custom operator,
    * src/node.rs:49-106 / apply_transform) — the universal fallback
    * when no declarative form exists. Prefer column expressions.
    */
  def mapPartitions[O: Encoder](f: Iterator[T] => Iterator[O]): PCollection[O] =
    new PCollection(ds.mapPartitions(f))

  // ---- ordering barrier (reference: wait_on.rs) ----

  /** Beam `Wait.on` (reference: src/helpers/wait_on.rs:165): do not
    * start downstream work until `signal` fully drains. Spark
    * realization: force-evaluate the signal (a cheap count action)
    * inside this collection's lazy thunk — the count runs when the
    * first downstream ACTION forces the plan, not at wiring time, so
    * building the pipeline graph stays side-effect free and the
    * write-then-read-after ordering pattern holds (PCollectionSpec
    * "waitOn defers the signal" pins both properties).
    */
  def waitOn[S](signal: PCollection[S]): PCollection[T] =
    new PCollection({
      signal.ds.count(): Unit
      ds
    })

  // ---- terminals (reference: src/helpers/common.rs:220,251, collect_sorted.rs) ----

  def collect(): Seq[T] = ds.collect().toIndexedSeq

  def collectSeq(): Seq[T] = collect()

  def collectPar(): Seq[T] = collect()

  def collectSorted()(implicit ord: Ordering[T]): Seq[T] = collect().sorted

  def count(): Long = ds.count()
}

object PCollection {

  /** One physical-plan node (reference: ExplainStep, tests/explain.rs). */
  final case class ExplainStep(name: String, isBarrier: Boolean)

  /** One optimized-logical-plan node with Catalyst's cost estimate for
    * it (reference: ExplainStep.cost, planner.rs:280-299):
    * `estimatedRows` when the stats pipeline derives a row count,
    * `estimatedBytes` always.
    */
  final case class CostStep(
      name: String, estimatedRows: Option[BigInt], estimatedBytes: BigInt)

  /** Structured explanation summary (reference: ExecutionExplanation
    * with cost_estimate.{barriers,total_ops}, suggested_partitions,
    * and the optimizations log — planner.rs:304-324).
    */
  final case class Explanation(
      steps: Seq[ExplainStep],
      barriers: Int,
      totalOps: Int,
      suggestedPartitions: Int,
      formatted: String,
      estimates: Seq[CostStep] = Nil,
      rewrites: Seq[String] = Nil,
      nodeNames: Seq[String] = Nil
  )

  /** Hierarchical naming scope (reference: Pipeline::named_scope,
    * src/pipeline.rs:330-351): every [[PCollection.withName]] inside
    * `f` is prefixed with the scope path, scopes nest
    * (`A/B/Name`), and the scope pops even if `f` throws — the same
    * guard-on-unwind contract as the reference's Drop guard. The stack
    * is a DynamicVariable, so concurrent pipeline-building threads each
    * see their own scope path.
    */
  def namedScope[R](name: String)(f: => R): R = {
    val stack = scopeStack.value
    scopeStack.withValue(stack :+ name)(f)
  }

  private[graft] def qualifyWithScope(name: String): String = {
    val stack = scopeStack.value
    if (stack.isEmpty) name else (stack :+ name).mkString("/")
  }

  private val scopeStack = new scala.util.DynamicVariable[Vector[String]](Vector.empty)

  def fromSeq[T: Encoder](spark: SparkSession, data: Seq[T]): PCollection[T] =
    new PCollection(spark.createDataset(data))

  def fromIter[T: Encoder](spark: SparkSession, data: IterableOnce[T]): PCollection[T] =
    fromSeq(spark, data.iterator.toSeq)

  def apply[T](ds: Dataset[T]): PCollection[T] = new PCollection(ds)
}
