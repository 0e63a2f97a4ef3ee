package graft

import org.apache.spark.sql.{Encoder, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing combine function, mirroring the reference's `CombineFn`
  * contract (reference: src/collection.rs:333-360 — create / add_input /
  * merge / finish + an associative-commutative hint).
  *
  * Spark-first realization: this is method-for-method Spark's
  * `org.apache.spark.sql.expressions.Aggregator[IN, BUF, OUT]`
  * (zero/reduce/merge/finish), so the bridge below is a thin adapter.
  * Partial (map-side) aggregation, tree reduction and distributed
  * merge all come from Catalyst's HashAggregate(partial) -> Exchange ->
  * HashAggregate(final) pipeline — nothing to hand-roll.
  */
trait CombineFn[V, A, O] extends Serializable {
  def create(): A
  def addInput(acc: A, v: V): A
  def mergeAccumulators(a: A, b: A): A
  def extractOutput(acc: A): O

  /** Hint preserved from the reference; Spark always assumes merge is
    * associative+commutative (required by the Aggregator contract), so
    * this is documentation-only here.
    */
  def isAssociativeCommutative: Boolean = true
}

object CombineFn {

  /** Bridge a CombineFn to a Spark typed Aggregator. */
  def toAggregator[V, A, O](fn: CombineFn[V, A, O])(implicit
      bufEnc: Encoder[A],
      outEnc: Encoder[O]
  ): Aggregator[V, A, O] =
    new Aggregator[V, A, O] {
      override def zero: A = fn.create()
      override def reduce(b: A, a: V): A = fn.addInput(b, a)
      override def merge(b1: A, b2: A): A = fn.mergeAccumulators(b1, b2)
      override def finish(reduction: A): O = fn.extractOutput(reduction)
      override def bufferEncoder: Encoder[A] = bufEnc
      override def outputEncoder: Encoder[O] = outEnc
    }

  /** Column form usable in `ds.select(...)` / `groupByKey(...).agg(...)`. */
  def toColumn[V, A, O](fn: CombineFn[V, A, O])(implicit
      bufEnc: Encoder[A],
      outEnc: Encoder[O]
  ): TypedColumn[V, O] = toAggregator(fn).toColumn
}
