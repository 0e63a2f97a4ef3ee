package graft

import org.apache.spark.storage.StorageLevel

/** Multi-output split (reference: src/helpers/partition.rs `partition!`
  * macro: enum-tag each element, fan out N filtered streams). Spark
  * realization: tag once, cache the tagged parent, project N filters —
  * the scan and tag computation run once (InMemoryRelation), each
  * output is a narrow filter. The reference's dominator-based CSE cache
  * (src/planner.rs:1816) is exactly this persist.
  */
object Partitioned {

  implicit final class PartitionOps[T](private val self: PCollection[T]) {

    /** Split into `n` streams by `tag` (0-based; out-of-range tags are
      * dropped, matching the macro's exhaustive-enum contract).
      */
    def partitionBy(n: Int)(tag: T => Int): Seq[PCollection[T]] = {
      val cached = new PCollection(self.ds.persist(StorageLevel.MEMORY_AND_DISK))
      (0 until n).map(i => cached.filter(t => tag(t) == i))
    }

    /** Two-way convenience split: (matching, rest). */
    def partition2(pred: T => Boolean): (PCollection[T], PCollection[T]) = {
      val cached = new PCollection(self.ds.persist(StorageLevel.MEMORY_AND_DISK))
      (cached.filter(pred), cached.filter(t => !pred(t)))
    }
  }
}
