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
      * dropped, matching the macro's exhaustive-enum contract). The
      * TAGGED relation is what gets cached, so `tag` runs once per
      * element — caching the untagged parent would re-run it once per
      * output stream, and a non-pure tag could then route an element
      * into zero or two partitions.
      */
    def partitionBy(n: Int)(tag: T => Int): Seq[PCollection[T]] = {
      lazy val tagged = {
        implicit val te: org.apache.spark.sql.Encoder[(Int, T)] =
          org.apache.spark.sql.Encoders.tuple(org.apache.spark.sql.Encoders.scalaInt, self.ds.encoder)
        self.ds.map(t => (tag(t), t)).persist(StorageLevel.MEMORY_AND_DISK)
      }
      (0 until n).map { i =>
        new PCollection({
          implicit val e: org.apache.spark.sql.Encoder[T] = self.ds.encoder
          tagged.filter(_._1 == i).map(_._2)
        })
      }
    }

    /** Two-way convenience split: (matching, rest) — the evaluated
      * predicate is cached, same contract as [[partitionBy]].
      */
    def partition2(pred: T => Boolean): (PCollection[T], PCollection[T]) = {
      val split = partitionBy(2)(t => if (pred(t)) 0 else 1)
      (split(0), split(1))
    }
  }
}
