package graft

import org.apache.spark.sql.{Encoder, Encoders}

/** Event-time carrier types + typed windowing (reference:
  * src/window.rs `Timestamped`/`Window`, src/helpers/timestamped.rs,
  * tumbling.rs, windowed_combine.rs). Timestamps are millis since
  * epoch like the reference (`TimestampMs = u64`, window.rs:36).
  *
  * The column path (`graft.operators.Windowing`, Spark's `window()`)
  * is preferred at scale; this typed path preserves the reference's
  * `(Window, T)` keyed-by-window API for Dataset pipelines.
  */
object EventTime {

  /** Deterministic "later" pick: greater ts wins; equal ts falls back
    * to the larger rendered value — associative and commutative, so
    * merge order cannot change the winner PROVIDED `T` renders to a
    * value-based string. Case classes, primitives, strings, and
    * collections with value toString qualify; a type whose toString is
    * identity-based (e.g. `Array` renders `TypeName@identityHash`)
    * makes the equal-ts tie-break depend on JVM identity hashes, so
    * the winner would vary run-to-run. Wrap such payloads in a case
    * class (or convert Array to Seq) before attaching timestamps.
    */
  private[graft] def laterOf[T](a: Timestamped[T], b: Timestamped[T]): Timestamped[T] =
    if (a.ts > b.ts) a
    else if (b.ts > a.ts) b
    else if (String.valueOf(a.value) >= String.valueOf(b.value)) a
    else b


  /** reference: src/window.rs:146-151 */
  case class Timestamped[T](value: T, ts: Long)

  /** Closed-open interval [start, end), usable as a grouping key
    * (reference: src/window.rs:42-48).
    */
  case class TimeWindow(start: Long, end: Long)

  object TimeWindow {
    /** The tumbling window containing `ts` (reference: window.rs:85-96). */
    def tumble(ts: Long, sizeMs: Long, offsetMs: Long = 0L): TimeWindow = {
      val shifted = ts - offsetMs
      val k = math.floorDiv(shifted, sizeMs)
      TimeWindow(k * sizeMs + offsetMs, (k + 1) * sizeMs + offsetMs)
    }
  }

  implicit final class TimestampOps[T](private val self: PCollection[T]) {
    /** Attach event timestamps (reference: attach_timestamps,
      * timestamped.rs:84).
      */
    def attachTimestamps(f: T => Long)(implicit e: Encoder[Timestamped[T]]): PCollection[Timestamped[T]] =
      self.map(t => Timestamped(t, f(t)))
  }

  implicit final class TimestampedOps[T](private val self: PCollection[Timestamped[T]]) {

    /** Project out the timestamps (reference: reify_timestamps). */
    def reifyTimestamps(implicit e: Encoder[(T, Long)]): PCollection[(T, Long)] =
      self.map(t => (t.value, t.ts))

    /** Drop the timestamps. */
    def values(implicit e: Encoder[T]): PCollection[T] = self.map(_.value)

    /** Key each element by its tumbling window (reference:
      * key_by_window, tumbling.rs:83).
      */
    def keyByWindow(sizeMs: Long, offsetMs: Long = 0L)(implicit
        e: Encoder[(TimeWindow, T)]
    ): PCollection[(TimeWindow, T)] =
      self.map(t => (TimeWindow.tumble(t.ts, sizeMs, offsetMs), t.value))

    /** Window-keyed group (reference: group_by_window, tumbling.rs:115). */
    def groupByWindow(sizeMs: Long, offsetMs: Long = 0L)(implicit
        ke: Encoder[TimeWindow],
        pe: Encoder[(TimeWindow, T)],
        ge: Encoder[(TimeWindow, Seq[T])]
    ): PCollection[(TimeWindow, Seq[T])] = {
      import KeyedPCollection._
      keyByWindow(sizeMs, offsetMs).groupByKey
    }

    /** Latest value by timestamp (reference: latest_globally,
      * src/helpers/latest.rs:50). Ties break on the rendered value —
      * an associative, commutative pick, so the result is identical
      * under any partitioning or merge order. Lazy (the fold runs at
      * the first downstream action, like every other operator) and
      * empty-safe (an empty input yields an empty collection, not an
      * UnsupportedOperationException from Dataset.reduce).
      */
    def latestGlobally(implicit e: Encoder[Timestamped[T]]): PCollection[Timestamped[T]] =
      new PCollection({
        val latest = self.ds.rdd
          .map(Option(_))
          .fold(None) {
            case (Some(a), Some(b)) => Some(EventTime.laterOf(a, b))
            case (a, None)          => a
            case (None, b)          => b
          }
        self.spark.createDataset(latest.toSeq)
      })
  }

  /** Per-key latest (reference: latest_per_key, latest.rs:100). */
  implicit final class KeyedTimestampedOps[K, T](private val self: PCollection[(K, Timestamped[T])]) {
    def latestPerKey(implicit
        ke: Encoder[K],
        pe: Encoder[(K, Timestamped[T])]
    ): PCollection[(K, Timestamped[T])] =
      new PCollection(
        self.ds.groupByKey(_._1)
          // ties break on the rendered value, not arrival order: a
          // plain ts comparison is not associative for equal
          // timestamps, so the winner would vary with partitioning
          .reduceGroups((a: (K, Timestamped[T]), b: (K, Timestamped[T])) =>
            if (EventTime.laterOf(a._2, b._2) eq a._2) a else b)
          .map(_._2)
      )
  }
}
