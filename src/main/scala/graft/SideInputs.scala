package graft

import org.apache.spark.sql.Encoder
import scala.reflect.ClassTag

/** Side inputs (reference: src/collection.rs:408-429 SideInput/SideMap/
  * SideSingleton/SideMultimap + src/helpers/side_inputs.rs): broadcast
  * read-only data into element functions. Spark realization: an
  * explicit `sparkContext.broadcast` captured in the closure — one copy
  * per executor, the map-side-join pattern that avoids shuffling the
  * big side at any scale. For relational pipelines prefer
  * `broadcast(df)` joins (Catalyst plans BroadcastHashJoin).
  */
object SideInputs {

  implicit final class SideOps[T](private val self: PCollection[T]) {

    // Every method defers its broadcast (and the upstream Dataset
    // force it entails) into the result's lazy thunk: an eager
    // self.spark here would evaluate the upstream ds at WIRING time,
    // firing waitOn signals and checkpointWith saves that are
    // documented to wait for the first downstream action.

    /** map with a broadcast Seq (reference: map_with_side). */
    def mapWithSide[S, O: Encoder](side: Seq[S])(f: (T, Seq[S]) => O): PCollection[O] =
      new PCollection({
        val bc = self.spark.sparkContext.broadcast(side)
        self.ds.map(t => f(t, bc.value))
      })

    /** map with a broadcast Map (reference: map_with_side_map). */
    def mapWithSideMap[K, V, O: Encoder](side: Map[K, V])(f: (T, Map[K, V]) => O): PCollection[O] =
      new PCollection({
        val bc = self.spark.sparkContext.broadcast(side)
        self.ds.map(t => f(t, bc.value))
      })

    /** map with a broadcast scalar (reference: map_with_side_singleton). */
    def mapWithSideSingleton[S: ClassTag, O: Encoder](side: S)(f: (T, S) => O): PCollection[O] =
      new PCollection({
        val bc = self.spark.sparkContext.broadcast(side)
        self.ds.map(t => f(t, bc.value))
      })

    /** map with a broadcast multimap (reference: map_with_side_multimap). */
    def mapWithSideMultimap[K, V, O: Encoder](side: Map[K, Seq[V]])(f: (T, Map[K, Seq[V]]) => O): PCollection[O] =
      new PCollection({
        val bc = self.spark.sparkContext.broadcast(side)
        self.ds.map(t => f(t, bc.value))
      })

    /** filter with a broadcast Seq (reference: filter_with_side). */
    def filterWithSide[S](side: Seq[S])(pred: (T, Seq[S]) => Boolean): PCollection[T] =
      new PCollection({
        val bc = self.spark.sparkContext.broadcast(side)
        self.ds.filter(t => pred(t, bc.value))
      })

    /** filter with a broadcast Map (reference: filter_with_side_map). */
    def filterWithSideMap[K, V](side: Map[K, V])(pred: (T, Map[K, V]) => Boolean): PCollection[T] =
      new PCollection({
        val bc = self.spark.sparkContext.broadcast(side)
        self.ds.filter(t => pred(t, bc.value))
      })
  }
}
