package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-way co-group on the DataFrame path (reference: cogroup_by_key!
  * macro, 2..10 inputs, src/helpers/co_gbk.rs). Uses the reference's
  * own strategy — tag each input, union, ONE groupBy — so N inputs
  * cost a single shuffle regardless of N, instead of N-1 chained
  * joins. Each input contributes a sorted value-list column in the
  * value's NATIVE type (numeric lists sort numerically, strings
  * lexically); keys absent from an input get an empty list
  * (full-outer semantics).
  */
object CoGroup {

  /** Co-group N inputs into one row per key with a sorted native-typed
    * value array per input.
    *
    * Instead of one shared value column (which would force a common
    * cast — the pre-round-6 version degraded every value to string and
    * every key to long), the union carries one value column PER INPUT,
    * null except on the rows of its own input; `collect_list` skips
    * nulls, so each output array holds exactly its input's values with
    * the original type. N extra null columns cost nothing material in
    * the shuffle (nulls are a bitmask bit in the unsafe row format).
    * Key columns must be union-compatible across inputs (same family
    * of types); Spark's unionByName fails loudly otherwise rather than
    * silently coercing.
    *
    * @param inputs (df, keyCol, valueCol, outputName) per source
    */
  def coGroupN(inputs: Seq[(DataFrame, String, String, String)]): DataFrame = {
    require(inputs.size >= 2, "coGroupN needs at least 2 inputs")
    val outNames = inputs.map(_._4)
    require(outNames.distinct.size == outNames.size, "output names must be distinct")
    val tagged = inputs.zipWithIndex.map { case ((df, keyCol, valCol, _), i) =>
      df.select(
        col(keyCol).as("key") +:
          inputs.zipWithIndex.map { case ((odf, _, oValCol, _), j) =>
            val c =
              if (j == i) col(valCol)
              else lit(null).cast(odf.schema(oValCol).dataType)
            c.as(s"graft_v_$j")
          }: _*)
    }
    val union = tagged.reduce(_ unionByName _)
    val aggs = inputs.zipWithIndex.map { case ((_, _, _, outName), j) =>
      sort_array(collect_list(col(s"graft_v_$j"))).as(outName)
    }
    union.groupBy("key").agg(aggs.head, aggs.tail: _*)
  }
}
