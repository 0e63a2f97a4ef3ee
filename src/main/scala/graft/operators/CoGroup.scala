package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-way co-group on the DataFrame path (reference: cogroup_by_key!
  * macro, 2..10 inputs, src/helpers/co_gbk.rs). Uses the reference's
  * own strategy — tag each input, union, ONE groupBy — so N inputs
  * cost a single shuffle regardless of N, instead of N-1 chained
  * joins. Each input contributes a sorted value-list column; keys
  * absent from an input get an empty list (full-outer semantics).
  */
object CoGroup {

  /** @param inputs (keyCol, valueCol, outputName) per source DataFrame */
  def coGroupN(inputs: Seq[(DataFrame, String, String, String)]): DataFrame = {
    require(inputs.size >= 2, "coGroupN needs at least 2 inputs")
    val tagged = inputs.zipWithIndex.map { case ((df, keyCol, valCol, _), i) =>
      df.select(
        col(keyCol).cast("long").as("key"),
        lit(i).as("tag"),
        col(valCol).cast("string").as("value")
      )
    }
    val union = tagged.reduce(_ unionAll _)
    val aggs = inputs.zipWithIndex.map { case ((_, _, _, outName), i) =>
      concat_ws(",",
        sort_array(collect_list(when(col("tag") === i, col("value"))))
      ).as(outName)
    }
    union.groupBy("key").agg(aggs.head, aggs.tail: _*)
  }
}
