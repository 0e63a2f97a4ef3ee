package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join: match each point row to
  * every interval row whose [start, end) contains it — WITHOUT an
  * inequality join. Intervals are exploded onto a fixed time grid
  * (one row per covered bucket), points map to their single bucket, and
  * the match becomes an EQUALITY join on the bucket id plus an exact
  * residual filter. Equality joins hash-partition and scale; an
  * inequality join degenerates to a nested-loop/cartesian plan that
  * dies at 100 TB. Cost: interval rows are duplicated by
  * ceil(length/bucket) — pick `bucketDays` near the typical interval
  * length so the blow-up stays ~2x.
  */
object RangeJoin {

  /** @param points     rows carrying a timestamp `ptCol`
    * @param intervals  rows carrying [`startCol`, `endCol`) timestamps
    *                   (end exclusive; empty/negative intervals match
    *                   nothing)
    * @param bucketDays grid width in days
    *
    * Output: matched (point columns ++ interval columns) rows — exactly
    * one per (point, containing interval); column names must not
    * collide (select/rename before joining).
    */
  def pointInInterval(
      points: DataFrame,
      ptCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      bucketDays: Int = 7
  ): DataFrame = {
    require(bucketDays > 0, "bucketDays must be positive")
    val width = lit(86400L * bucketDays)
    val pt = points.withColumn("graft_bucket", floor(unix_timestamp(col(ptCol)) / width))
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("graft_bucket", explode(sequence(
        floor(unix_timestamp(col(startCol)) / width),
        // end is exclusive: the last covered second is end - 1
        floor((unix_timestamp(col(endCol)) - 1) / width))))
    pt.join(iv, Seq("graft_bucket"))
      .where(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("graft_bucket")
  }
}
