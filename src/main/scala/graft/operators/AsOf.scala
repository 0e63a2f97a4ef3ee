package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: attach to each left row the single right row
  * with the greatest timestamp at or before the left row's timestamp,
  * per key — the "latest prior state" join behind checkpoint lookup,
  * slowly-changing-dimension resolution and feature point-in-time
  * correctness.
  *
  * Plan shape: UNION both sides tagged, ONE shuffle on the key, and a
  * per-key carry-forward window (`last(_, ignoreNulls)` over rows
  * unbounded-preceding..current) ordered by (ts, id, side). No range
  * predicate ever reaches a join operator, so there is no inequality
  * join to explode and no per-row right-side scan — cost is
  * sort-within-partition, the same shape at 100 TB as at test scale.
  *
  * Determinism: ties are broken by (ts, id, side-flag) with the right
  * side ordered first at an exact (ts, id) match, so a right row with
  * equal timestamp matches iff its id <= the left id — a total order
  * both engines can reproduce (the reference's unique-tiebreak stance
  * for every rank/limit surface).
  */
object AsOf {

  /** @param left      rows to annotate
    * @param right     state/marker rows providing the carried value
    * @param keyCol    equality key (both sides)
    * @param tsCol     event-time column (both sides)
    * @param idCol     unique row id (both sides, used as tiebreak)
    * @param valueCols right-side columns to carry onto each left row
    *                  (emitted as `asof_<name>`)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      valueCols: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val tagged =
      left.select(
        leftCols.map(col) :+ lit(1).as("graft_side") :++
          valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(s"graft_v_$c")): _*)
        .unionByName(
          right.select(
            Seq(col(keyCol), col(tsCol), col(idCol)).map(c => c) :+ lit(0).as("graft_side") :++
              valueCols.map(c => col(c).as(s"graft_v_$c")): _*),
          allowMissingColumns = true)
    val carry = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col(idCol), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(tagged) { (df, c) =>
      df.withColumn(s"asof_$c", last(s"graft_v_$c", ignoreNulls = true).over(carry))
    }
    carried
      .where(col("graft_side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c")): _*)
  }
}
