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
    // the right side's value columns travel as ONE struct, so the
    // carry-forward picks every asof_* value from the SAME right row —
    // carrying each column independently would mix rows whenever a
    // right row holds NULL in one value column (last(ignoreNulls) would
    // skip it for that column only, diverging from latest-row-or-NULL)
    val valueStruct = struct(valueCols.map(col): _*).as("graft_v")
    val nullStruct = lit(null)
      .cast(org.apache.spark.sql.types.StructType(valueCols.map(right.schema(_))))
      .as("graft_v")
    val tagged =
      left.select(leftCols.map(col) :+ lit(1).as("graft_side") :+ nullStruct: _*)
        .unionByName(
          right.select(
            Seq(col(keyCol), col(tsCol), col(idCol)) :+ lit(0).as("graft_side") :+ valueStruct: _*),
          allowMissingColumns = true)
    val carry = Window
      .partitionBy(keyCol)
      .orderBy(col(tsCol), col(idCol), col("graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("graft_asof", last("graft_v", ignoreNulls = true).over(carry))
      .where(col("graft_side") === 1)
      .select(leftCols.map(col) ++ valueCols.map(c => col("graft_asof")(c).as(s"asof_$c")): _*)
  }
}
