package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Count-Min heavy hitters, re-expressed Spark-first: the CMS grid is a
  * SPARSE RELATION (depth, cell) -> count built by one hash aggregate
  * over exploded (token, depth-row) pairs, not a driver-side array —
  * so it partial-aggregates map-side, merges for free (union + re-agg),
  * and never concentrates state anywhere. Estimates are a join: each
  * query token looks up its `depth` cells and takes the min count.
  *
  * Guarantees (classic CMS): estimate >= true count always (colliding
  * tokens only add); estimate <= true + N*e/width with the usual
  * probability over hash rows — with width sized to the corpus the
  * overestimate stays under the verification margin, which is what
  * [[heavyHittersVerified]] asserts per hitter.
  */
object HeavyHitters {

  /** CMS grid cells for every token occurrence: (j, cell) -> n. */
  private def grid(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks
      .select(explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), pmod(hash(col("tok"), lit(j)), lit(width)).as("cell"))): _*)).as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))

  /** Top-k exact heavy hitters with their CMS estimate and a 0/1
    * within-bound flag: `ok` = estimate is at least the exact count
    * (CMS never underestimates) and overshoots by at most
    * `marginTokens`. The exact side is a plain top-k aggregate
    * (deterministic (count desc, token) order); the sketch side is the
    * sparse grid above; the two meet in a `depth`-row broadcast join
    * per hitter.
    */
  def heavyHittersVerified(
      docs: DataFrame,
      textCol: String,
      k: Int,
      depth: Int = 4,
      width: Int = 2048,
      marginTokens: Long = 64
  ): DataFrame = {
    val toks = docs.select(explode(split(col(textCol), " ")).as("tok"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col("tok"))
      .limit(k)
    val cells = exact.select(
      col("tok"), col("n_exact"),
      explode(array((0 until depth).map(j =>
        struct(lit(j).as("j"), pmod(hash(col("tok"), lit(j)), lit(width)).as("cell"))): _*)).as("jc"))
      .select(col("tok"), col("n_exact"), col("jc.j").as("j"), col("jc.cell").as("cell"))
    broadcast(cells)
      .join(grid(toks, depth, width), Seq("j", "cell"))
      .groupBy("tok", "n_exact")
      .agg(min("n").as("n_est"))
      .select(
        col("tok"), col("n_exact"),
        (col("n_est") >= col("n_exact") &&
          col("n_est") <= col("n_exact") + marginTokens).cast("bigint").as("ok"))
  }
}
