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

  /** The `depth` (j, cell) coordinates of one token — the shared hash
    * family for building and probing grids (also the streaming tier's,
    * [[graft.streaming.Streams.windowedCmsGrid]], so a stream-built
    * grid probes identically).
    */
  private[graft] def cellCoords(tok: org.apache.spark.sql.Column, depth: Int, width: Int) =
    explode(array((0 until depth).map(j =>
      struct(lit(j).as("j"), pmod(hash(tok, lit(j)), lit(width)).as("cell"))): _*))

  /** CMS grid cells for every token occurrence: (j, cell) -> n. */
  private def grid(toks: DataFrame, depth: Int, width: Int): DataFrame =
    toks
      .select(cellCoords(col("tok"), depth, width).as("jc"))
      .groupBy(col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))

  /** CMS point estimates for `queryToks` (a `tok` column) against a
    * sparse grid relation carrying (j, cell, n) plus any partition
    * columns (e.g. the `window_start` of a stream-maintained grid,
    * [[graft.streaming.Streams.windowedCmsGrid]]): per extra-column
    * group and token, the estimate is the min over the token's `depth`
    * cells. The query tokens broadcast (they are the small side); the
    * grid never moves. A sparse grid stores no zero cells, so a token
    * matching fewer than `depth` cells has a zero cell somewhere — its
    * estimate is 0, not the min of the cells that happened to collide;
    * tokens matching no cell at all are simply absent (= estimate 0).
    */
  def estimateFromGrid(grid: DataFrame, queryToks: DataFrame, depth: Int, width: Int): DataFrame = {
    val extraCols = grid.columns.toSeq.filterNot(Set("j", "cell", "n"))
    // distinct query tokens and a max-compacted grid: duplicate query
    // rows or progressive update-mode sink rows (several n values for
    // one (group, j, cell), where the LARGEST is the latest since
    // window counts only grow) would otherwise inflate the matched-cell
    // count past `depth` and defeat the zero-cell guard below
    val g = grid.groupBy((extraCols ++ Seq("j", "cell")).map(col): _*).agg(max("n").as("n"))
    val cells = queryToks
      .select(col("tok"), cellCoords(col("tok"), depth, width).as("jc"))
      .select(col("tok"), col("jc.j").as("j"), col("jc.cell").as("cell"))
      .distinct()
    g
      .join(broadcast(cells), Seq("j", "cell"))
      .groupBy((extraCols :+ "tok").map(col): _*)
      .agg(min("n").as("n_min"), count(lit(1)).as("n_cells"))
      .select((extraCols :+ "tok").map(col) :+
        when(col("n_cells") < depth, lit(0L)).otherwise(col("n_min")).as("n_est"): _*)
  }

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
