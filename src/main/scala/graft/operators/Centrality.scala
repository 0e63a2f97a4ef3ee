package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over pair relations — the corpus-quality signal a
  * web-scale curation run derives from connectivity (CommonCrawl-style
  * ranking uses link centrality to prioritize crawl and filter spam;
  * over a duplicate-pair graph the same score surfaces boilerplate
  * families: heavily-connected docs are template pages). The reference
  * has no graph tier; this generalizes the delta-iteration machinery
  * already proven in [[Dedup.duplicateClusters]] to weighted scores.
  */
object Centrality {

  /** Fixed-iteration PageRank over an UNDIRECTED pair relation
    * (`aCol`, `bCol`; pairs must be distinct with a != b, the
    * [[Dedup.lshCandidatePairs]] contract). Nodes are the pair
    * endpoints — an isolated doc has no edges and no rank. Every
    * iteration is one Pregel-style step: contributions flow along both
    * edge directions, each node's new rank is
    * `(1 - d)/N + d * sum(in-contribs)`. Undirected means every node
    * has out-degree >= 1, so there is no dangling-mass term.
    *
    * Scale shape: the out-degree is joined ONTO the edge relation once
    * before the loop, and that relation is repartitioned on `src` and
    * PERSISTED — the (expensive: LSH + verify) pair subtree computes
    * once, and every iteration's join streams the cached layout with
    * no re-shuffle of the edge side. The rank side arrives from its
    * groupBy already hash-partitioned on the join key, so each round
    * is one co-partitioned join + one aggregation — the per-round cost
    * of the distributed CC loop, without its convergence test because
    * the iteration count is fixed (bounded lineage; no per-round
    * checkpoint needed). The result is materialized through a reliable
    * checkpoint before the cache is released, so callers get a flat
    * file-backed relation, not a plan pinned to executor memory.
    * In-loop values stay raw doubles (cross-engine replicas agree
    * modulo sub-rounding summation noise); ranks round to 6 places at
    * the output edge only.
    *
    * Output: (id, rank), rank rounded to 6 places.
    */
  def pageRank(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iterations: Int,
      damping: Double = 0.85
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val nPart = pairs.sparkSession.sessionState.conf.numShufflePartitions
    // both directions via ONE explode (the duplicateClusters stance:
    // a union would execute the pair subtree twice at materialization)
    val edges = pairs
      .select(explode(array(
        struct(col(aCol).as("src"), col(bCol).as("dst")),
        struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
      .select("e.src", "e.dst")
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val degEdges = edges.join(deg, "src")
      .repartition(nPart, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // node count and initial ranks derive FROM THE CACHE, not from the
    // raw deg/pairs lineage — otherwise the expensive pair subtree
    // executes again for n and a third time for the init ranks
    val nodes = degEdges.select(col("src"), col("deg")).distinct()
    val n = nodes.agg(count(lit(1)).as("n_nodes"))
    var ranks = nodes.crossJoin(broadcast(n))
      .select(col("src").as("id"), (lit(1.0) / col("n_nodes")).as("r"))
    for (_ <- 1 to iterations) {
      ranks = degEdges
        .join(ranks.select(col("id").as("src"), col("r")), "src")
        .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
        .groupBy("id")
        .agg(sum("c").as("in"))
        .crossJoin(broadcast(n))
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / col("n_nodes") + lit(damping) * col("in")).as("r"))
    }
    val out = Dedup.reliableCheckpoint(
      ranks.select(col("id"), round(col("r"), 6).as("rank")))
    degEdges.unpersist()
    out
  }
}
