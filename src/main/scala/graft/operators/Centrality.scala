package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * checkpoint needed). The node count is collected ONCE as a driver
    * scalar from the already-cached edge relation (the same bounded-
    * action stance as [[Dsir]]'s fit collects — the action also
    * materializes the cache), and `(1 - d)/n` folds into every round's
    * projection as a LITERAL: carrying it as an in-plan one-row
    * relation would cost a BroadcastNestedLoopJoin per round whose
    * only payload is one scalar. The result is materialized through a
    * checkpoint before the cache is released, so callers get a flat
    * relation, not a plan pinned to the released cache: local
    * (executor-block) by default — the right cost for an
    * iterations-bounded plan whose lineage is already truncated at the
    * cache — or reliable (checkpoint-dir files, the
    * [[Dedup.duplicateClusters]] stance) when the caller needs the
    * output to survive executor loss. In-loop values stay raw doubles
    * (cross-engine replicas agree modulo sub-rounding summation
    * noise); ranks round to 6 places at the output edge only.
    *
    * Output: (id, rank), rank rounded to 6 places.
    */
  def pageRank(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      iterations: Int,
      damping: Double = 0.85,
      reliableOutput: Boolean = false
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val (degEdges, loopPart, release) = degreeJoinedEdgesSized(pairs, aCol, bCol)
    // every action below — the node count, the loop, the output
    // checkpoint — runs with the shuffle width scoped to the edge
    // cache's data-derived layout, so each round's aggregation exchange
    // lands co-partitioned with the cache instead of on the session
    // width (see [[AdaptiveLoop]])
    try AdaptiveLoop.scoped(pairs.sparkSession, loopPart) {
      // nodes and the node count derive FROM THE CACHE, not from the raw
      // deg/pairs lineage — otherwise the expensive pair subtree executes
      // again for n and a third time for the init ranks; this count is
      // also the edge cache's materialization barrier, after which the
      // pair staging cache is released
      val nodes = degEdges.select(col("src")).distinct()
      val nNodes = nodes.count()
      release()
      // the SAME IEEE ops the in-plan form evaluated: double(1-d) divided
      // by double(n), once — rounds identically as a driver literal
      val teleport = (1.0 - damping) / nNodes.toDouble
      val init = nodes.select(col("src").as("id"), lit(1.0 / nNodes.toDouble).as("r"))
      val ranked = loopRanks(degEdges, init, teleport, damping, iterations)
      if (reliableOutput) Dedup.reliableCheckpoint(ranked)
      else ranked.localCheckpoint(true)
    } finally { degEdges.unpersist(); release() }
  }

  /** The shared edge preparation of both rank loops, CACHED: both
    * directions via ONE explode (the [[Dedup.duplicateClusters]]
    * stance — a union would execute the expensive pair subtree twice
    * at materialization), out-degree joined on once, repartitioned on
    * `src` and persisted so every iteration's join streams the cached
    * layout with no re-shuffle of the edge side. Callers own the
    * unpersist. With `weightCol` the edges carry the weight and the
    * degree is the WEIGHTED degree (`wdeg` = total incident weight);
    * without, plain out-degree counts. Output: (src, dst, deg) or
    * (src, dst, w, wdeg).
    */
  private[graft] def degreeJoinedEdges(
      pairs: DataFrame, aCol: String, bCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val (out, _, release) = degreeJoinedEdgesSized(pairs, aCol, bCol, weightCol)
    out.count(): Unit // materialize before releasing the pair staging cache
    release()
    out
  }

  /** [[degreeJoinedEdges]] plus the DATA-DERIVED loop width its layout
    * was pinned to (see [[AdaptiveLoop]]): the PAIR relation — the
    * expensive (LSH + verify) subtree, and the smallest relation in
    * the whole construction — is materialized into a short-lived
    * staging cache whose exact bytes size the loop width, then the
    * degree-joined edge relation builds FROM that cache (explode +
    * degree aggregate + join read cached pairs, never re-run the pair
    * subtree) into its `src`-pinned layout, and the pair cache is
    * released. The staging cache is cheaper than staging the edge
    * relation itself (half the rows, no degree column), and the edge
    * relation is still written to cache exactly once — same cache
    * traffic as an unsized build, one extra bounded count. The
    * returned `release` thunk drops the pair cache: callers invoke it
    * after their FIRST full action over the edge relation (which
    * materializes it from the pair cache) — deferring the release
    * saves the builder its own materialization pass.
    */
  private[graft] def degreeJoinedEdgesSized(
      pairs: DataFrame, aCol: String, bCol: String,
      weightCol: Option[String] = None): (DataFrame, Int, () => Unit) = {
    val pairsC = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairRows = pairsC.count()
    // the edge relation is both directions of every pair plus an 8-byte
    // degree: 2x the pair bytes + 16/row bounds it from above without
    // materializing it first
    val loopPart = AdaptiveLoop.partitionsForBytes(
      pairs.sparkSession,
      AdaptiveLoop.cachedBytes(pairsC) * 2 + BigInt(16L * pairRows),
      2L * pairRows)
    val edges = weightCol match {
      case None =>
        pairsC.select(explode(array(
            struct(col(aCol).as("src"), col(bCol).as("dst")),
            struct(col(bCol).as("src"), col(aCol).as("dst")))).as("e"))
          .select("e.src", "e.dst")
      case Some(w) =>
        pairsC.select(explode(array(
            struct(col(aCol).as("src"), col(bCol).as("dst"), col(w).as("w")),
            struct(col(bCol).as("src"), col(aCol).as("dst"), col(w).as("w")))).as("e"))
          .select("e.src", "e.dst", "e.w")
    }
    val deg = weightCol match {
      case None    => edges.groupBy("src").agg(count(lit(1)).as("deg"))
      case Some(_) => edges.groupBy("src").agg(sum("w").as("wdeg"))
    }
    val out = edges.join(deg, "src")
      .repartition(loopPart, col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (out, loopPart, () => { pairsC.unpersist(); () })
  }

  /** The fixed-iteration rank recursion as ONE lazy plan, shared by
    * [[pageRank]], [[pageRankWeighted]] (which passes the
    * weight-proportional contribution expression), and the plan-shape
    * spec (the production output is checkpointed, which truncates the
    * plan the spec needs to pin): per round, one co-partitioned join
    * against the prepared degree-joined edge relation, one
    * aggregation, and a PURELY LITERAL teleport projection — no
    * in-plan scalar relation, so no per-round
    * BroadcastNestedLoopJoin. Output: (id, rank round-6).
    */
  private[graft] def loopRanks(
      degEdges: DataFrame,
      init: DataFrame,
      teleport: Double,
      damping: Double,
      iterations: Int,
      contrib: Column = col("r") / col("deg")): DataFrame = {
    var ranks = init
    for (_ <- 1 to iterations) {
      // the rank side is hinted shuffle_hash: the planner's size
      // estimates would otherwise BROADCAST it — a driver round-trip
      // build JOB every round (the same per-round overhead the CC
      // loop's A/B measured 2.7x slower) — where the co-partitioned
      // hash join streams the cached edge layout with no exchange at
      // all: the rank relation arrives from its groupBy already
      // hash-partitioned on the join key at the loop width
      ranks = degEdges
        .join(ranks.select(col("id").as("src"), col("r")).hint("shuffle_hash"), "src")
        .select(col("dst").as("id"), contrib.as("c"))
        .groupBy("id")
        .agg(sum("c").as("in"))
        .select(col("id"), (lit(teleport) + lit(damping) * col("in")).as("r"))
    }
    ranks.select(col("id"), round(col("r"), 6).as("rank"))
  }

  /** Weighted PageRank over an undirected pair relation carrying an
    * edge weight (e.g. the verified Jaccard similarity of a duplicate
    * pair): contributions split proportionally to weight instead of
    * uniformly — r(v) = (1-d)/N + d * Σ_u r(u) · w(u,v)/W(u), with
    * W(u) the node's total incident weight. Over a near-dup graph this
    * concentrates rank inside TIGHT duplicate families (high-jaccard
    * cliques) instead of rewarding raw degree — the signal that
    * separates "one template, many near-copies" from "loosely similar
    * neighborhood".
    *
    * Scale shape is [[pageRank]]'s exactly: weighted-degree joined
    * onto the edge relation once, cached src-partitioned, one
    * co-partitioned join + one aggregation per round, node count a
    * driver scalar folded in as a literal. Weights must be positive;
    * every node has W > 0 because pairs are undirected. In-loop
    * values stay raw doubles; ranks round to 6 places at the edge.
    * Output: (id, rank round-6).
    */
  def pageRankWeighted(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      weightCol: String,
      iterations: Int,
      damping: Double = 0.85,
      reliableOutput: Boolean = false
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val (degEdges, loopPart, release) = degreeJoinedEdgesSized(pairs, aCol, bCol, Some(weightCol))
    try AdaptiveLoop.scoped(pairs.sparkSession, loopPart) {
      val nodes = degEdges.select(col("src")).distinct()
      val nNodes = nodes.count()
      release()
      val teleport = (1.0 - damping) / nNodes.toDouble
      val init = nodes.select(col("src").as("id"), lit(1.0 / nNodes.toDouble).as("r"))
      val ranked = loopRanks(degEdges, init, teleport, damping, iterations,
        contrib = col("r") * col("w") / col("wdeg"))
      if (reliableOutput) Dedup.reliableCheckpoint(ranked)
      else ranked.localCheckpoint(true)
    } finally { degEdges.unpersist(); release() }
  }

  /** Personalized PageRank: random-walk-with-restart proximity to a
    * SEED SET — "which documents does the graph consider close to this
    * curated nucleus", the graph-side sibling of the DSIR seed-and-
    * expand loop (seeds = a vetted sample; high-PPR non-seeds = the
    * docs most entangled with it through duplicate/link structure).
    * The recursion is r(v) = (1-d)/|S|*1_S(v) + d * sum(in-contribs):
    * teleport mass lands ONLY on seeds, and the initial distribution is
    * uniform on the seeds, so after i iterations exactly the nodes
    * within i hops of a seed (plus the seeds) carry rank. Seeds need
    * not be graph nodes — an isolated seed keeps its teleport share and
    * contributes nothing.
    *
    * Scale shape: the edge loop is [[pageRank]]'s (cached
    * degree-joined relation, one co-partitioned join per round). |S|
    * is a bounded driver count on the (persisted) seed relation,
    * folded in as literals. The per-round teleport is FUSED into the
    * contribution aggregation: the damping factor multiplies each
    * per-edge contribution in the projection, the seed relation's
    * constant-teleport rows union in BEFORE the aggregate, and ONE
    * `groupBy(id).agg(sum)` folds both — the same per-round shuffle
    * count as the unweighted loop (a separate post-agg teleport union
    * would pay a second shuffle aggregation per round). The sum stays
    * commutative, so merge order cannot change the result beyond
    * sub-round-6 summation noise. Output: (id, rank round-6) for every
    * node with nonzero rank after `iterations` rounds.
    */
  def pageRankPersonalized(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      seeds: DataFrame,
      seedCol: String,
      iterations: Int,
      damping: Double = 0.85,
      reliableOutput: Boolean = false
  ): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val (degEdges, loopPart, release) = degreeJoinedEdgesSized(pairs, aCol, bCol)
    // the seed relation is touched every round (teleport) — persist it
    // so an expensive upstream (a quality gate, a sample) runs once;
    // the count doubles as its materialization barrier and |S|
    val seedIds = seeds.select(col(seedCol).as("id"))
      .where(col("id").isNotNull).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try AdaptiveLoop.scoped(pairs.sparkSession, loopPart) {
      val nSeeds = seedIds.count()
      require(nSeeds > 0, "pageRankPersonalized: empty seed set")
      // no explicit edge-cache materialization here: the loop's output
      // checkpoint materializes it from the pair staging cache, which
      // stays alive until the finally releases it
      val ranked = personalizedRanks(degEdges, seedIds, nSeeds, damping, iterations)
      if (reliableOutput) Dedup.reliableCheckpoint(ranked)
      else ranked.localCheckpoint(true)
    } finally {
      degEdges.unpersist()
      seedIds.unpersist()
      release()
    }
  }

  /** The personalized rank recursion as ONE lazy plan ([[loopRanks]]'s
    * stance — the production output is checkpointed, so the plan-shape
    * spec pins this form): per round, one co-partitioned join against
    * the prepared degree-joined edge relation and exactly ONE shuffle
    * aggregation — damping folds into the per-edge projection and the
    * constant seed-teleport rows ride the same `groupBy(id).sum`, with
    * map-side partial aggregation on both union branches.
    * Output: (id, rank round-6).
    */
  private[graft] def personalizedRanks(
      degEdges: DataFrame,
      seedIds: DataFrame,
      nSeeds: Long,
      damping: Double,
      iterations: Int): DataFrame = {
    val teleport = (1.0 - damping) / nSeeds.toDouble
    val teleportRows = seedIds.select(col("id"), lit(teleport).as("r"))
    var ranks = seedIds.select(col("id"), lit(1.0 / nSeeds.toDouble).as("r"))
    for (_ <- 1 to iterations) {
      // shuffle_hash on the rank side for the same reason as
      // [[loopRanks]]: no per-round broadcast build job
      ranks = degEdges
        .join(ranks.select(col("id").as("src"), col("r")).hint("shuffle_hash"), "src")
        .select(col("dst").as("id"),
          (lit(damping) * col("r") / col("deg")).as("r"))
        .unionByName(teleportRows)
        .groupBy("id")
        .agg(sum("r").as("r"))
    }
    ranks.select(col("id"), round(col("r"), 6).as("rank"))
  }
}
