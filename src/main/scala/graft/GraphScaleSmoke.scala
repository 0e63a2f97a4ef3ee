package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Centrality, Dedup}

/** Scaling smoke for the graph tier — the rank-loop sibling of
  * [[RetrievalScaleSmoke]]: replicate the REAL duplicate-pair graph
  * (the LSH generator over documents) N times with disjoint id ranges
  * and run the fixed-iteration loops at 1x and Nx. The replicas are
  * isolated components, which makes the mathematics exactly
  * predictable and turns scale-up into LAW checks rather than loose
  * timing thresholds (wall-clock is printed for the record):
  *
  *  - node conservation: one rank row per distinct endpoint, at every
  *    scale.
  *  - mass conservation: ranks sum to 1 within the round-6 output
  *    rounding budget (PageRank on an undirected graph has no dangling
  *    mass to leak).
  *  - replication invariance: every copy of the component aggregates
  *    the same multiset of doubles, so per-copy ranks must agree
  *    within ONE round-6 step (shuffle arrival order is the only
  *    degree of freedom), and each equals the 1x rank scaled by 1/N
  *    (uniform init and teleport are linear in 1/N) within rounding.
  *  - personalization isolation: PPR seeded ONLY in copy 0 must put
  *    rank on copy-0 nodes and the seeds alone — random walk with
  *    restart cannot cross a component boundary, at any scale.
  *  - personalization invariance: the copy-0 PPR VALUES are identical
  *    at 1x and Nx within one round-6 step — teleport mass depends
  *    only on |S| and the walk never sees the other copies, so the Nx
  *    run aggregates the same multiset of doubles per node as the 1x
  *    run (this pins the fused single-aggregation teleport: a scale-
  *    dependent term sneaking into the per-round sum would break it).
  *
  * Usage: runMain graft.GraphScaleSmoke [sfDir] [replicas]
  */
object GraphScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(50)
    val iterations = 5
    val spark = Sessions.get()

    // the real pair generator, frozen to parquet once so every scale
    // reads the same relation instead of re-running LSH per run
    val basePath = "/tmp/graft_graph_scale_base"
    Dedup.lshCandidatePairs(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        numHashes = 8, rowsPerBand = 2)
      .select("a_id", "b_id")
      .write.mode("overwrite").parquet(basePath)
    val base = spark.read.parquet(basePath)
    val maxIdRow = base.agg(greatest(max("a_id"), max("b_id"))).head()
    if (maxIdRow.isNullAt(0)) {
      System.err.println(s"[graph-scale] FAIL no LSH candidate pairs in $sfDir — nothing to scale")
      spark.stop(); sys.exit(4)
    }
    val stride = maxIdRow.getLong(0) + 1L

    def pairsOf(n: Int): DataFrame = {
      val path = s"/tmp/graft_graph_scale_${n}x"
      (0 until n).map { r =>
        base.select((col("a_id") + lit(r.toLong * stride)).as("a_id"),
          (col("b_id") + lit(r.toLong * stride)).as("b_id"))
      }.reduce(_ unionByName _).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var baseRanks: Map[Long, Double] = Map.empty
    var basePpr: Map[Long, Double] = Map.empty

    for (n <- Seq(1, replicas)) {
      val pairs = pairsOf(n)
      val nEdges = pairs.count()
      val expectedNodes = pairs.select(col("a_id").as("id"))
        .unionByName(pairs.select(col("b_id").as("id"))).distinct().count()

      val (ranks, sec) = time {
        Centrality.pageRank(pairs, "a_id", "b_id", iterations)
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }

      if (ranks.size != expectedNodes)
        failures += s"x$n: ${ranks.size} rank rows != $expectedNodes endpoints"
      val mass = ranks.values.sum
      if (math.abs(mass - 1.0) > expectedNodes * 5e-7 + 1e-9)
        failures += s"x$n: rank mass $mass leaked past the rounding budget"

      if (n == 1) baseRanks = ranks
      else {
        // the node-set law FIRST — the per-node laws below assume it
        val byBaseId = ranks.groupBy { case (id, _) => id % stride }
        if (byBaseId.keySet != baseRanks.keySet)
          failures += s"x$n: replicated node set diverged from the 1x node set " +
            s"(${(byBaseId.keySet -- baseRanks.keySet).take(3)} extra, " +
            s"${(baseRanks.keySet -- byBaseId.keySet).take(3)} missing)"
        else byBaseId.foreach { case (bid, copies) =>
          // per-copy equality within 1 ULP of the round-6 grid (each
          // copy aggregates the same multiset of doubles, but shuffle
          // arrival order is not contractually identical between
          // copies — a boundary-straddling sum may round apart by one
          // step) and the 1/N linearity law vs the 1x run
          val vs = copies.values
          if (vs.max - vs.min > 1.1e-6)
            failures += s"x$n: copies of node $bid disagree: ${copies.toSeq.sortBy(_._1).take(4)}"
          val want = baseRanks(bid) / n
          if (math.abs(vs.head - want) > 2e-6)
            failures += f"x$n: node $bid rank ${vs.head}%.7f != base/${n} = $want%.7f"
        }
      }

      println(f"[graph-scale] x$n%-4d ($nEdges%9d directed-pair rows, $expectedNodes%8d nodes): pageRank($iterations iters) $sec%6.2f s")

      // PPR seeded only in copy 0, run at EVERY scale: the 1x run
      // records the reference values, the Nx run must reproduce them.
      // The seed pick is pinned by an orderBy — limit-after-distinct
      // alone is execution-order-nondeterministic, and the invariance
      // law needs the SAME 32 seeds in both runs
      val seeds = base.select(col("a_id").as("doc_id")).distinct()
        .orderBy(col("doc_id")).limit(32)
      val (ppr, pprSec) = time {
        Centrality.pageRankPersonalized(pairs, "a_id", "b_id", seeds, "doc_id",
          iterations = 3).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      }
      if (ppr.isEmpty)
        failures += s"x$n: PPR returned NO ranked nodes — seeds lost their teleport mass"
      if (n == 1) basePpr = ppr
      else {
        // isolation: restart proximity cannot cross a component
        // boundary, so every ranked node lives in copy 0
        val leaked = ppr.keys.filter(_ >= stride)
        if (leaked.nonEmpty)
          failures += s"x$n: PPR leaked rank outside the seeded component: ${leaked.take(5).toSeq}"
        // invariance: same node set, same values (one round-6 step of
        // shuffle-order freedom) as the 1x run — the other N-1 copies
        // must be invisible to the seeded walk
        if (ppr.keySet != basePpr.keySet)
          failures += s"x$n: PPR node set diverged from 1x " +
            s"(${(ppr.keySet -- basePpr.keySet).take(3)} extra, " +
            s"${(basePpr.keySet -- ppr.keySet).take(3)} missing)"
        else basePpr.foreach { case (id, want) =>
          if (math.abs(ppr(id) - want) > 1.1e-6)
            failures += f"x$n: PPR of node $id ${ppr(id)}%.7f != 1x value $want%.7f"
        }
      }
      println(f"[graph-scale] x$n%-4d PPR from 32 copy-0 seeds: ${ppr.size}%6d ranked nodes, $pprSec%6.2f s")
    }

    failures.foreach(f => System.err.println(s"[graph-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}
