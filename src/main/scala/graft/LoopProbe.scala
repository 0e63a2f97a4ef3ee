package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Phase-level timing probe for the ITERATIVE operators (PageRank, the
  * CC loop) whose production outputs are checkpointed — the checkpoint
  * truncates the plan PlanDump captures, so their in-loop behavior is
  * invisible to the per-query dumps. This main decomposes each loop
  * query into its phases (pair subtree, edge-cache build, loop rounds)
  * and times each with the noop sink (guide §1.4), plus dumps the
  * UN-truncated loop plan so exchange counts per round are checkable.
  *
  * Usage: runMain graft.LoopProbe [sfDir] [outDir]
  *
  * A measurement tool like PlanDump: never on the bench path, adds no
  * query, changes nothing the driver measures.
  */
object LoopProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r22")
    val spark = Sessions.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir)): Unit
    import graft.operators.{Centrality, Dedup}

    def t[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[probe] $label%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // warmup: codegen + JIT for the shared subtrees
    noop(Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 8, rowsPerBand = 2))

    // ---- graph_pagerank phases ----
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 8, rowsPerBand = 2)
    t("pagerank: pair subtree (noop)") { noop(pairs) }
    // fine-grained build attribution: pair-cache count vs edge-cache build
    locally {
      val pairsC = pairs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("pagerank: [attr] pairsC.count") { pairsC.count() }
      val e2 = pairsC.select(explode(array(
          struct(col("a_id").as("src"), col("b_id").as("dst")),
          struct(col("b_id").as("src"), col("a_id").as("dst")))).as("e"))
        .select("e.src", "e.dst")
      val d2 = e2.groupBy("src").agg(count(lit(1)).as("deg"))
      val out2 = e2.join(d2, "src").repartition(2, col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("pagerank: [attr] edge cache build from pairsC") { out2.count() }
      out2.unpersist()
      pairsC.unpersist()
    }
    val (degEdges, loopPart, release) = t("pagerank: degreeJoinedEdges build (lazy+sized)") {
      Centrality.degreeJoinedEdgesSized(pairs, "a_id", "b_id")
    }
    // mirror the production pageRank exactly: the loop's actions run
    // with the shuffle width scoped to the loop width
    try graft.operators.AdaptiveLoop.scoped(spark, loopPart) {
      val nodes = degEdges.select(col("src")).distinct()
      val nNodes = t("pagerank: nodes.count (cache materialize)") { nodes.count() }
      release()
      System.err.println(s"[probe] pagerank: nNodes=$nNodes, cache partitions=${degEdges.rdd.getNumPartitions}, loopPart=$loopPart")
      val teleport = (1.0 - 0.85) / nNodes.toDouble
      val init = nodes.select(col("src").as("id"), lit(1.0 / nNodes.toDouble).as("r"))
      val ranked = Centrality.loopRanks(degEdges, init, teleport, 0.85, 5)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/graph_pagerank_loop_probe.txt"),
        "=== loopRanks(5 iters) UN-truncated plan ===\n\n" +
          ranked.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)): Unit
      t("pagerank: 5-round loop (noop)") { noop(ranked) }
      t("pagerank: 5-round loop again (noop)") { noop(ranked) }
      t("pagerank: localCheckpoint of loop") { ranked.localCheckpoint(true) }: Unit
    } finally { degEdges.unpersist(); release() }

    // ---- full-query reference points (count, the bench action) ----
    t("pagerank: full query count #1") {
      SparkEntry.queries("graph_pagerank")(spark, sfDir).count()
    }
    spark.sharedState.cacheManager.clearCache()
    t("pagerank: full query count #2") {
      SparkEntry.queries("graph_pagerank")(spark, sfDir).count()
    }
    spark.sharedState.cacheManager.clearCache()

    // ---- dedup_clusters_distributed phases ----
    val ndPairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      numHashes = 8, rowsPerBand = 2, thresholdPct = 40)
    t("cc: verified pair subtree (noop)") { noop(ndPairs) }
    t("cc: duplicateClusters distributed (count)") {
      Dedup.duplicateClusters(ndPairs, maxDriverEdges = 0L).count()
    }
    spark.sharedState.cacheManager.clearCache()

    // ---- multimodal cross edges: how many times does decode run ----
    t("multimodal_cross_dedup: full query count") {
      SparkEntry.queries("multimodal_cross_dedup")(spark, sfDir).count()
    }
    spark.sharedState.cacheManager.clearCache()

    spark.stop()
  }
}
