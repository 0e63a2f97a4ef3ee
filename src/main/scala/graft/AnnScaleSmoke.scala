package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Scaling smoke for the ANN tier — the embedding-side sibling of
  * [[ScaleSmoke]]: replicate the embeddings table N times (each
  * replica deterministically jittered so it is a distinct vector, not
  * an exact duplicate) and compare exact brute force against IVF-PQ at
  * 1x and Nx. Wall-clock is printed for the record, but the ASSERTED
  * properties are the structural ones that decide 100 TB viability,
  * because local timings swing with JIT and scheduling noise:
  *
  *  - scan fraction: the pairs IVF-PQ actually scores must be bounded
  *    by ~nprobe/nCells of the brute-force pair count — cell pruning
  *    is the mechanism, so the bound is checked by counting (query,
  *    probed-cell) candidate rows, not by timing.
  *  - completeness: every query still gets exactly k distinct
  *    non-self neighbors at Nx.
  *  - compression: the candidate relation IVF-PQ shuffles/scans
  *    carries byte codes + one norm per row; its width is asserted
  *    against the float-vector width it replaces.
  *  - maintenance at scale (the segmented + tombstoned chain, the
  *    [[RetrievalScaleSmoke]] assertion at the vector tier): a build
  *    + O(increment) update + fixed-size delete publishes a delete
  *    root whose bytes are CORPUS-SIZE-INVARIANT, the masked read
  *    equals a one-pass encode of the live set, and the sequenced
  *    tombstone mask rides a broadcast join.
  *
  * Usage: runMain graft.AnnScaleSmoke [sfDir] [replicas]
  */
object AnnScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  import SmokeFiles.{duBytes, rmrf}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(50)
    val nCells = 16
    val nprobe = 2
    val k = 10
    val spark = Sessions.get()

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet").select("vec_id", "embedding")
    val stride = base.agg(max("vec_id")).head().getLong(0) + 1L
    val nBase = base.count()

    def corpusOf(n: Int): DataFrame =
      SmokeFiles.replicated(spark, n, s"/tmp/graft_ann_scale_${n}x")(r =>
        if (r == 0) base
        else base.select(
          (col("vec_id") + lit(r.toLong * stride)).as("vec_id"),
          // deterministic per-replica jitter, different per dimension
          // (index-dependent phase) so replicas are distinct vectors
          // that still inhabit the same region — the realistic shape of
          // a growing embedding corpus
          expr(s"transform(embedding, (x, i) -> x + CAST(0.01 * $r AS FLOAT) * CAST(1 + pmod(i, 3) AS FLOAT))")
            .cast("array<float>").as("embedding")))

    println(s"[ann-scale] base: $nBase vectors; comparing exact vs IVF-PQ at x1 and x$replicas (cells=$nCells, nprobe=$nprobe, k=$k)")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var delBytesAt1x = -1L
    val deltaN = 37 // FIXED delete size — the O(delta) yardstick
    // the trained subspace codebooks of the last scale step — the
    // compression assertion below derives M from them instead of
    // hardcoding the config
    var lastCodebooks: Array[Array[Array[Float]]] = null

    for (n <- Seq(1, replicas)) {
      val corpus = corpusOf(n)
      val nVecs = corpus.count()
      val queries = corpus.where(col("vec_id") < 25)

      val (exact, exactSec) = time {
        val e = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", k)
        (e.count(), e)
      }
      // the deployment split, timed separately: quantizer training and
      // the index build (cell assignment + subspace encoding of every
      // candidate) are ingest-time one-offs amortized over every query
      // the index ever serves; the QUERY path reads the materialized
      // code relation and must stay cheap as the corpus grows
      val ((coarse, cb), trainSec) = time {
        (Similarity.trainCentroids(corpus, "vec_id", "embedding", nCells),
          Similarity.trainProductCodebooks(corpus, "vec_id", "embedding", numSub = 16, nCentroids = 64))
      }
      lastCodebooks = cb
      val indexPath = s"/tmp/graft_ann_index_${n}x"
      val (_, buildSec) = time {
        Similarity.pqIndex(corpus, "vec_id", "embedding", coarse, cb)
          .write.mode("overwrite").parquet(indexPath)
      }
      val index = spark.read.parquet(indexPath)
      val (approx, annSec) = time {
        val a = Similarity.ivfPqTopKIndexed(queries, index, "vec_id", "embedding", k, coarse, nprobe, cb)
        (a.count(), a)
      }

      // completeness: k distinct non-self neighbors with contiguous
      // ranks for every query, at every scale
      val bad = approx._2.groupBy("query_id")
        .agg(count(lit(1)).as("n"), countDistinct("neighbor_id").as("d"),
          max((col("neighbor_id") === col("query_id")).cast("int")).as("self"))
        .where(col("n") =!= k || col("d") =!= k || col("self") === 1)
        .count()
      if (bad > 0) failures += s"x$n: $bad queries returned an incomplete/self-polluted top-$k"

      // scan fraction: count the (query, candidate) pairs the cell join
      // admits vs the full cross product brute force scores
      val cells = corpus.select(Similarity.assignCell(col("embedding"), coarse).as("cell"))
        .groupBy("cell").agg(count(lit(1)).as("csize"))
      val scanned = queries
        .select(explode(Similarity.probeCells(col("embedding"), coarse, nprobe)).as("cell"))
        .join(cells, "cell")
        .agg(sum("csize")).head().getLong(0)
      val full = queries.count() * nVecs
      val frac = scanned.toDouble / full
      // probed cells are the query's NEAREST cells, which skew bigger
      // than average for clustered queries — allow 2x the uniform
      // nprobe/nCells share before calling the pruning broken
      val ceiling = 2.0 * nprobe.toDouble / nCells
      if (frac > ceiling)
        failures += f"x$n: IVF-PQ scanned $frac%.3f of the corpus, over the ${ceiling}%.3f ceiling — cell pruning not bounding the probe"

      // recall vs exact, for the record (near-isotropic synthetic
      // vectors make rank recall noise-bound; the floor lives in the
      // oracle-graded similarity_pq_recall, not here)
      val hits = exact._2.select("query_id", "neighbor_id")
        .intersect(approx._2.select("query_id", "neighbor_id")).count()
      println(f"[ann-scale] x$n%-4d ($nVecs%8d vecs): exact $exactSec%6.2f s, ivf-pq QUERY $annSec%6.2f s (one-off: train $trainSec%.2f s, index build $buildSec%.2f s), scanned ${frac * 100}%5.1f%% of pairs, recall@$k ${hits.toDouble / exact._1}%.3f")

      // ---- segmented + tombstoned maintenance chain at this scale:
      // 90% build + 10% O(increment) update (2 segments), then a
      // FIXED-size delete; the delete root's bytes must not scale
      // with the corpus, and the masked read must equal a one-pass
      // encode of the live set
      val segPath = s"/tmp/graft_ann_seg_${n}x"
      val updPath = s"/tmp/graft_ann_segupd_${n}x"
      val delPath = s"/tmp/graft_ann_segdel_${n}x"
      Seq(segPath, updPath, delPath).foreach(rmrf)
      val (_, chainSec) = time {
        Similarity.writePqIndex(corpus.where(col("vec_id") % 10 =!= 0),
          "vec_id", "embedding", coarse, cb, segPath)
        Similarity.updatePqIndex(spark, segPath, corpus.where(col("vec_id") % 10 === 0),
          "vec_id", "embedding", coarse, cb, updPath)
        Similarity.deleteFromPqIndex(spark, updPath,
          corpus.select("vec_id").orderBy("vec_id").limit(deltaN), "vec_id", delPath)
      }
      val delBytes = duBytes(delPath)
      if (delBytesAt1x < 0) delBytesAt1x = delBytes
      else if (delBytes > 3L * delBytesAt1x)
        failures += s"x$n: delete root is $delBytes bytes vs $delBytesAt1x at x1 for the SAME " +
          s"$deltaN-id delete — tombstone publish must be O(delta), not O(corpus)"
      val masked = Similarity.readPqIndex(spark, delPath)
      def rows(df: DataFrame) = df.select(col("neighbor_id"), col("cell").cast("int"),
        col("codes").cast("string"), col("c_norm"))
      val delIds = corpus.select("vec_id").orderBy("vec_id").limit(deltaN)
      val expect = Similarity.pqIndex(
        corpus.join(delIds, Seq("vec_id"), "left_anti"), "vec_id", "embedding", coarse, cb)
      val (diverged, maskedSec) = time {
        rows(masked).exceptAll(rows(expect)).count() +
          rows(expect).exceptAll(rows(masked)).count()
      }
      if (diverged != 0)
        failures += s"x$n: masked segmented read diverged from the one-pass live encode ($diverged rows)"
      // mask-join shape: the delta-sized tombstone mask must broadcast
      val mq = masked.queryExecution
      mq.toRdd.count(): Unit // finalize AQE on THIS QueryExecution
      val plan = mq.executedPlan.toString
      if (!plan.contains("BroadcastHashJoin"))
        failures += s"x$n: masked read plan lost its broadcast mask join:\n$plan"
      if (plan.contains("SortMergeJoin"))
        failures += s"x$n: masked read shuffles a sort-merge join against the delta-sized mask:\n$plan"
      println(f"[ann-scale] x$n%-4d segmented+tombstoned: chain $chainSec%6.2f s, masked-read equality check $maskedSec%6.2f s, delete root $delBytes%8d bytes (delta=$deltaN ids)")
    }

    // compression: the scored candidate payload is M code bytes + one
    // norm vs d floats — assert the structural widths, with M DERIVED
    // from the trained codebooks so a PQ config change can't leave the
    // assertion (or the printed ratio) silently stale
    val dim = base.head().getSeq[Float](1).length
    val codeBytes = lastCodebooks.length + 8 // M subspace codes + double norm
    val vecBytes = dim * 4 + 8
    println(f"[ann-scale] candidate payload: $codeBytes B (codes+norm) vs $vecBytes B (vector+norm) — ${vecBytes.toDouble / codeBytes}%.1fx narrower probe side")
    if (codeBytes * 4 > vecBytes)
      failures += s"PQ payload $codeBytes B is not materially narrower than the $vecBytes B vector it replaces"

    failures.foreach(f => System.err.println(s"[ann-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}
