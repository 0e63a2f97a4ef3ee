package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Retrieval

/** Scaling smoke for the lexical-retrieval tier — the text-side sibling
  * of [[AnnScaleSmoke]]: replicate the documents table N times (fresh
  * ids, text unchanged, so every BM25 quantity — df, dl, N, total_len —
  * scales proportionally; scores shift only through the +1 smoothing
  * terms, which do not scale, so equality is asserted between the two
  * ACCESS PATHS at each scale, never across scales) and compare the
  * direct corpus-scan search against the build-once / serve-many
  * indexed split at 1x and Nx. Wall-clock is
  * printed for the record; the ASSERTED properties are structural:
  *
  *  - equivalence: the indexed serve returns the IDENTICAL (rank, id,
  *    score) list as the direct scan at every scale — the index is an
  *    access path, never a semantics change.
  *  - candidate law: the rows entering the scoring join are exactly
  *    sum(df(term)) over the query terms — the index admits postings
  *    for queried terms only, and their share of the postings relation
  *    stays a term-frequency property, NOT a corpus-size property
  *    (the fraction is asserted scale-invariant between 1x and Nx).
  *  - completeness: contiguous ranks 1..k at every scale.
  *  - maintenance at scale (the segmented + tombstoned chain): a
  *    build + O(increment) update + fixed-size delete publishes a
  *    delete root whose on-disk footprint is CORPUS-SIZE-INVARIANT
  *    (O(delta) bytes — the same id count must cost the same bytes at
  *    1x and Nx), the masked serve equals the direct scan over the
  *    live set, and the serve plan keeps the sequenced tombstone mask
  *    as a broadcast join (never a corpus-side shuffle).
  *
  * Usage: runMain graft.RetrievalScaleSmoke [sfDir] [replicas]
  */
object RetrievalScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  import SmokeFiles.{duBytes, rmrf}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(50)
    val terms = Seq("spark", "fast", "join")
    val k = 10
    val spark = Sessions.get()

    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "text")
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L
    val nBase = base.count()

    def corpusOf(n: Int): DataFrame =
      SmokeFiles.replicated(spark, n, s"/tmp/graft_retrieval_scale_${n}x")(r =>
        if (r == 0) base
        else base.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"), col("text")))

    println(s"[retrieval-scale] base: $nBase docs; direct scan vs indexed serve at x1 and x$replicas (terms=${terms.mkString(",")}, k=$k)")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var fracAt1x = -1.0
    var delBytesAt1x = -1L
    val deltaN = 37 // FIXED delete size — the O(delta) yardstick

    for (n <- Seq(1, replicas)) {
      val corpus = corpusOf(n)
      val nDocs = corpus.count()

      val (direct, directSec) = time {
        Retrieval.searchTopK(corpus, "doc_id", "text", terms, k)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      }
      val indexPath = s"/tmp/graft_retrieval_index_${n}x"
      val (_, buildSec) = time {
        Retrieval.buildIndex(corpus, "doc_id", "text", indexPath)
      }
      val (indexed, serveSec) = time {
        Retrieval.searchTopKIndexed(spark, indexPath, "doc_id", terms, k)
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      }

      // equivalence: the access path must not change the answer
      if (indexed != direct)
        failures += s"x$n: indexed serve diverged from the direct scan:\n  direct  $direct\n  indexed $indexed"
      if (indexed.map(_._1) != (1 to indexed.length) || indexed.isEmpty)
        failures += s"x$n: ranks not contiguous from 1: ${indexed.map(_._1)}"

      // candidate law: scoring-join input rows == sum(df) over the
      // query terms; the admitted share of the postings relation is a
      // term property and must not grow with the corpus
      // a fresh buildIndex publishes exactly one segment; the law is
      // checked against its tables directly
      val postings = spark.read.parquet(s"$indexPath/segments/seg-00000/postings")
      val totalPostings = postings.count()
      val matched = postings.where(col("term").isin(terms: _*)).count()
      val sumDf = spark.read.parquet(s"$indexPath/segments/seg-00000/termdf")
        .where(col("term").isin(terms: _*))
        .agg(coalesce(sum("df"), lit(0L))).head().getLong(0)
      if (matched != sumDf)
        failures += s"x$n: candidate rows $matched != sum(df) $sumDf — index admits the wrong postings"
      val frac = matched.toDouble / totalPostings
      if (fracAt1x < 0) fracAt1x = frac
      else if (math.abs(frac - fracAt1x) > 0.01 * fracAt1x + 1e-9)
        failures += f"x$n: admitted-postings fraction $frac%.4f drifted from the 1x fraction $fracAt1x%.4f — serve-side share must be scale-invariant"

      println(f"[retrieval-scale] x$n%-4d ($nDocs%8d docs): direct $directSec%6.2f s, indexed SERVE $serveSec%6.2f s (one-off index build $buildSec%.2f s), candidates $matched%8d = ${frac * 100}%5.2f%% of ${totalPostings}%9d postings")

      // ---- the segmented + tombstoned maintenance chain at this scale:
      // 90% build + 10% O(increment) update (2 segments), then a
      // FIXED-size delete. The delete root's bytes are the O(delta)
      // assertion: same id count, same bytes, at x1 and xN.
      val segPath = s"/tmp/graft_retrieval_seg_${n}x"
      val updPath = s"/tmp/graft_retrieval_segupd_${n}x"
      val delPath = s"/tmp/graft_retrieval_segdel_${n}x"
      Seq(segPath, updPath, delPath).foreach(rmrf)
      val (_, chainSec) = time {
        Retrieval.buildIndex(corpus.where(col("doc_id") % 10 =!= 0), "doc_id", "text", segPath)
        Retrieval.updateIndex(spark, segPath,
          corpus.where(col("doc_id") % 10 === 0), "doc_id", "text", updPath)
        Retrieval.deleteFromIndex(spark, updPath,
          corpus.where(col("text").isNotNull).select("doc_id")
            .orderBy("doc_id").limit(deltaN),
          "doc_id", delPath)
      }
      val delBytes = duBytes(delPath)
      if (delBytesAt1x < 0) delBytesAt1x = delBytes
      else if (delBytes > 3L * delBytesAt1x)
        failures += s"x$n: delete root is $delBytes bytes vs $delBytesAt1x at x1 for the SAME " +
          s"$deltaN-id delete — tombstone publish must be O(delta), not O(corpus)"
      val servedDf = Retrieval.searchTopKIndexed(spark, delPath, "doc_id", terms, k)
      val (served, maskedServeSec) = time {
        servedDf.collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      }
      val delIds = corpus.where(col("text").isNotNull).select("doc_id")
        .orderBy("doc_id").limit(deltaN)
      val liveCorpus = corpus.join(delIds, Seq("doc_id"), "left_anti")
      val directLive = Retrieval.searchTopK(liveCorpus, "doc_id", "text", terms, k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      if (served != directLive)
        failures += s"x$n: masked serve diverged from the direct scan over the live set:\n  direct  $directLive\n  masked  $served"
      // mask-join shape: the sequenced tombstone mask must ride a
      // broadcast join — a sort-merge shuffle of the postings against
      // a $deltaN-row mask would be the 100TB anti-plan
      val plan = servedDf.queryExecution.executedPlan.toString
      if (!plan.contains("BroadcastHashJoin"))
        failures += s"x$n: masked serve plan lost its broadcast joins:\n$plan"
      if (plan.contains("SortMergeJoin"))
        failures += s"x$n: masked serve plan shuffles a sort-merge join against the delta-sized mask:\n$plan"
      println(f"[retrieval-scale] x$n%-4d segmented+tombstoned: chain ${chainSec}%6.2f s, masked serve $maskedServeSec%6.2f s, delete root $delBytes%8d bytes (delta=$deltaN ids)")
    }

    failures.foreach(f => System.err.println(s"[retrieval-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}
