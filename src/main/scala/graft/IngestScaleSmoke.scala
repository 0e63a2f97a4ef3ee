package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, ServePointer}

/** Scaling smoke for the STREAMING INGEST write path — the
  * continuous-ingest sibling of [[SideIndexScaleSmoke]] /
  * [[RetrievalScaleSmoke]]: replicate the document corpus N times
  * (fresh ids) and run the SAME fixed-size ingest batches at 1x and
  * Nx. The claim under test is the write path's 100 TB posture: a
  * micro-batch of B documents arriving on an always-on index must pay
  * O(B) — bytes AND base-file-identity — regardless of how large the
  * index already is, and the lifecycle around it (pointer flips,
  * exactly-once replay, retention) must stay metadata-priced.
  * Wall-clock prints for the record; the ASSERTED properties are
  * exact:
  *
  *  - O(batch) ingest bytes: one [[Retrieval.ingestIndexBatch]] of a
  *    FIXED-size batch publishes batch-root bytes bounded by a
  *    constant multiple of the 1x figure — segments carry by
  *    reference, only the batch lands.
  *  - base byte-identity: the base generation's file listing (name,
  *    length, mtime) is IDENTICAL after the batch committed and the
  *    pointer flipped.
  *  - exactly-once replay at scale: re-running the committed batch
  *    changes NO file under the ingest root and moves no pointer —
  *    the replay is a metadata probe, never a re-index.
  *  - retention after compaction: a second batch under a tripped
  *    policy re-homes the corpus; `retain(keep = 0)` then physically
  *    reclaims the base root and the first batch's round root while
  *    the served relation stays intact (count + a probe search).
  *
  * Usage: runMain graft.IngestScaleSmoke [sfDir] [replicas]
  */
object IngestScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  import SmokeFiles.{duBytes, fileListing, rmrf}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Sessions.get()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), col("text"))
    val stride = docs.agg(max("doc_id")).head().getLong(0) + 1L
    val nBase = docs.count()

    def corpusOf(n: Int): DataFrame =
      SmokeFiles.replicated(spark, n, s"/tmp/graft_ingest_scale_${n}x")(r =>
        if (r == 0) docs
        else docs.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"),
          col("text")))

    // the FIXED batches: the same absolute rows at every scale (drawn
    // from replica 0 by original id), so "O(batch)" compares equal work
    val batchN = 40
    println(s"[ingest-scale] base corpus: $nBase rows/replica; two fixed $batchN-doc " +
      s"batches at x1 and x$replicas")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var batchBytesAt1x = -1L

    for (n <- Seq(1, replicas)) {
      val corpus = corpusOf(n)
      val batchIds = corpus.where(col("doc_id") < stride)
        .orderBy("doc_id").limit(2 * batchN).collect().map(_.getLong(0))
      val (aIds, bIds) = batchIds.splitAt(batchN)
      val batchA = corpus.where(col("doc_id").isin(aIds.toIndexedSeq: _*))
      val batchB = corpus.where(col("doc_id").isin(bIds.toIndexedSeq: _*))
      val baseCorpus = corpus.where(!col("doc_id").isin(batchIds.toIndexedSeq: _*))

      val root = s"/tmp/graft_ingest_root_${n}x"
      rmrf(root)
      val ptr = s"$root/CURRENT"
      val (_, buildSec) = time {
        Retrieval.buildIndex(baseCorpus, "doc_id", "text", s"$root/base")
      }
      ServePointer.publish(spark, ptr, s"$root/base", "BM25")
      val baseBefore = fileListing(s"$root/base")

      // batch A: quiet policy — the O(batch) measurement
      val (_, ingestSec) = time {
        Retrieval.ingestIndexBatch(spark, batchA, 0L, ptr, s"$root/gen",
          "doc_id", "text", maxSegments = 64, maxMaskedRatio = 1.0,
          keepGenerations = Some(0))
      }
      val batchBytes = duBytes(s"$root/gen/batch-0")
      if (batchBytesAt1x < 0) batchBytesAt1x = batchBytes
      else if (batchBytes > 3L * batchBytesAt1x)
        failures += s"x$n: the SAME $batchN-doc batch published $batchBytes bytes vs " +
          s"$batchBytesAt1x at x1 — ingest must be O(batch), not O(corpus)"
      if (fileListing(s"$root/base") != baseBefore)
        failures += s"x$n: the base generation's files changed under an O(batch) ingest"
      if (!ServePointer.read(spark, ptr).contains("/gen/batch-0/"))
        failures += s"x$n: the pointer did not flip to the committed batch"
      // retention with keep=0 ran inside the round: base is CARRIED by
      // batch 0 (by reference), so it must be HELD, not deleted
      if (!new java.io.File(s"$root/base").exists)
        failures += s"x$n: retention deleted the carried base generation"

      // exactly-once replay: no file under the ingest tree changes, no
      // pointer movement — a pure metadata probe
      val genBefore = fileListing(s"$root/gen")
      val ptrBefore = ServePointer.read(spark, ptr)
      val (_, replaySec) = time {
        Retrieval.ingestIndexBatch(spark, batchA, 0L, ptr, s"$root/gen",
          "doc_id", "text", maxSegments = 64, maxMaskedRatio = 1.0,
          keepGenerations = Some(0))
      }
      if (fileListing(s"$root/gen") != genBefore)
        failures += s"x$n: a replayed committed batch changed files under the ingest root"
      if (ServePointer.read(spark, ptr) != ptrBefore)
        failures += s"x$n: a replayed committed batch moved the pointer"

      // batch B under a tripped policy: compaction re-homes the whole
      // corpus into a self-contained generation; the keep=0 retention
      // inside the round must then reclaim base AND batch 0's root
      val (_, compactSec) = time {
        Retrieval.ingestIndexBatch(spark, batchB, 1L, ptr, s"$root/gen",
          "doc_id", "text", maxSegments = 1, keepGenerations = Some(0))
      }
      if (!ServePointer.read(spark, ptr).endsWith("/gen/batch-1/compacted"))
        failures += s"x$n: the tripped policy did not re-home into batch 1's compaction " +
          s"(pointer: ${ServePointer.read(spark, ptr)})"
      if (new java.io.File(s"$root/base").exists)
        failures += s"x$n: retention left the superseded base root after the compaction " +
          "unpinned it"
      if (new java.io.File(s"$root/gen/batch-0").exists)
        failures += s"x$n: retention left batch 0's superseded round root"

      // served correctness after the whole lifecycle: count and a probe
      // search against a from-scratch build of the same corpus
      val served = ServePointer.read(spark, ptr)
      val liveCount = Retrieval.liveDocIds(spark, served).count()
      val wantCount = corpus.count()
      if (liveCount != wantCount)
        failures += s"x$n: served live count $liveCount != corpus $wantCount"
      val refPath = s"$root/ref"
      Retrieval.buildIndex(corpus, "doc_id", "text", refPath)
      val got = Retrieval.searchTopKIndexed(spark, served, "doc_id",
        Seq("spark", "fast", "join"), 10).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val want = Retrieval.searchTopKIndexed(spark, refPath, "doc_id",
        Seq("spark", "fast", "join"), 10).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      if (got != want)
        failures += s"x$n: post-lifecycle serve diverged from a from-scratch build"

      println(f"[ingest-scale] x$n%-3d build=$buildSec%.2fs batchA=$ingestSec%.2fs " +
        f"(bytes=$batchBytes) replay=$replaySec%.2fs batchB+compact+retain=$compactSec%.2fs " +
        f"live=$liveCount")
    }

    if (failures.nonEmpty) {
      failures.foreach(f => System.err.println(s"[ingest-scale] FAIL: $f"))
      sys.exit(1)
    }
    println(s"[ingest-scale] PASS: O(batch) bytes, base byte-identity, metadata-only " +
      s"replay, and post-compaction retention hold at x$replicas")
  }
}
