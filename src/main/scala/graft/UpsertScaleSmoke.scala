package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, ServePointer}

/** Scaling smoke for the CDC UPSERT write path — the
  * [[IngestScaleSmoke]] sibling for [[Retrieval.ingestUpsertBatch]]:
  * replicate the document corpus N times (fresh ids) and run the SAME
  * fixed-size upsert batch (half replacements of live documents, half
  * brand-new arrivals) at 1x and Nx. The claim under test is the CDC
  * path's 100 TB posture: a micro-batch of B "current version" rows
  * arriving on an always-on index must pay O(B) bytes — one tombstone
  * id list for the replaced half plus one increment segment, NEVER a
  * corpus rewrite — regardless of index size, with the same
  * metadata-priced lifecycle as the additive path. The one
  * deliberately-paid scale cost is the replaced-id semi-join against
  * the live id set (a narrow doclen scan, documented on the entry
  * point); its wall-clock prints for the record. ASSERTED properties:
  *
  *  - O(batch) upsert bytes: the same fixed batch publishes batch-root
  *    bytes bounded by a constant multiple of the 1x figure.
  *  - base byte-identity: the base generation's file listing is
  *    untouched by the round (replacements are tombstones + re-adds,
  *    never in-place edits).
  *  - exactly-once replay: re-running the committed batch changes no
  *    file under the ingest root and moves no pointer.
  *  - serve equality: after the round, the pointer's generation ranks
  *    a probe query IDENTICALLY to a from-scratch build of the
  *    post-upsert corpus — replaced docs serve ONLY their new text,
  *    arrivals serve, everything else is untouched.
  *
  * Usage: runMain graft.UpsertScaleSmoke [sfDir] [replicas]
  */
object UpsertScaleSmoke {

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
      SmokeFiles.replicated(spark, n, s"/tmp/graft_upsert_scale_${n}x")(r =>
        if (r == 0) docs
        else docs.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"),
          col("text")))

    // the FIXED batch: the same absolute rows at every scale — the
    // replaced half drawn from replica 0 by original id, the arrival
    // half on ids no replica can collide with
    val halfN = 20
    println(s"[upsert-scale] base corpus: $nBase rows/replica; one fixed " +
      s"${2 * halfN}-row upsert batch ($halfN replaced + $halfN new) at x1 and x$replicas")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var batchBytesAt1x = -1L

    for (n <- Seq(1, replicas)) {
      val corpus = corpusOf(n)
      val replacedIds = corpus.where(col("doc_id") < stride)
        .orderBy("doc_id").limit(halfN).collect().map(_.getLong(0))
      val replaced = corpus.where(col("doc_id").isin(replacedIds.toIndexedSeq: _*))
        .select(col("doc_id"), concat(col("text"), lit(" refreshed")).as("text"))
      val arrivals = corpus.where(col("doc_id").isin(replacedIds.toIndexedSeq: _*))
        .select((col("doc_id") + lit(replicas.toLong * stride + stride)).as("doc_id"),
          concat(col("text"), lit(" new")).as("text"))
      val batch = replaced.unionByName(arrivals)

      val root = s"/tmp/graft_upsert_root_${n}x"
      rmrf(root)
      val ptr = s"$root/CURRENT"
      val (_, buildSec) = time {
        Retrieval.buildIndex(corpus, "doc_id", "text", s"$root/base")
      }
      ServePointer.publish(spark, ptr, s"$root/base", "BM25")
      val baseBefore = fileListing(s"$root/base")

      // the round: quiet policy, so the O(batch) bytes are the claim
      val (_, upsertSec) = time {
        Retrieval.ingestUpsertBatch(spark, batch, 0L, ptr, s"$root/gen",
          "doc_id", "text", maxSegments = 64, maxMaskedRatio = 1.0,
          keepGenerations = Some(0))
      }
      val batchBytes = duBytes(s"$root/gen/batch-0")
      if (batchBytesAt1x < 0) batchBytesAt1x = batchBytes
      else if (batchBytes > 3L * batchBytesAt1x)
        failures += s"x$n: the SAME ${2 * halfN}-row upsert published $batchBytes bytes " +
          s"vs $batchBytesAt1x at x1 — the CDC round must be O(batch), not O(corpus)"
      if (fileListing(s"$root/base") != baseBefore)
        failures += s"x$n: the base generation's files changed under an O(batch) upsert"
      if (!ServePointer.read(spark, ptr).contains("/gen/batch-0/"))
        failures += s"x$n: the pointer did not flip to the committed upsert"

      // exactly-once replay at scale: pure metadata, nothing moves
      val genBefore = fileListing(s"$root/gen")
      val ptrBefore = ServePointer.read(spark, ptr)
      val (_, replaySec) = time {
        Retrieval.ingestUpsertBatch(spark, batch, 0L, ptr, s"$root/gen",
          "doc_id", "text", maxSegments = 64, maxMaskedRatio = 1.0,
          keepGenerations = Some(0))
      }
      if (fileListing(s"$root/gen") != genBefore)
        failures += s"x$n: a replayed committed upsert changed files under the ingest root"
      if (ServePointer.read(spark, ptr) != ptrBefore)
        failures += s"x$n: a replayed committed upsert moved the pointer"

      // serve equality against a from-scratch build of the post-upsert
      // corpus: replaced docs rank with ONLY their new text, arrivals
      // rank, untouched docs are untouched
      val served = ServePointer.read(spark, ptr)
      val liveCount = Retrieval.liveDocIds(spark, served).count()
      val wantCount = corpus.count() + halfN
      if (liveCount != wantCount)
        failures += s"x$n: served live count $liveCount != post-upsert corpus $wantCount"
      val post = corpus.where(!col("doc_id").isin(replacedIds.toIndexedSeq: _*)).unionByName(batch)
      val refPath = s"$root/ref"
      Retrieval.buildIndex(post, "doc_id", "text", refPath)
      val got = Retrieval.searchTopKIndexed(spark, served, "doc_id",
        Seq("spark", "fast", "join"), 10).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val want = Retrieval.searchTopKIndexed(spark, refPath, "doc_id",
        Seq("spark", "fast", "join"), 10).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      if (got != want)
        failures += s"x$n: post-upsert serve diverged from a from-scratch build"

      println(f"[upsert-scale] x$n%-3d build=$buildSec%.2fs upsert=$upsertSec%.2fs " +
        f"(bytes=$batchBytes) replay=$replaySec%.2fs live=$liveCount")
    }

    if (failures.nonEmpty) {
      failures.foreach(f => System.err.println(s"[upsert-scale] FAIL: $f"))
      sys.exit(1)
    }
    println(s"[upsert-scale] PASS: O(batch) bytes, base byte-identity, metadata-only " +
      s"replay, and serve equality hold at x$replicas")
  }
}
