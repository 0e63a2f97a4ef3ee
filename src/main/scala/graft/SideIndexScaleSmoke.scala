package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SideIndex

/** Scaling smoke for the side-table index family — the admission
  * side tables' sibling of [[RetrievalScaleSmoke]] / [[AnnScaleSmoke]]:
  * replicate the per-document payload relation N times (fresh ids) and
  * run the SAME fixed-size maintenance round at 1x and Nx. The claim
  * under test is the tier's 100 TB posture: a daily churn of D rows
  * must publish O(D) bytes and leave the base segment's files
  * untouched on disk, regardless of corpus size. Wall-clock prints for
  * the record; the ASSERTED properties are exact:
  *
  *  - O(delta) round bytes: one [[SideIndex.maintain]] round (fixed
  *    deltaN deletes + deltaN re-keyed re-adds, quiet policy) publishes
  *    round-root bytes bounded by a constant multiple of the 1x round
  *    — segments carry by reference, only the delta lands.
  *  - base byte-identity: the base index's file listing (name, length,
  *    mtime) is IDENTICAL before and after the round.
  *  - masked-read correctness at scale: the served live relation
  *    equals the rule-replayed one (symmetric difference empty), and
  *    the info row's live count agrees.
  *  - mask-join shape: the sequenced tombstone mask rides broadcast
  *    joins — a sort-merge shuffle of the corpus-sized rows against a
  *    deltaN-row mask would be the 100 TB anti-plan.
  *  - tripped compaction: a maxSegments=1 round re-homes exactly the
  *    live set into one segment with zero tombstone debt.
  *
  * Usage: runMain graft.SideIndexScaleSmoke [sfDir] [replicas]
  */
object SideIndexScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  import SmokeFiles.{duBytes, fileListing, rmrf}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = Sessions.get()

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), length(col("text")).cast("int").as("n_chars"))
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L
    val nBase = base.count()

    def corpusOf(n: Int): DataFrame =
      SmokeFiles.replicated(spark, n, s"/tmp/graft_side_scale_${n}x")(r =>
        if (r == 0) base
        else base.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"),
          (col("n_chars") + lit(r)).as("n_chars")))

    println(s"[side-scale] base: $nBase rows; one fixed-delta maintenance round at x1 and x$replicas")
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val deltaN = 37 // FIXED churn size — the O(delta) yardstick
    var roundBytesAt1x = -1L

    for (n <- Seq(1, replicas)) {
      val corpus = corpusOf(n)
      val basePath = s"/tmp/graft_side_idx_${n}x"
      val roundRoot = s"/tmp/graft_side_round_${n}x"
      val compactRoot = s"/tmp/graft_side_compact_${n}x"
      Seq(basePath, roundRoot, compactRoot).foreach(rmrf)

      val (_, buildSec) = time { SideIndex.build(corpus, "doc_id", "chars", basePath) }
      val baseBefore = fileListing(basePath)

      // the daily round: deltaN deletes, of which deltaN/2 re-enter
      // re-keyed (the delete + update document-update path)
      val churn = corpus.orderBy("doc_id").limit(deltaN)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      churn.count()
      val readds = churn.where(col("doc_id") % 2 === 0)
        .select(col("doc_id"), (col("n_chars") + 1).as("n_chars"))
      // explicitly quiet policy: the fixed deltaN masked share depends
      // on corpus size, so the defaults could trip compaction on a
      // small sfDir and corrupt the O(delta) measurement — pin it off
      val (served, roundSec) = time {
        SideIndex.maintain(spark, basePath,
          deletes = Some(churn.select("doc_id")), increment = Some(readds),
          "doc_id", "chars", roundRoot, maxMaskedRatio = 1.0)
      }

      // O(delta): the round root carries manifests, a deltaN tombstone
      // list and a deltaN/2-row segment — corpus-size-invariant bytes
      val roundBytes = duBytes(roundRoot)
      if (roundBytesAt1x < 0) roundBytesAt1x = roundBytes
      else if (roundBytes > 3L * roundBytesAt1x)
        failures += s"x$n: maintenance round published $roundBytes bytes vs $roundBytesAt1x " +
          s"at x1 for the SAME $deltaN-row churn — the round must be O(delta), not O(corpus)"
      // base untouched on disk
      if (fileListing(basePath) != baseBefore)
        failures += s"x$n: the base index's files changed under an O(delta) round"

      // masked-read correctness: served live set == rule-replayed set
      val liveDf = SideIndex.read(spark, served, "doc_id", "chars")
      val expected = corpus.join(churn.select("doc_id"), Seq("doc_id"), "left_anti")
        .unionByName(readds)
      val (diff, readSec) = time {
        liveDf.exceptAll(expected).count() + expected.exceptAll(liveDf).count()
      }
      if (diff != 0L)
        failures += s"x$n: masked live read diverged from the rule-replayed relation ($diff rows)"
      val inf = SideIndex.info(spark, served, "chars").head()
      val liveCount = inf.getAs[Long]("n_rows_live")
      val exactExpected = corpus.count() - deltaN + readds.count()
      if (liveCount != exactExpected)
        failures += s"x$n: info live count $liveCount != expected $exactExpected"
      // mask-join shape: broadcast, never sort-merge against the mask
      val plan = liveDf.queryExecution.executedPlan.toString
      if (!plan.contains("BroadcastHashJoin"))
        failures += s"x$n: masked read plan lost its broadcast mask join:\n$plan"
      if (plan.contains("SortMergeJoin"))
        failures += s"x$n: masked read plan sort-merges against the delta-sized mask:\n$plan"

      // tripped policy: one more round under maxSegments=1 re-homes to
      // one segment, zero tombstone generations, same live count
      val (compacted, compactSec) = time {
        SideIndex.maintain(spark, served, None, None, "doc_id", "chars",
          compactRoot, maxSegments = 1)
      }
      val cInf = SideIndex.info(spark, compacted, "chars").head()
      if (cInf.getInt(0) != 1 || cInf.getInt(1) != 0 ||
          cInf.getAs[Long]("n_rows_live") != exactExpected)
        failures += s"x$n: tripped compaction produced $cInf, expected (1, 0, live=$exactExpected)"
      churn.unpersist()
      println(f"[side-scale] x$n%-4d build $buildSec%6.2f s, round $roundSec%6.2f s " +
        f"($roundBytes%8d bytes, delta=$deltaN), masked diff-check $readSec%6.2f s, " +
        f"compaction $compactSec%6.2f s, live $liveCount%d")
    }

    failures.foreach(f => System.err.println(s"[side-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}
