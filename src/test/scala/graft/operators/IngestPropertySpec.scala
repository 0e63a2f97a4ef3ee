package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Randomized crash injection over the INGEST round's commit sequence
  * — the streaming sibling of PropertySpec's nightly-swap schedules:
  * StreamingSpec drills the replay states example-based; this drives
  * the same sequence (clear residue → chainbase record → maintain,
  * whose manifest write is the commit → pointer flip) through RANDOM
  * kill points and asserts the replay contract every time:
  *
  *   - after the heal (a foreachBatch replay = the same call again)
  *     the pointer serves a loadable generation whose live rows are
  *     EXACTLY the batches applied so far — never a silently wrong or
  *     torn serve;
  *   - a second replay of a completed batch is a no-op (convergence,
  *     not progress);
  *   - a FOREIGN pointer move between a batch's commit and its replay
  *     refuses loudly and mutates nothing (the chainbase rule).
  *
  * Kill points per batch: 0 = maintain dies at entry (chainbase is
  * the only residue), 1 = maintain dies after writing data but before
  * the manifest (half-written root), 2 = the commit completed but the
  * process died before the flip (injected through the fence-check
  * seam — the hook throws before any visible pointer mutation),
  * 3 = no crash. A thrown exception IS a crash for this path:
  * ingestRound has no rollback handler, so the on-disk state at the
  * throw is the state a kill -9 would leave.
  */
class IngestPropertySpec extends SparkTestBase {
  import spark.implicits._

  private class InjectedCrash(where: String) extends RuntimeException(s"injected: $where")

  test("crash-injection over the ingest round: 100 random kill schedules all heal or refuse loudly") {
    val base = java.nio.file.Files.createTempDirectory("graft-ingest-prop").toString
    val prnd = new scala.util.Random(20260816L)
    // one shared immutable base generation; pointers are per-schedule
    SideIndex.build(Seq((1L, 1L)).toDF("doc_id", "v"), "doc_id", "t", s"$base/gen0")
    for (schedule <- 1 to 100) {
      val dir = s"$base/s$schedule"
      val ptr = s"$dir/CURRENT"
      ServePointer.publish(spark, ptr, s"$base/gen0", "t")
      var expected = Map(1L -> 1L)
      val nBatches = 1 + prnd.nextInt(2)
      for (b <- 1 to nBatches) {
        val rows = Seq((10L * b, 100L * b), (10L * b + 1, 100L * b + 1))
        val df = rows.toDF("doc_id", "v")
        val kill = prnd.nextInt(4)
        def attempt(crash: Int): Unit = {
          val maintain: (DataFrame, String, String) => String = (r, cur, outRoot) => {
            if (crash == 0) throw new InjectedCrash("maintain entry")
            if (crash == 1) {
              // data lands, the manifest (the commit) never does
              r.write.mode("overwrite").parquet(s"$outRoot/updated/rows")
              throw new InjectedCrash("maintain torn")
            }
            SideIndex.maintain(spark, cur, None, Some(r), "doc_id", "t", outRoot)
          }
          if (crash == 2) IndexManifest.onFenceCheck = p =>
            if (p == ptr) {
              IndexManifest.onFenceCheck = _ => ()
              throw new InjectedCrash("pre-flip")
            }
          try IndexManifest.ingestRound(spark, df, b.toLong, ptr, s"$dir/ingest",
            "side(t)", maintain, keepGenerations = None)
          finally IndexManifest.onFenceCheck = _ => ()
        }
        if (kill < 3) intercept[InjectedCrash] { attempt(kill) }
        attempt(-1) // the foreachBatch replay heals
        expected ++= rows.toMap
        def served(): Map[Long, Long] =
          SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
            .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("v")).toMap
        assert(served() == expected,
          s"schedule $schedule batch $b kill $kill: served ${served()} != $expected")
        // a second replay converges without progress
        val rootBefore = ServePointer.read(spark, ptr)
        attempt(-1)
        assert(ServePointer.read(spark, ptr) == rootBefore,
          s"schedule $schedule batch $b kill $kill: replay of a completed batch moved the pointer")
        assert(served() == expected)
      }
      // every 5th schedule: a foreign writer (outside the single-writer
      // contract) moves the pointer to an unrelated generation after
      // the last batch committed — the replay cannot prove its chain
      // base still serves and must refuse having changed nothing
      if (schedule % 5 == 0) {
        SideIndex.build(Seq((777L, 777L)).toDF("doc_id", "v"), "doc_id", "t", s"$dir/foreign")
        ServePointer.publish(spark, ptr, s"$dir/foreign", "t")
        val e = intercept[IllegalArgumentException] {
          IndexManifest.ingestRound(spark,
            Seq((999L, 999L)).toDF("doc_id", "v"), nBatches.toLong, ptr,
            s"$dir/ingest", "side(t)",
            (r, cur, o) => SideIndex.maintain(spark, cur, None, Some(r), "doc_id", "t", o),
            keepGenerations = None)
        }
        assert(e.getMessage.contains("another writer moved the pointer"), e.getMessage)
        assert(ServePointer.read(spark, ptr).endsWith("/foreign"),
          s"schedule $schedule: the refusal must not have re-flipped")
      }
    }
  }
}
