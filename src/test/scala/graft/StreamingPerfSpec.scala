package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

/** Throughput + state-size smoke for the streaming tier — the one
  * green surface that previously carried zero perf evidence. A state
  * blowup in `dedupNearSignature` (e.g. the signature column silently
  * becoming non-evictable) or an accidental per-row recompute in the
  * CMS grid would pass every correctness spec and ship invisibly; this
  * spec fails it loudly.
  *
  * Gating stance: absolute rows/s floors are machine-dependent, so the
  * composed stateful chain (near-dup dedup -> windowed CMS grid) is
  * timed against a STATELESS reference pipeline (same volume, same
  * micro-batch cadence, same per-row hash work) in the same JVM, and
  * the gate is the RATIO. Measured band on local[4]: chain/ref
  * 5.5-6.8x warm (two state stores pay per-batch commit overhead the
  * stateless side never sees); the 10x ceiling trips on a ~1.8x
  * chain-side regression while absorbing scheduler jitter. An absolute
  * floor of 1000 rows/s (measured ~4200) backstops the pathological
  * case where BOTH sides slow (e.g. a state store leaking into every
  * task's setup path).
  */
class StreamingPerfSpec extends SparkTestBase {
  import spark.implicits._

  private val BatchRows = 4000
  private val Batches = 5
  private val RatioCeiling = 10.0
  private val FloorRowsPerSec = 1000.0

  // batch b spans event-time minutes [10b, 10b+10): each processAllAvailable
  // advances the watermark one window, so dedup state EVICTS as it goes —
  // the bounded-state shape under test
  private def batchData(b: Int): Seq[(Timestamp, String)] =
    (0 until BatchRows).map { i =>
      val t = Timestamp.valueOf(f"2024-01-01 ${b / 6}%02d:${(b % 6) * 10 + i % 10}%02d:${i % 60}%02d")
      // ~25% near-dup rate: docs repeat within a batch every 4 ids, and
      // every doc has plenty of shingles for the minhash path
      (t, s"document number ${i / 4} carries sufficiently many filler tokens for shingling")
    }

  private def timeRun(mkSink: () => (MemoryStream[(Timestamp, String)],
      org.apache.spark.sql.streaming.StreamingQuery)): (Double, org.apache.spark.sql.streaming.StreamingQuery) = {
    val (input, query) = mkSink()
    val t0 = System.nanoTime()
    try {
      (0 until Batches).foreach { b =>
        input.addData(batchData(b)): Unit
        query.processAllAvailable()
      }
      ((System.nanoTime() - t0) / 1e9, query)
    } finally query.stop()
  }

  test("streaming curation chain sustains reference-relative throughput with bounded state") {
    implicit val sqlCtx = spark.sqlContext

    def chainRun() = {
      val input = MemoryStream[(Timestamp, String)]
      val docs = input.toDF().toDF("ts", "text")
      val deduped = Streams.dedupNearSignature(docs, "ts", "text", "10 minutes")
      val grid = Streams.windowedCmsGridWatermarked(deduped, "ts", "text", "10 minutes", 4, 256)
      (input, grid.writeStream.format("memory").queryName("perf_chain")
        .outputMode(OutputMode.Append()).start())
    }
    // stateless reference: the same per-row hash work (split + md5) and
    // micro-batch cadence, no state store anywhere
    def refRun() = {
      val input = MemoryStream[(Timestamp, String)]
      val out = input.toDF().toDF("ts", "text")
        .select($"ts", md5(concat_ws("|", split($"text", " ")).cast("binary")).as("fp"))
      (input, out.writeStream.format("memory").queryName("perf_ref")
        .outputMode(OutputMode.Append()).start())
    }

    // warmup both shapes (codegen + state-store provider init), then time
    timeRun(chainRun): Unit
    timeRun(refRun): Unit
    val (chainSec, chainQuery) = timeRun(chainRun)
    val lastProgress = chainQuery.lastProgress
    val (refSec, _) = timeRun(refRun)

    val total = (BatchRows * Batches).toDouble
    val rowsPerSec = total / chainSec
    System.err.println(
      f"[stream-perf] chain ${chainSec}%.2f s (${rowsPerSec}%.0f rows/s), ref ${refSec}%.2f s, ratio ${chainSec / refSec}%.2fx")
    assert(chainSec <= refSec * RatioCeiling,
      f"streaming chain ${chainSec}%.2f s vs stateless reference ${refSec}%.2f s exceeds the ${RatioCeiling}x ceiling — throughput regression")
    assert(rowsPerSec >= FloorRowsPerSec,
      f"streaming chain throughput $rowsPerSec%.0f rows/s under the $FloorRowsPerSec%.0f floor")

    // State bounds, read from the final micro-batch's progress. The
    // dedup operator's live state must track the WATERMARK HORIZON
    // (~2 open windows of distinct signatures), not the full stream:
    // distinct sigs per window = BatchRows/4, so 3 windows' worth is
    // generous slack; >= BatchRows would mean eviction stopped.
    val ops = lastProgress.stateOperators
    assert(ops.nonEmpty, "no stateOperators in progress — chain lost its stateful operators")
    val dedupRows = ops.find(_.operatorName.contains("dedupe")).map(_.numRowsTotal)
      .getOrElse(fail(s"no dedupe state operator in ${ops.map(_.operatorName).mkString(",")}"))
    val aggRows = ops.find(_.operatorName.contains("stateStoreSave")).map(_.numRowsTotal)
      .getOrElse(fail(s"no aggregation state operator in ${ops.map(_.operatorName).mkString(",")}"))
    val distinctPerWindow = BatchRows / 4
    assert(dedupRows <= 3L * distinctPerWindow,
      s"dedup state $dedupRows rows exceeds 3 windows of distinct signatures ($distinctPerWindow/window) — state not evicting")
    // CMS state: bounded by depth x width CELLS per open window
    // regardless of key cardinality — the sketch's whole point
    assert(aggRows <= 4L * 256 * 3,
      s"CMS aggregation state $aggRows rows exceeds depth*width*3 open windows — grid state unbounded")
  }
}
