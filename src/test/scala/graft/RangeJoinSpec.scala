package graft

import java.sql.Timestamp
import graft.operators.RangeJoin

/** Grid-bucketed point-in-interval join: boundary semantics and plan shape. */
class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val intervals = Seq(
    (1L, ts("2024-01-01 00:00:00"), ts("2024-01-08 00:00:00")),  // one week
    (2L, ts("2024-01-05 00:00:00"), ts("2024-01-25 00:00:00")),  // spans 3+ buckets
    (3L, ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00"))   // empty -> matches nothing
  ).toDF("iv_id", "s", "e")

  private val points = Seq(
    (10L, ts("2024-01-01 00:00:00")),  // == start of 1 -> inclusive
    (11L, ts("2024-01-08 00:00:00")),  // == end of 1 -> exclusive; inside 2
    (12L, ts("2024-01-20 12:00:00")),  // inside 2 only (bucket 3 of its span)
    (13L, ts("2024-02-15 00:00:00")),  // matches nothing
    (14L, ts("2024-01-06 00:00:00"))   // inside 1 AND 2
  ).toDF("pt_id", "p")

  test("pointInInterval: inclusive start, exclusive end, multi-bucket spans") {
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", bucketDays = 7)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 1L), (11L, 2L), (12L, 2L), (14L, 1L), (14L, 2L)), s"got $out")
  }

  test("pointInInterval joins on the bucket equality, not a nested loop") {
    val out = RangeJoin.pointInInterval(points, "p", intervals, "s", "e", bucketDays = 7)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$plan")
  }
}
