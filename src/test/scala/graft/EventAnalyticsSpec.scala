package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions.lit
import graft.operators.EventAnalytics

/** Cross-timeline event analytics: ordered funnels and cohort
  * retention on crafted event logs.
  */
class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: A then B then B again (full 3-step completion)
  // user 2: B before A, then nothing after A — reaches step 1 only
  // user 3: A then B, no second B — reaches step 2
  // user 4: B only — never enters the funnel
  private val log = Seq(
    (1L, "A", ts("2024-01-01 10:00:00")),
    (1L, "B", ts("2024-01-01 11:00:00")),
    (1L, "B", ts("2024-01-01 12:00:00")),
    (2L, "B", ts("2024-01-01 09:00:00")),
    (2L, "A", ts("2024-01-01 10:00:00")),
    (3L, "A", ts("2024-01-02 10:00:00")),
    (3L, "B", ts("2024-01-03 10:00:00")),
    (4L, "B", ts("2024-01-01 10:00:00"))
  ).toDF("user_id", "event_type", "ts")

  test("funnel counts ordered completions, strictly after the prior step") {
    val got = EventAnalytics.funnel(log, "user_id", "event_type", "ts", Seq("A", "B", "B"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet
    // step 1: users 1,2,3 did A; step 2: 1 and 3 did B after A (user
    // 2's B was BEFORE A); step 3: only user 1 repeated B
    assert(got == Set((1, "A", 3L), (2, "B", 2L), (3, "B", 1L)), s"got $got")
  }

  test("funnel ignores same-instant events (strict ordering)") {
    val tied = Seq(
      (9L, "A", ts("2024-01-01 10:00:00")),
      (9L, "B", ts("2024-01-01 10:00:00"))).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(tied, "user_id", "event_type", "ts", Seq("A", "B"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == Map(1 -> 1L, 2 -> 0L), s"got $got")
  }

  test("windowed funnel drops chains whose stage gap exceeds the window") {
    // user 3's A -> B gap is a full day; a 1-hour window must cut it,
    // while user 1's 1-hour gaps survive exactly at the bound
    val got = EventAnalytics.funnel(log, "user_id", "event_type", "ts",
      Seq("A", "B", "B"), withinSeconds = Some(3600L))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == Map(1 -> 3L, 2 -> 1L, 3 -> 1L), s"got $got")
  }

  test("windowed funnel finds sequences greedy-earliest would miss") {
    // user 9 does A at 10:00 and again at 11:00, then B at 11:30 with a
    // 60-minute window: chaining from the EARLIEST A (10:00) strands B
    // outside the window, but the 11:00 A converts — the reachable-set
    // semantics must count the user
    val ev = Seq(
      (9L, "A", ts("2024-01-01 10:00:00")),
      (9L, "A", ts("2024-01-01 11:00:00")),
      (9L, "B", ts("2024-01-01 11:30:00"))).toDF("user_id", "event_type", "ts")
    val got = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
      Seq("A", "B"), withinSeconds = Some(3600L))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == Map(1 -> 1L, 2 -> 1L), s"greedy-min would report step 2 = 0: $got")
  }

  test("NULL users count at stage 1 but never advance, in BOTH regimes") {
    // a NULL user's A then B must not chain: the unbounded path's
    // equi-join never matches NULL, and the windowed path must agree
    // (its per-user window would otherwise pool all NULL users into
    // one partition and chain them off each other)
    val ev = Seq(
      (Option.empty[Long], "A", ts("2024-01-01 10:00:00")),
      (Option.empty[Long], "B", ts("2024-01-01 10:30:00")),
      (Some(1L), "A", ts("2024-01-01 10:00:00")),
      (Some(1L), "B", ts("2024-01-01 10:30:00"))).toDF("user_id", "event_type", "ts")
    for (w <- Seq(None, Some(3600L))) {
      val got = EventAnalytics.funnel(ev, "user_id", "event_type", "ts",
        Seq("A", "B"), withinSeconds = w)
        .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
      assert(got == Map(1 -> 2L, 2 -> 1L), s"window=$w got $got")
    }
  }

  test("funnel tolerates events relations that already have columns named u and t") {
    val clash = log.withColumn("u", lit("collide")).withColumn("t", lit(0L))
    val got = EventAnalytics.funnel(clash, "user_id", "event_type", "ts", Seq("A", "B"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got == Map(1 -> 3L, 2 -> 2L), s"got $got")
  }

  test("sessionize numbers sessions per user on the gap, ties broken by event id") {
    val ev = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")), // u1 session 1
      (11L, 1L, ts("2024-01-01 10:20:00")), // within 30 min -> session 1
      (12L, 1L, ts("2024-01-01 11:00:00")), // 40 min gap -> session 2
      (13L, 2L, ts("2024-01-01 10:00:00")), // u2 session 1
      (14L, 2L, ts("2024-01-01 10:00:00"))  // same instant: gap 0 -> session 1
    ).toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.sessionize(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(10L -> 1L, 11L -> 1L, 12L -> 2L, 13L -> 1L, 14L -> 1L), s"got $got")
  }

  test("sessionStats rolls events up to per-session counts and exact micro spans") {
    val ev = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 10:20:00")),
      (12L, 1L, ts("2024-01-01 11:00:00")), // 40-min gap -> new session
      (13L, 2L, ts("2024-01-01 10:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = EventAnalytics.sessionStats(ev, "user_id", "ts", "event_id", gapSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got == Map(
      (1L, 1L) -> ((2L, 1200L * 1000000L)), // 10:00-10:20 span
      (1L, 2L) -> ((1L, 0L)),               // single-event session spans 0
      (2L, 1L) -> ((1L, 0L))), s"got $got")
  }

  test("funnelTiming sums the exact stage-to-stage gaps of the greedy completions") {
    val got = EventAnalytics.funnelTiming(log, "user_id", "event_type", "ts",
      Seq("A", "B", "B"))
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3))).toSet
    // stage 2: user 1 (1 h after A) + user 3 (24 h after A); stage 3:
    // user 1's second B, 1 h after the first
    assert(got == Set(
      (2, 2L, (3600L + 86400L) * 1000000L),
      (3, 1L, 3600L * 1000000L)), s"got $got")
  }

  test("cohortRetention buckets users by first active date with day offsets") {
    val got = EventAnalytics.cohortRetention(log, "user_id", "ts")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    // users 1,2,4 start 2024-01-01 and are active only that day;
    // user 3 starts 2024-01-02, active day 0 and day 1
    assert(got == Map(
      ("2024-01-01", 0) -> 3L,
      ("2024-01-02", 0) -> 1L,
      ("2024-01-02", 1) -> 1L), s"got $got")
  }
}
