package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence event analytics — the funnel and cohort-retention
  * queries every product-analytics workload runs over an event log,
  * expressed as relational chains (no per-user sorted re-processing):
  * the reference's windowing tier aggregates WITHIN time buckets; these
  * operators reason ACROSS a user's whole timeline.
  */
object EventAnalytics {

  /** Ordered funnel: how many users completed steps(0), then steps(1)
    * STRICTLY AFTER it, then steps(2) after that, ... Repeating a step
    * name means "did it again" (a second qualifying event strictly
    * later). With `withinSeconds` set, step k must additionally land
    * within that many seconds of the step k-1 completion it chains
    * from (the conversion window every product funnel constrains by);
    * gaps compare in integer MICROSECONDS, the cross-engine domain.
    *
    * Two per-stage state shapes, chosen by the window:
    *  - Unbounded: the per-user MIN completion time. Greedy-earliest is
    *    provably optimal here — an earlier completion can only admit a
    *    superset of later-stage events — so one user-keyed min
    *    aggregate per stage suffices.
    *  - Windowed: greedy-earliest is WRONG (the earliest stage-k event
    *    may strand stage k+1 outside its window while a later one
    *    chains fine), so each stage carries ALL reachable completion
    *    times: the distinct (user, t) of stage-k events for which SOME
    *    reachable stage-(k-1) time r satisfies r < t <= r + window.
    *    That relation is bounded by the stage's own event count — the
    *    same order as the min relation in practice — and makes the
    *    funnel exact (a user converts iff ANY qualifying sequence
    *    exists), not an approximation tied to one greedy path. The
    *    exists test is NOT a join (a per-user events-x-reachable join
    *    is quadratic in a power user's event count): because any
    *    qualifying r is dominated by the LATEST reachable time
    *    strictly before the event, each stage is a tagged UNION of the
    *    stage events with the reachable set, one per-user sort window
    *    carrying that running latest, and a range test — per-user
    *    O(n log n), the sessionization cost shape.
    *
    * Unbounded stages are one user-keyed join + aggregate each —
    * hash-partitioned on the user, never a per-user event sort;
    * windowed stages pay the per-user window sort instead of a join.
    * Each stage's relation goes through a reliable checkpoint (the
    * [[Dedup.duplicateClusters]] machinery): without it every later
    * stage — and every stage-count branch of the final union — would
    * re-execute the whole prefix chain, turning a k-step funnel into
    * O(k^2) event scans. Internal join columns use collision-proof
    * names, so an events relation that already has columns named
    * `u`/`t` funnels correctly.
    * Output: (step, event_type, n_users), one row per step.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      withinSeconds: Option[Long] = None
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    withinSeconds.foreach(w => require(w > 0, s"funnel: window must be > 0 s, got $w"))
    val u = "__funnel_u"
    val t = "__funnel_t"
    def collapse(stage: DataFrame): DataFrame = withinSeconds match {
      case None    => stage.groupBy(col(u)).agg(min(col(t)).as(t))
      case Some(_) => stage.select(col(u), col(t)).distinct()
    }
    // each stage's relation is PERSISTED (lazily), not eagerly
    // checkpointed: the guarantee needed is compute-once — every later
    // stage and every stage-count branch of the final union references
    // it, and without a materialization point a k-step funnel re-scans
    // the whole prefix chain O(k^2) times. A lazy MEMORY_AND_DISK cache
    // gives exactly that (the final action computes each stage once and
    // every other branch reads the cache) WITHOUT paying k eager
    // checkpoint write-jobs before the query even runs — measured ~0.3 s
    // of fixed job cost per stage at sf0.1 — and, unlike a checkpoint,
    // keeps the lineage for recompute on executor loss. k is small and
    // fixed, so the uncut plan depth is bounded.
    var reached = persistStage(collapse(
      events.where(col(typeCol) === steps.head)
        .select(col(userCol).as(u), col(tsCol).as(t))))
    // distinct-then-count, NOT countDistinct: a NULL user forms a group
    // like any other in both regimes (the groupBy/min path always kept
    // it), and countDistinct would silently drop it
    def stageCount(step: Int, name: String): DataFrame =
      reached.select(col(u)).distinct().agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("event_type"), col("n_users"))
    val stageCounts = Seq.newBuilder[DataFrame]
    stageCounts += stageCount(1, steps.head)
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val stageEvents = events.where(col(typeCol) === s)
        .select(col(userCol).as(u), col(tsCol).as(t))
      val next = withinSeconds match {
        case None =>
          advanceStage(stageEvents, reached, u, t).select(col(u), col(t))
        case Some(w) =>
          // tagged union + per-user sort: an event chains iff the
          // LATEST reachable time strictly before it (ties sort the
          // reachable row after the event, so same-instant never
          // chains) is within the window — any qualifying time is
          // dominated by the latest one, so the running max over the
          // union replaces the quadratic events-x-reachable join.
          // NULL users are filtered from BOTH union branches: the
          // window's partitionBy would group all NULL users into one
          // partition and chain them off each other, whereas the
          // unbounded path's equi-join never matches a NULL — stages
          // >= 2 must agree across regimes (NULLs still count at
          // stage 1, where both regimes keep them)
          val tagged = stageEvents
            .where(col(u).isNotNull)
            .select(col(u), unix_micros(col(t)).as("__funnel_us"),
              col(t), lit(false).as("__funnel_is_prev"))
            .unionByName(reached.where(col(u).isNotNull)
              .select(col(u), unix_micros(col(t)).as("__funnel_us"),
                col(t), lit(true).as("__funnel_is_prev")))
          val win = org.apache.spark.sql.expressions.Window
            .partitionBy(col(u))
            .orderBy(col("__funnel_us"), col("__funnel_is_prev"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
              org.apache.spark.sql.expressions.Window.currentRow)
          tagged
            .withColumn("__funnel_last_prev",
              max(when(col("__funnel_is_prev"), col("__funnel_us"))).over(win))
            .where(!col("__funnel_is_prev")
              && col("__funnel_last_prev").isNotNull
              && col("__funnel_us") > col("__funnel_last_prev")
              && col("__funnel_us") - col("__funnel_last_prev") <= w * 1000000L)
            .select(col(u), col(t))
      }
      reached = persistStage(collapse(next))
      stageCounts += stageCount(i + 1, s)
    }
    stageCounts.result().reduce(_ unionByName _)
  }

  /** Gap-based sessionization: assign every event its user's session
    * SEQUENCE NUMBER (1-based), where a new session starts whenever the
    * gap to the user's previous event exceeds `gapSeconds`. One window
    * over (user, event-time) — partitioned per user, so no global sort
    * — with the tie broken on the event id to keep same-instant events
    * deterministic, and the running session count taken over an
    * explicit ROWS frame (a RANGE frame would merge ties). Timestamps
    * compare in integer microseconds, the exact cross-engine domain.
    * Output: (idCol, userCol, session_seq).
    */
  def sessionize(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long
  ): DataFrame =
    sessioned(events, userCol, tsCol, idCol, gapSeconds)
      .select(col(idCol), col(userCol), col("session_seq"))

  /** The shared sessionization core: every event with its integer-
    * microsecond time and its session sequence number. One per-user
    * window, no global sort (see [[sessionize]] for the frame/tiebreak
    * rationale).
    */
  private def sessioned(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(unix_micros(col(tsCol)), col(idCol))
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isNew = when(
      prev.isNull || unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L,
      lit(1L)).otherwise(lit(0L))
    events.select(
      col(idCol), col(userCol),
      unix_micros(col(tsCol)).as("__evt_us"),
      sum(isNew).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)).as("session_seq"))
  }

  /** Per-session rollup over [[sessionize]]'s assignment: event count
    * and wall-clock span (last event minus first, exact integer
    * MICROSECONDS — a single-event session spans 0). The rollup is one
    * hash aggregate over the sessionized stream, already partitioned by
    * user from the window — engagement-length distributions, bot
    * detection (thousand-event sessions), and session-level sampling
    * all start here. Output: (userCol, session_seq, n_events,
    * duration_us).
    */
  def sessionStats(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      gapSeconds: Long
  ): DataFrame =
    sessioned(events, userCol, tsCol, idCol, gapSeconds)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col("__evt_us")) - min(col("__evt_us"))).as("duration_us"))

  /** One unbounded (min-greedy) stage advance, shared by [[funnel]]
    * and [[funnelTiming]] so the two can never drift apart: users in
    * `reached` (u, t) with a stage event STRICTLY after their
    * completion time, each with their new min completion and the
    * chained-from time in integer micros (constant per user after the
    * equi-join, so the min just carries it through). NULL users never
    * advance — the equi-join drops them, in both engines.
    * Output: (u, t, __funnel_prev_us), one row per advancing user.
    */
  /** Lazy spill-safe cache for a funnel stage relation (see funnel()'s
    * rationale). The session's cache manager owns the lifetime — stage
    * relations are stage-user-count-sized, and the caller's action is
    * the materialization point.
    *
    * CACHE-LIFETIME CONTRACT (the public funnel APIs inherit it): the
    * returned plan is lazy, so the stage caches cannot be released
    * inside the operator without recomputing every stage per action —
    * an r22 variant that collected the k-row result eagerly and
    * unpersisted in a finally was measured 2.2-2.7x slower across the
    * funnel family precisely because repeated invocations lost the
    * shared stage caches. Callers that invoke funnels repeatedly in a
    * long-lived session own the release: identical stage plans re-hit
    * the same cache entries (cheap, the intended steady state), and a
    * session-level `spark.sharedState.cacheManager.clearCache()` (or
    * unpersisting the returned relations' sources) reclaims the memory
    * when a workload retires.
    */
  private def persistStage(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private def advanceStage(
      stageEvents: DataFrame, reached: DataFrame, u: String, t: String): DataFrame =
    stageEvents
      .join(reached.select(col(u), col(t).as("__funnel_prev")), Seq(u))
      .where(col(t) > col("__funnel_prev"))
      .groupBy(col(u))
      .agg(
        min(col(t)).as(t),
        min(unix_micros(col("__funnel_prev"))).as("__funnel_prev_us"))

  /** Stage-to-stage conversion latency for the (unbounded) min-greedy
    * funnel: for each stage 2..k, how many users converted and the SUM
    * of their stage-(k-1) -> stage-k gaps in exact integer MICROSECONDS
    * (avg = total_gap_us / n_users, derived by the caller — an exact
    * long sum stays bit-reproducible across engines where a pre-divided
    * double average would not). Greedy-earliest completion times are
    * the same per-user instants [[funnel]] counts, so `n_users` here
    * always agrees with the unbounded funnel's stage counts. Same
    * relational shape as [[funnel]]: one user-keyed join + aggregate
    * per stage, reliable checkpoints killing the O(k^2) prefix re-scan.
    * Output: (step, event_type, n_users, total_gap_us) for steps 2..k.
    */
  def funnelTiming(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.length >= 2, "funnelTiming: need at least 2 steps")
    val u = "__funnel_u"
    val t = "__funnel_t"
    // lazy per-stage persist, not eager checkpoints — the funnel()
    // rationale: compute-once across later stages and count branches,
    // no per-stage write-job, lineage kept
    var reached = persistStage(
      events.where(col(typeCol) === steps.head)
        .groupBy(col(userCol).as(u))
        .agg(min(col(tsCol)).as(t)))
    val rows = Seq.newBuilder[DataFrame]
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      val stageEvents = events.where(col(typeCol) === s)
        .select(col(userCol).as(u), col(tsCol).as(t))
      val next = persistStage(advanceStage(stageEvents, reached, u, t))
      rows += next.agg(
        count(lit(1)).as("n_users"),
        coalesce(sum(unix_micros(col(t)) - col("__funnel_prev_us")), lit(0L))
          .as("total_gap_us"))
        .select(lit(i + 1).as("step"), lit(s).as("event_type"),
          col("n_users"), col("total_gap_us"))
      reached = next.select(col(u), col(t))
    }
    rows.result().reduce(_ unionByName _)
  }

  /** Day-granularity cohort retention: users cohort by their FIRST
    * active date; each (cohort date, day offset) cell counts the
    * cohort's users active that many days later. Activity collapses to
    * distinct (user, date) BEFORE anything else — the relation every
    * later stage touches is bounded by users x active-days, not raw
    * events. Output: (cohort_date 'yyyy-MM-dd', offset_days, n_users).
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val activeDays = events
      .select(col(userCol).as("u"), to_date(col(tsCol)).as("d"))
      .distinct()
    val cohorts = activeDays.groupBy("u").agg(min("d").as("c"))
    activeDays.join(cohorts, "u")
      .groupBy(col("c"), datediff(col("d"), col("c")).as("offset_days"))
      .agg(count(lit(1)).as("n_users"))
      .select(
        date_format(col("c"), "yyyy-MM-dd").as("cohort_date"),
        col("offset_days"), col("n_users"))
  }
}
