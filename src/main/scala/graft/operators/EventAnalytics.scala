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
    * later). Each stage is one aggregate over the events restricted to
    * that stage's type, joined to the previous stage's per-user
    * completion time — k-1 user-keyed joins for a k-step funnel, all
    * hash-partitioned on the user, never a per-user event sort. Each
    * stage's per-user completion relation goes through a reliable
    * checkpoint (the [[Dedup.duplicateClusters]] machinery): without
    * it every later stage — and every stage-count branch of the final
    * union — would re-execute the whole prefix chain, turning a k-step
    * funnel into O(k^2) event scans.
    * Output: (step, event_type, n_users), one row per step.
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.nonEmpty, "funnel: no steps")
    var reached = Dedup.reliableCheckpoint(
      events.where(col(typeCol) === steps.head)
        .groupBy(col(userCol).as("u"))
        .agg(min(col(tsCol)).as("t")))
    val stageCounts = Seq.newBuilder[DataFrame]
    stageCounts += reached.agg(count(lit(1)).as("n_users"))
      .select(lit(1).as("step"), lit(steps.head).as("event_type"), col("n_users"))
    steps.zipWithIndex.drop(1).foreach { case (s, i) =>
      reached = Dedup.reliableCheckpoint(
        events.where(col(typeCol) === s)
          .join(reached, col(userCol) === col("u"))
          .where(col(tsCol) > col("t"))
          .groupBy(col("u"))
          .agg(min(col(tsCol)).as("t")))
      stageCounts += reached.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(s).as("event_type"), col("n_users"))
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
      sum(isNew).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)).as("session_seq"))
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
