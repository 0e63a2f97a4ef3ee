package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The PUBLIC deployment-lifecycle surface over the three segmented
  * index families ([[Retrieval]] BM25, [[Similarity]] IVF-PQ,
  * [[SideIndex]]): an atomic SERVE POINTER plus reachability-aware
  * generation GC. Every maintain round publishes under a fresh root
  * and carries prior generations' segments by reference, which leaves
  * two operational gaps this object closes:
  *
  *  1. consumers need a published "current" location — a one-line
  *     pointer file flipped atomically (readers see yesterday's root
  *     or today's, never a torn write), so a scheduler's handoff is
  *     `maintain → publish(pointer, newRoot)` and every serve path
  *     resolves `read(pointer)`;
  *  2. superseded roots accumulate forever, and deleting one by hand
  *     can sever segments the CURRENT index still lists — [[vacuum]]
  *     computes the reachable directory set from the pointer's own
  *     handle and deletes ONLY fully-unreachable retired roots,
  *     refusing loudly otherwise.
  *
  * A pointer is PER-TIER; a reader needing a consistent CROSS-tier
  * view resolves a [[DeploymentSnapshot]] instead (one atomic rename
  * naming every tier's root — what [[Nightly]] publishes behind its
  * gate).
  *
  * The lifecycle is SINGLE-WRITER per pointer — one maintenance
  * scheduler owns publish / rollback / vacuum / retain — and a
  * violation REFUSES loudly instead of losing an update: a fencing
  * epoch beside the pointer (`<pointer>.epoch`) is read at entry and
  * check-and-bumped at each operation's commit point through an
  * exclusive file create, so of two racers exactly one commits and
  * the other refuses having changed nothing — e.g. a vacuum whose
  * pointer read a racing publish stalled-out refuses before its first
  * delete. This is fencing, not a lock: it serializes commit
  * decisions, not execution spans (an operation entering AFTER a
  * vacuum's commit can overlap its in-flight deletes), so it exists
  * to catch misconfiguration, not to make concurrent schedulers
  * safe. Readers need no fence — the pointer rename is atomic either
  * way.
  *
  * Reference counterpart: none — ironbeam's runs are ephemeral; this
  * is the durable-index lifecycle a 100 TB always-on deployment needs,
  * the same stance as the LSM tiers themselves (a lakehouse-table
  * commonplace: Delta/Iceberg's snapshot pointer + expire/vacuum, and
  * the fencing-token stance of single-writer log stores).
  */
object ServePointer {

  /** The pointer's fencing epoch — 0 before any lifecycle operation
    * ever committed; every committed publish / rollback / vacuum /
    * retain bumps it by one. Observability surface: a scheduler can
    * log it per round, and a gap of more than one per round means
    * another writer is violating the single-writer contract.
    */
  def epoch(spark: SparkSession, pointerPath: String): Long =
    IndexManifest.readEpoch(spark, pointerPath)

  /** Test seam: interleave an action at the fence's commit point (see
    * IndexManifest.onFenceCheck) — the only way a deterministic spec
    * can race two lifecycle operations. Production never sets it.
    */
  private[graft] def setFenceCheckHook(f: String => Unit): Unit =
    IndexManifest.onFenceCheck = f

  /** Test seam: interleave an action INSIDE the fence — between its
    * epoch read and its exclusive-create commit (see
    * IndexManifest.onFenceCommit). Production never sets it.
    */
  private[graft] def setFenceCommitHook(f: String => Unit): Unit =
    IndexManifest.onFenceCommit = f

  /** Atomically flip the pointer at `pointerPath` to `indexRoot`,
    * refusing a target that cannot serve (missing manifest, severed
    * carried generation). `what` names the index family in errors.
    */
  def publish(
      spark: SparkSession, pointerPath: String, indexRoot: String,
      what: String = "segmented"): Unit =
    IndexManifest.publishPointer(spark, pointerPath, indexRoot, what)

  /** The index root the pointer currently serves — compose with the
    * tier's own read entry point (e.g. `SideIndex.read(spark,
    * ServePointer.read(spark, ptr), ...)`). Refuses when no pointer
    * was ever published.
    */
  def read(spark: SparkSession, pointerPath: String): String =
    IndexManifest.readPointer(spark, pointerPath)

  /** Delete retired maintenance roots that hold NOTHING the pointer's
    * current index reaches (root, segments, tombstones — carried
    * references included). A root still referenced refuses loudly
    * (compact first); an already-absent root is a no-op (crash-safe
    * re-runs). Returns (root, n_files_deleted, bytes_deleted) per
    * retired root.
    */
  def vacuum(
      spark: SparkSession, pointerPath: String, retiredRoots: Seq[String],
      what: String = "segmented"): DataFrame =
    IndexManifest.vacuum(spark, pointerPath, retiredRoots, what)

  /** The pointer's generation history: the distinct roots it
    * previously served, oldest first, current excluded — what
    * [[rollback]] rolls back onto and [[retain]] retires. Maintained
    * automatically by [[publish]] in `<pointerPath>.history`.
    */
  def history(spark: SparkSession, pointerPath: String): Seq[String] =
    IndexManifest.readHistory(spark, pointerPath)

  /** Flip the pointer back onto the most recent previous generation —
    * the bad-round escape hatch for regressions the audit gate cannot
    * see (a ranking regression, a bad codebook). The abandoned root
    * moves into the history (roll forward by re-publishing it, or let
    * the next [[retain]] round vacuum it); refuses when no previous
    * generation survives. Returns the root now serving.
    */
  def rollback(spark: SparkSession, pointerPath: String, what: String = "segmented"): String =
    IndexManifest.rollbackPointer(spark, pointerPath, what)

  /** Retention-policy GC over the pointer's own history: keep the
    * `keep` most recent superseded generations as a rollback window,
    * HOLD older entries that anything surviving still carries by
    * reference (the normal LSM state between compactions — held
    * entries fall out on a later round once compaction re-homes the
    * data), and [[vacuum]] the rest. Re-running after a crash heals
    * (absent retired roots report `absent` and drop). Returns one row
    * per history entry outside the window: (root, status = vacuumed |
    * held | absent, n_files_deleted, bytes_deleted).
    *
    * `pinned` names roots something OUTSIDE this pointer's lifecycle
    * still serves (a published [[DeploymentSnapshot]]'s root for the
    * round replacing it): they survive this round regardless of the
    * keep window — the reader-grace pinning [[Nightly]] applies.
    */
  def retain(
      spark: SparkSession, pointerPath: String, keep: Int,
      what: String = "segmented", pinned: Seq[String] = Nil): DataFrame =
    IndexManifest.retainGenerations(spark, pointerPath, keep, what, pinned)
}
