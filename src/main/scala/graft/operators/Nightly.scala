package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The NIGHTLY all-tier maintenance round, audit-gated — the
  * composition a multi-index deployment actually schedules: every
  * index family's maintain round runs from ONE churned registry, the
  * cross-tier [[IndexAudit]] reconciles what each new generation
  * believes is live against that registry, and ONLY a fully-consistent
  * round flips the serve pointers (and lets the release tier publish).
  * A tier that slipped the round — a lost tombstone, a dropped
  * increment — leaves EVERY pointer on yesterday's generation: a
  * mixed swap would serve a document from one tier and not another,
  * the inconsistency class nothing inside a single tier can see.
  *
  * Tiers plug in as [[Nightly.Tier]] values (name, tonight's expected
  * id roster, the maintain round, the live-id reader, the pointer to
  * flip) so the three index families — and any future one speaking
  * the manifest protocol — compose without this object knowing their
  * table shapes. The release tier rides behind the gate as an optional
  * closure: it publishes IN PLACE under its own drift gate
  * ([[Curation.maintainRelease]]), so it must not run at all when the
  * index tiers' round is refused.
  *
  * Cost shape: the maintain rounds are the tiers' own O(delta) paths;
  * the audit is one narrow full-outer id join per tier; the verdict is
  * a tiers-count driver collect. A refused round leaves tonight's
  * (valid, unserved) generations on disk for diagnosis — fix the tier,
  * re-run, and [[ServePointer.vacuum]] the abandoned roots afterwards.
  *
  * Reference counterpart: none (ironbeam runs are ephemeral) — this is
  * the scheduler composition over the repo's own index lifecycle, the
  * same stance as [[ServePointer]].
  */
object Nightly {

  /** One index family's hookup into the nightly round.
    *
    * @param name      tier label in the report (and pointer errors)
    * @param registry  tonight's EXPECTED id roster (one id column —
    *                  what the tier must serve after its round)
    * @param idCol     the registry's id column
    * @param pointerPath  the tier's serve pointer, flipped only when
    *                  the WHOLE round audits clean
    * @param maintain  the tier's maintenance round (its own
    *                  maintainIndex / maintainPqIndex / maintain call
    *                  under a fresh outRoot), returning the new root
    * @param liveIds   the tier's one-column live-id relation at a
    *                  given root (e.g. `Retrieval.liveDocIds`)
    */
  final case class Tier(
      name: String,
      registry: DataFrame,
      idCol: String,
      pointerPath: String,
      maintain: () => String,
      liveIds: String => DataFrame)

  /** Run the round: maintain every tier, audit all of them, then —
    * only if every tier reports `in_sync = 1` — flip every pointer and
    * run the optional release round. Returns (report, releaseReport):
    * the report is one row per tier, the audit columns plus
    * `published` (the ROUND verdict — true on every row or false on
    * every row, the [[Curation.maintainRelease]] report convention);
    * releaseReport is the release closure's own report when it ran,
    * None when the gate refused or no release was supplied.
    */
  def run(
      spark: SparkSession,
      tiers: Seq[Tier],
      release: Option[() => DataFrame] = None,
      keepGenerations: Option[Int] = None): (DataFrame, Option[DataFrame]) = {
    require(tiers.nonEmpty, "Nightly.run: no tiers to maintain")
    require(tiers.map(_.name).distinct.size == tiers.size,
      s"Nightly.run: duplicate tier names in ${tiers.map(_.name).mkString(", ")}")
    // 1. every maintain round completes BEFORE anything is judged:
    // each publishes valid (manifest-committed) generations that
    // nothing serves until the swap, so a mid-round crash leaves
    // yesterday's pointers intact by construction
    val newRoots = tiers.map(t => t -> t.maintain())
    // 2. the cross-tier audit — per-tier registries (the families key
    // by different ids), one narrow full-outer join each
    val auditRows = newRoots.map { case (t, root) =>
      IndexAudit.audit(t.registry, t.idCol, Seq(t.name -> t.liveIds(root)))
    }.reduce(_.unionByName(_))
      .collect() // bounded: one row per tier
    val inSync = auditRows.forall(_.getAs[Long]("in_sync") == 1L)
    // 3. all-or-nothing: the pointer swap and the release publish both
    // sit behind the gate — a partial swap is the failure mode this
    // composition exists to prevent. The swap loop itself can fail
    // midway (a transient FS error on one tier's rename), which would
    // otherwise leave tonight's generation serving on some tiers and
    // yesterday's on the rest: on any failure, best-effort re-publish
    // the PRE-ROUND pointer value (or delete a pointer that did not
    // exist before) on every tier already flipped, then rethrow —
    // the round refuses loudly from a consistent state. A release
    // failure AFTER the swap does not roll back: the index tiers are
    // consistent among themselves, and the release tier's own gate
    // left yesterday's release serving.
    val releaseReport =
      if (!inSync) None
      else {
        val prev = tiers.map { t =>
          t -> (try Some(IndexManifest.readPointer(spark, t.pointerPath))
            catch { case _: IllegalArgumentException => None })
        }.toMap
        val flipped = scala.collection.mutable.ArrayBuffer.empty[Tier]
        try {
          newRoots.foreach { case (t, root) =>
            ServePointer.publish(spark, t.pointerPath, root, t.name)
            flipped += t
          }
        } catch {
          case e: Throwable =>
            flipped.foreach { t =>
              try {
                prev(t) match {
                  case Some(old) => ServePointer.publish(spark, t.pointerPath, old, t.name)
                  case None =>
                    val p = new org.apache.hadoop.fs.Path(t.pointerPath)
                    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
                      .delete(p, false): Unit
                }
              } catch { case _: Throwable => () } // best effort; rethrow the cause
            }
            throw e
        }
        val rel = release.map(_.apply())
        // retention runs LAST, only on a fully-swapped round: keep the
        // `keep` most recent superseded generations per tier as a
        // rollback window and vacuum older ones through the pointer's
        // own history ([[ServePointer.retain]] — reachability-aware,
        // so a generation tonight's index still carries by reference
        // refuses and stays). A retention failure propagates AFTER the
        // swap and release completed: the round is consistent, disk
        // just holds more than the window — re-run retain to heal.
        keepGenerations.foreach { keep =>
          tiers.foreach(t => ServePointer.retain(spark, t.pointerPath, keep, t.name): Unit)
        }
        rel
      }
    import spark.implicits._
    val report = auditRows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), inSync))
      .toDF("tier", "n_live", "n_missing", "n_orphaned", "n_dup_pairs", "in_sync",
        "published")
    (report, releaseReport)
  }
}
