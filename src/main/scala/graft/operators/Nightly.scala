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
  * Two hardenings close the gaps the gate alone cannot: a tier with
  * content-hash hookups ([[Tier.hashCol]]/[[Tier.liveHashes]]) audits
  * through [[IndexAudit.auditContent]], so a STALE payload — right id,
  * bytes that predate tonight's registry — refuses the swap exactly
  * like a lost tombstone; and with `markerPath` set the swap itself is
  * CRASH-ATOMIC: the round's intent lands on disk before the first
  * flip and [[recover]] rolls a killed-mid-swap round forward on the
  * next run, so mixed pointers cannot outlive one scheduling cycle.
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
    * @param hashCol   optional registry column carrying tonight's
    *                  EXPECTED content hash per id — supply together
    *                  with `liveHashes` to upgrade this tier's audit
    *                  to [[IndexAudit.auditContent]]: a stale payload
    *                  (right id, wrong bytes — a re-add whose
    *                  fingerprint was never refreshed) then refuses
    *                  the swap exactly like a lost tombstone, the
    *                  class the id-set audit cannot see
    * @param liveHashes  the tier's (id, content_hash) live relation at
    *                  a given root (e.g. `Retrieval.liveDocHashes`,
    *                  `Similarity.livePqHashes`)
    */
  final case class Tier(
      name: String,
      registry: DataFrame,
      idCol: String,
      pointerPath: String,
      maintain: () => String,
      liveIds: String => DataFrame,
      hashCol: Option[String] = None,
      liveHashes: Option[String => DataFrame] = None)

  // ==================== crash-atomic swap marker ====================

  /** The all-or-nothing pointer swap survives an in-process EXCEPTION
    * (the rollback path in [[run]]) but a process CRASH between two
    * tiers' flips would otherwise leave tier A on tonight and tier B
    * on yesterday — the exact mixed state the gate exists to prevent,
    * healed by nothing. The ROUND MARKER closes it: immediately before
    * the first flip, [[run]] writes the round's full intent — one
    * `(tier, pointerPath, newRoot)` line per tier, through the same
    * atomic-rename write as the pointers themselves — and deletes it
    * once the swap completed (or was rolled back). A surviving marker
    * therefore means a crash INSIDE the swap window, and because the
    * marker is only ever written AFTER the audit gate passed, the heal
    * direction is unambiguous: ROLL FORWARD. [[recover]] re-applies
    * every entry whose pointer is not already on its intended root,
    * then clears the marker; [[run]] invokes it at entry, so the next
    * scheduled night heals before maintaining on top of a mixed state.
    * Same classification stance as the ingest round's batchId-keyed
    * residue (IndexManifest.ingestRound): evidence on disk, not
    * in-memory state, decides the replay.
    */
  /** Marker lines are `(tier, pointerPath, newRoot, prevRoot)` —
    * `prevRoot` is the pointer value the round read before flipping
    * (empty when the pointer did not exist yet). The PREV value is
    * what lets [[recover]] separate every healable own-round state
    * from a FOREIGN write that arrived between the crash and the next
    * run: a tier still (or restored back) on `prevRoot` is safe to
    * roll forward — that covers never-flipped, crashed-inside-the-flip
    * -window, and flipped-then-restored-by-the-rollback-path alike —
    * while a pointer on ANY other root means another lifecycle
    * operation acted since, and rolling forward would clobber it.
    */
  /** The marker format's delimiter rule, checked at [[run]] ENTRY
    * (before any maintain spends hours) and again here at the write: a
    * tier name / path carrying a tab or newline would write a marker
    * [[readMarker]] rejects as malformed — and that would only surface
    * in [[recover]] after a crash, the one moment the marker is
    * needed, wedging the nightly until manual cleanup. Same refusal
    * [[DeploymentSnapshot.publish]] applies to its own format.
    */
  private[graft] def requireMarkerSafe(field: String, value: String): Unit =
    require(!value.exists(c => c == '\t' || c == '\n' || c == '\r') &&
      !value.startsWith("!"),
      s"Nightly: $field '$value' may not contain tabs or newlines (the round " +
        "marker format's delimiters) or a leading '!' (the format's header sigil)")

  private[graft] def writeMarker(
      spark: SparkSession, markerPath: String,
      entries: Seq[(String, String, String, String)],
      snapshot: Option[String] = None): Unit = {
    snapshot.foreach(requireMarkerSafe("snapshot path", _))
    entries.foreach { case (n, p, r, prev) =>
      requireMarkerSafe("tier name", n)
      requireMarkerSafe("pointer path", p)
      requireMarkerSafe("root", r)
      if (prev.nonEmpty) requireMarkerSafe("previous root", prev)
    }
    IndexManifest.writeAtomic(spark, markerPath,
      (snapshot.map(sp => s"!snapshot\t$sp").toSeq ++
        entries.map { case (n, p, r, prev) => s"$n\t$p\t$r\t$prev" }).mkString("\n"))
  }

  /** The snapshot path a marker recorded (the `!snapshot` header) —
    * part of the round's intent, so a standalone `recover(marker)`
    * heals the reader-side snapshot even when the caller does not know
    * (or predates) the round's snapshotPath.
    */
  private[graft] def readMarkerSnapshot(
      spark: SparkSession, markerPath: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      s.linesIterator.find(_.startsWith("!snapshot\t"))
        .flatMap(_.split("\t", -1).lift(1)).filter(_.nonEmpty)
    }
  }

  private[graft] def readMarker(
      spark: SparkSession, markerPath: String): Seq[(String, String, String, String)] = {
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      s.linesIterator.filter(l => l.nonEmpty && !l.startsWith("!snapshot\t")).map { line =>
        // -1 keeps the trailing empty prev field of a first-publish tier
        line.split("\t", -1) match {
          case Array(n, ptr, root, prev) => (n, ptr, root, prev)
          case _ => throw new IllegalArgumentException(
            s"Nightly.recover: malformed round marker line at $markerPath: '$line'")
        }
      }.toSeq
    }
  }

  private def deleteMarker(spark: SparkSession, markerPath: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(markerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, false): Unit
  }

  /** Heal a crashed swap from its round marker: every entry whose
    * pointer is not already serving the intended root is re-published
    * (roll FORWARD — the marker is written only after the audit gate
    * passed, so the intended roots are the consistent state), then the
    * marker is cleared. No marker = nothing to heal (empty result).
    * Returns (tier, action = completed | already-current) per entry.
    * Idempotent: a crash mid-recover leaves the marker standing and
    * the next call finishes the remainder.
    *
    * FENCED against the marker's own staleness: the roll-forward runs
    * only while the tier's pointer still serves the round's recorded
    * BASE (or already serves the intended root). Any other pointer
    * value means a lifecycle operation acted BETWEEN the crash and
    * this run — another publisher, a vacuum that republished — and
    * re-applying the crashed round's intent would silently clobber
    * it: refuse loudly and make the operator resolve (then delete)
    * the marker instead. One deliberate consequence: an operator who
    * hand-rolls a tier back to the round's base WITHOUT deleting the
    * standing marker is indistinguishable from the round's own
    * restore and will be rolled forward — resolving a crashed swap
    * manually always ends by deleting the marker.
    */
  def recover(
      spark: SparkSession, markerPath: String,
      snapshotPath: Option[String] = None): Seq[(String, String)] = {
    val entries = readMarker(spark, markerPath)
    val healed = entries.map { case (name, ptr, root, prev) =>
      val rootQ = IndexManifest.qualify(spark, Seq(root)).head
      val prevQ = if (prev.isEmpty) None
        else Some(IndexManifest.qualify(spark, Seq(prev)).head)
      val cur = try Some(IndexManifest.readPointer(spark, ptr))
        catch { case _: IllegalArgumentException => None }
      if (cur.contains(rootQ)) name -> "already-current"
      else {
        require(cur == prevQ,
          s"Nightly.recover: the marker at $markerPath intends $name -> $root (from " +
            s"${prevQ.getOrElse("<no previous pointer>")}), but the pointer at $ptr " +
            s"now serves ${cur.getOrElse("<absent>")} — a lifecycle operation ran on " +
            "this pointer after the crashed round, so rolling its intent forward " +
            "would clobber that write. Resolve the pointer state manually, then " +
            "delete the marker")
        ServePointer.publish(spark, ptr, root, name)
        name -> "completed"
      }
    }
    if (entries.nonEmpty) {
      // a crash AFTER the flips but BEFORE the snapshot publish left
      // readers on yesterday's deployment while the pointers serve
      // tonight — the marker records the round's snapshot path as part
      // of its intent, so the heal republishes it even from a
      // standalone recover(marker) call that passes no snapshotPath.
      // The RECORDED path wins over the caller's: healing a crashed
      // round means completing THAT round's intent, not a config that
      // changed since
      readMarkerSnapshot(spark, markerPath).orElse(snapshotPath).foreach(sp =>
        DeploymentSnapshot.publish(spark, sp,
          entries.map { case (n, _, root, _) => n -> root }))
      deleteMarker(spark, markerPath)
    }
    healed
  }

  /** Run the round: maintain every tier, audit all of them, then —
    * only if every tier reports `in_sync = 1` — flip every pointer and
    * run the optional release round. Returns (report, releaseReport):
    * the report is one row per tier, the audit columns plus
    * `published` (the ROUND verdict — true on every row or false on
    * every row, the [[Curation.maintainRelease]] report convention);
    * releaseReport is the release closure's own report when it ran,
    * None when the gate refused or no release was supplied.
    *
    * @param keepGenerations  per-tier retention window applied AFTER a
    *                  fully-swapped round ([[ServePointer.retain]])
    * @param markerPath  opt-in crash-atomic swap: the round's intent is
    *                  written here before the first flip and healed by
    *                  [[recover]] (invoked at entry) after a crash
    * @param snapshotPath  opt-in reader-side atomicity: one
    *                  [[DeploymentSnapshot]] rename publishes ALL
    *                  tiers' new roots after the last flip
    */
  def run(
      spark: SparkSession,
      tiers: Seq[Tier],
      release: Option[() => DataFrame] = None,
      keepGenerations: Option[Int] = None,
      markerPath: Option[String] = None,
      snapshotPath: Option[String] = None): (DataFrame, Option[DataFrame]) = {
    require(tiers.nonEmpty, "Nightly.run: no tiers to maintain")
    require(tiers.map(_.name).distinct.size == tiers.size,
      s"Nightly.run: duplicate tier names in ${tiers.map(_.name).mkString(", ")}")
    // shape validation BEFORE any maintain runs: a misconfigured tier
    // must refuse up front, not after the round's expensive phase
    tiers.foreach(t => require(t.hashCol.isDefined == t.liveHashes.isDefined,
      s"Nightly tier '${t.name}': hashCol and liveHashes must be supplied together"))
    // delimiter-safety up front too: a tab-carrying tier name would
    // otherwise surface only in recover() after a crash — the one
    // moment the marker is needed (see requireMarkerSafe)
    if (markerPath.isDefined) tiers.foreach { t =>
      requireMarkerSafe("tier name", t.name)
      requireMarkerSafe("pointer path", t.pointerPath)
    }
    // 0a. record the marker path beside every tier pointer — the
    // DURABLE deployment config that lets intraday ingest discover the
    // crashed-swap protection from the pointer it already reads
    // (IndexManifest.readNightlyMarkerConfig), instead of each stream
    // call site having to remember to thread nightlyMarkerPath
    markerPath.foreach(m =>
      tiers.foreach(t => IndexManifest.writeNightlyMarkerConfig(spark, t.pointerPath, m)))
    // 0. heal a prior round's crashed swap FIRST: tonight's maintain
    // rounds must chain from consistent pointers, not a mixed state
    markerPath.foreach(m => recover(spark, m, snapshotPath): Unit)
    // 1. every maintain round completes BEFORE anything is judged:
    // each publishes valid (manifest-committed) generations that
    // nothing serves until the swap, so a mid-round crash leaves
    // yesterday's pointers intact by construction. Each tier's fence
    // epoch is read HERE — before its maintain chains from the
    // pointer's current generation — and carried through to the swap,
    // so a pointer movement anywhere inside the hours-long round (a
    // misconfigured ingest stream sharing the pointer, a second
    // scheduler) makes that tier's flip refuse instead of silently
    // clobbering the concurrent writer's generation with a chain built
    // from the superseded base (the ingestRound treatment).
    val fences = tiers.map(t => t.name -> IndexManifest.readEpoch(spark, t.pointerPath)).toMap
    val newRoots = tiers.map(t => t -> t.maintain())
    // 2. the cross-tier audit — per-tier registries (the families key
    // by different ids), one narrow full-outer join each. A tier with
    // content-hash hookups audits through auditContent (id sets PLUS
    // the stale-payload count); set-only tiers report n_stale = 0 so
    // the round's report is one uniform relation either way
    val reportCols = Seq("tier", "n_live", "n_missing", "n_orphaned",
      "n_dup_pairs", "n_stale", "in_sync").map(org.apache.spark.sql.functions.col)
    val auditRows = newRoots.map { case (t, root) =>
      (t.hashCol, t.liveHashes) match {
        case (Some(hc), Some(lh)) =>
          IndexAudit.auditContent(t.registry, t.idCol, hc,
            Seq(t.name -> lh(root))).select(reportCols: _*)
        case (None, None) =>
          IndexAudit.audit(t.registry, t.idCol, Seq(t.name -> t.liveIds(root)))
            .withColumn("n_stale", org.apache.spark.sql.functions.lit(0L))
            .select(reportCols: _*)
        case _ => throw new IllegalArgumentException(
          s"Nightly tier '${t.name}': hashCol and liveHashes must be supplied together")
      }
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
        // the OUTGOING snapshot's roots, read before the new one
        // replaces it: a reader that resolved it just before the swap
        // may still hold them, so this round's retention pins them —
        // the same one-generation grace the keep window gives
        // pointer-cadence readers (intraday ingest can push a
        // snapshot root several generations deep, past any count
        // window)
        val outgoingSnapshot: Map[String, String] = snapshotPath
          .map(DeploymentSnapshot.readIfExists(spark, _)).getOrElse(Map.empty)
        var snapshotPublished = false
        // the round marker lands BEFORE the first flip — a process
        // crash anywhere inside the swap window leaves it on disk, and
        // the next run's recover() rolls the remaining tiers FORWARD
        // (the gate already passed; the intended roots are the
        // consistent state). Deleted on completion AND on the
        // exception path below (which restores yesterday's pointers —
        // also a consistent state, so nothing remains to heal).
        markerPath.foreach(m => writeMarker(spark, m,
          newRoots.map { case (t, root) =>
            (t.name, t.pointerPath, IndexManifest.qualify(spark, Seq(root)).head,
              prev(t).getOrElse(""))
          }, snapshot = snapshotPath))
        val flipped = scala.collection.mutable.ArrayBuffer.empty[Tier]
        try {
          newRoots.foreach { case (t, root) =>
            IndexManifest.publishPointerFenced(spark, t.pointerPath, root, t.name,
              fences(t.name))
            flipped += t
          }
          // the READER-side atomic handoff: once every tier pointer
          // flipped, ONE rename publishes the whole deployment —
          // snapshot readers see yesterday's tier set or tonight's,
          // never the mixed window the sequential flips above open.
          // Written before the marker clears, so a crash between the
          // two replays both idempotently on the next run.
          snapshotPath.foreach { sp =>
            DeploymentSnapshot.publish(spark, sp,
              newRoots.map { case (t, root) => t.name -> root })
            snapshotPublished = true
          }
          markerPath.foreach(m => deleteMarker(spark, m))
        } catch {
          case e: Throwable =>
            var restoreFailed = false
            flipped.foreach { t =>
              try {
                prev(t) match {
                  case Some(old) => ServePointer.publish(spark, t.pointerPath, old, t.name)
                  case None =>
                    val p = new org.apache.hadoop.fs.Path(t.pointerPath)
                    val pfs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
                    // Hadoop local delete reports failure via the
                    // boolean, not an exception — a swallowed false
                    // here is the same double-fault as a throwing
                    // restore and must keep the marker
                    if (!pfs.delete(p, false) && pfs.exists(p)) restoreFailed = true
                }
              } catch { case _: Throwable => restoreFailed = true } // best effort; rethrow the cause
            }
            // a snapshot already published this round must go back to
            // the OUTGOING deployment with the pointers — the last
            // AUDITED tier set, not the pointers' pre-flip values
            // (intraday ingest may have moved those onto roots no
            // cross-tier audit ever approved). Otherwise a failure
            // after the snapshot write (e.g. the marker delete) would
            // leave readers on tonight's roots while the operator sees
            // a refused round. A round that ADDED a tier the outgoing
            // snapshot lacked (or CREATED the snapshot) cannot restore
            // by merge — treat it like a failed restore and let the
            // standing marker roll the whole round forward instead.
            if (snapshotPublished) {
              val restorePairs = tiers.flatMap(t =>
                outgoingSnapshot.get(t.name).map(t.name -> _))
              if (restorePairs.size != tiers.size) restoreFailed = true
              else {
                try DeploymentSnapshot.publish(spark, snapshotPath.get, restorePairs)
                catch { case _: Throwable => restoreFailed = true }
              }
            }
            // the marker may only leave with a CONSISTENT state behind
            // it: every restore succeeded = yesterday everywhere, so a
            // standing marker would wrongly roll FORWARD next run. Any
            // restore FAILURE means the pointers are mixed — exactly
            // the state the marker heals — so it stays, and the next
            // run's recover completes the (gate-approved) swap.
            if (!restoreFailed)
              markerPath.foreach(m =>
                try deleteMarker(spark, m) catch { case _: Throwable => () })
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
        // the superseded snapshot's root per tier gets one round of
        // retention grace (see outgoingSnapshot above)
        keepGenerations.foreach { keep =>
          tiers.foreach(t => ServePointer.retain(spark, t.pointerPath, keep, t.name,
            pinned = outgoingSnapshot.get(t.name).toSeq ++
              // a re-introduced tier whose earlier retirement is still
              // in grace must not have the graced root reclaimed by
              // this round's ordinary retention
              snapshotPath.toSeq.flatMap(sp => gracePinnedRoots(spark, sp, t.pointerPath))): Unit)
        }
        // a PUBLISHED round is the retirement-grace clock: reclaim the
        // retired roots whose readers had their rounds to drain, count
        // the rest one round down (Nightly.retireTier's graceRounds).
        // The OUTGOING snapshot's roots ride along as extra pins: on a
        // swap round the per-tier retain above deliberately pinned them
        // for tonight's draining readers (one-round snapshot grace), and
        // a due entry's unpinned retain on the same pointer — a tier
        // retired, re-introduced, whose grace expires tonight — must not
        // vacuum what this very round just promised.
        snapshotPath.foreach(sp =>
          tickRetirementGrace(spark, sp, extraPins = outgoingSnapshot.values.toSeq))
        rel
      }
    import spark.implicits._
    val report = auditRows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), inSync))
      .toDF("tier", "n_live", "n_missing", "n_orphaned", "n_dup_pairs", "n_stale",
        "in_sync", "published")
    (report, releaseReport)
  }

  /** First-class TIER RETIREMENT — the scheduler-side composition over
    * [[DeploymentSnapshot.retire]]: drop the tier from the
    * reader-facing deployment atomically (tombstoned, so a later
    * subset publish cannot resurrect it) and run the tier's
    * pointer-side retention so its superseded generations reclaim now
    * that the snapshot no longer pins them. The just-retired root
    * itself gets READER GRACE: it is pinned through this retention
    * pass and stays reclaimable-not-reclaimed for `graceRounds` more
    * PUBLISHED nightly rounds — a reader that resolved the snapshot
    * moments before the retire (or a long-draining batch job holding
    * that resolve) can keep reading while the grace lasts; the root
    * reclaims on round `graceRounds + 1`. The countdown is durable
    * (`<snapshotPath>.grace`, one `tier \t pointer \t root \t what \t
    * keep \t remaining` line per retired root, written by this call
    * and ticked by every published [[run]] over the same
    * snapshotPath), so the grace survives scheduler restarts; same
    * single-scheduler write contract as the snapshot itself. Pass
    * `keepGenerations = None` to manage the tier's retention entirely
    * by hand (no immediate retain, no ledger entry — reclaim later
    * with [[ServePointer.vacuum]]), or leave the tier's pointer
    * lifecycle running if the tier merely left the deployment without
    * being decommissioned.
    *
    * Refuses while a crashed swap's round marker stands: the marker's
    * recorded intent names tiers by pointer, and retiring one out from
    * under it would make [[recover]]'s heal ambiguous — heal first
    * (run [[recover]] or the next [[run]]), then retire. The marker
    * path is discovered from the pointer's durable nightly config
    * (written by every marker-protected [[run]]) even when the caller
    * does not pass `markerPath`.
    *
    * Returns the root the retired tier was serving in the snapshot.
    */
  def retireTier(
      spark: SparkSession, snapshotPath: String, tier: String,
      pointerPath: String, what: String = "segmented",
      markerPath: Option[String] = None,
      keepGenerations: Option[Int] = Some(0),
      graceRounds: Int = 1): String = {
    require(graceRounds >= 1,
      s"Nightly.retireTier: graceRounds must be >= 1 (a reader that resolved the " +
        s"snapshot just before the retire needs at least one round to drain), got " +
        graceRounds)
    // validate EVERY ledger-bound value before any state mutates: these
    // used to run inside keepGenerations.foreach, AFTER the retire and
    // retain — a tab/newline-bearing value would throw with the tier
    // already retired but no grace entry recorded
    requireMarkerSafe("tier name", tier)
    requireMarkerSafe("pointer path", pointerPath)
    requireMarkerSafe("what", what)
    // discover the deployment's marker path from the pointer when the
    // caller did not thread it — same un-forgettable-config stance as
    // the intraday ingest check (IndexManifest.readNightlyMarkerConfig)
    (markerPath.toSeq ++
        IndexManifest.readNightlyMarkerConfig(spark, pointerPath)).distinct.foreach { m =>
      require(readMarker(spark, m).isEmpty,
        s"Nightly.retireTier: a round marker stands at $m — a crashed swap is " +
          "waiting to be healed, and retiring a tier out from under its recorded " +
          "intent would make the heal ambiguous. Run Nightly.recover (or the next " +
          "Nightly.run) first, then retire")
    }
    val root = DeploymentSnapshot.retire(spark, snapshotPath, tier)
    keepGenerations.foreach { k =>
      // pin the just-retired root AND any root still in grace from an
      // earlier retirement of this pointer (retire-reintroduce-retire)
      ServePointer.retain(spark, pointerPath, k, what,
        pinned = root +: gracePinnedRoots(spark, snapshotPath, pointerPath))
        .collect(): Unit
      // durable grace countdown: every published run() over this
      // snapshot ticks it down; the root reclaims on the round that
      // finds the count already at 0 — i.e. it survives exactly
      // graceRounds published rounds after this retire and reclaims
      // on round graceRounds + 1 (values validated at entry, above)
      writeGrace(spark, snapshotPath,
        readGrace(spark, snapshotPath)
          .filterNot(e => e.tier == tier && e.root == IndexManifest.qualify(spark, Seq(root)).head) :+
          GraceEntry(tier, pointerPath, IndexManifest.qualify(spark, Seq(root)).head,
            what, k, graceRounds))
    }
    root
  }

  // ==================== retirement grace ledger ====================

  /** One retired root awaiting reclaim: after `remaining` more
    * published rounds tick it to due, the root's pointer runs an
    * UNPINNED retention (`keep` window) and the entry drops.
    */
  private[graft] final case class GraceEntry(
      tier: String, pointerPath: String, root: String, what: String,
      keep: Int, remaining: Int)

  private def gracePath(snapshotPath: String): String = snapshotPath + ".grace"

  private[graft] def readGrace(spark: SparkSession, snapshotPath: String): Seq[GraceEntry] = {
    val p = new org.apache.hadoop.fs.Path(gracePath(snapshotPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      s.linesIterator.filter(_.nonEmpty).map { line =>
        line.split("\t", -1) match {
          case Array(t, ptr, r, w, k, rem) if k.toIntOption.isDefined && rem.toIntOption.isDefined =>
            GraceEntry(t, ptr, r, w, k.toInt, rem.toInt)
          case _ => throw new IllegalArgumentException(
            s"Nightly: malformed retirement-grace line at ${gracePath(snapshotPath)}: '$line'")
        }
      }.toSeq
    }
  }

  private def writeGrace(
      spark: SparkSession, snapshotPath: String, entries: Seq[GraceEntry]): Unit = {
    val p = new org.apache.hadoop.fs.Path(gracePath(snapshotPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (entries.isEmpty) { if (fs.exists(p)) fs.delete(p, false): Unit }
    else IndexManifest.writeAtomic(spark, gracePath(snapshotPath),
      entries.map(e =>
        s"${e.tier}\t${e.pointerPath}\t${e.root}\t${e.what}\t${e.keep}\t${e.remaining}")
        .mkString("\n"))
  }

  /** The published round's grace tick: reclaim every DUE retired root
    * (remaining already 0 — its readers had their rounds to drain) via
    * an unpinned retention on its pointer, then decrement the rest.
    * Reclaim-first ordering makes a crash between the two heal on the
    * next round's re-tick (retain is idempotent; an absent root
    * reports `absent` and drops) instead of leaking the root forever.
    */
  private def tickRetirementGrace(
      spark: SparkSession, snapshotPath: String,
      extraPins: Seq[String] = Seq.empty): Unit = {
    val entries = readGrace(spark, snapshotPath)
    if (entries.nonEmpty) {
      val (due, waiting) = entries.partition(_.remaining <= 0)
      // a reclaim must not strand ANOTHER root still in grace on the
      // same pointer (a retire-reintroduce-retire sequence stacks
      // entries): everything still waiting stays pinned through the
      // due entries' retention, as does every caller-threaded extra pin
      // (run() passes the outgoing snapshot's roots — pinning a root
      // that never lived in this pointer's history is a no-op)
      due.foreach(e =>
        ServePointer.retain(spark, e.pointerPath, e.keep, e.what,
          pinned = waiting.filter(_.pointerPath == e.pointerPath).map(_.root) ++ extraPins)
          .collect(): Unit)
      writeGrace(spark, snapshotPath, waiting.map(e => e.copy(remaining = e.remaining - 1)))
    }
  }

  /** The grace-ledger roots still pending on `pointerPath` — every
    * retention pass that can run while a retirement grace is open
    * (the nightly's per-tier retain, intraday ingest retention, a
    * second retire on the same pointer, the tick's own reclaims) pins
    * these so an unrelated round cannot reclaim a root whose readers
    * were promised more time. STRICT: an unreadable/malformed ledger
    * propagates — silently un-pinning a promised root is the one
    * failure mode this helper exists to prevent (per-micro-batch
    * callers that must not wedge wrap it, same as their snapshot
    * pins).
    */
  private[operators] def gracePinnedRoots(
      spark: SparkSession, snapshotPath: String, pointerPath: String): Seq[String] =
    readGrace(spark, snapshotPath).filter(_.pointerPath == pointerPath).map(_.root)
}
