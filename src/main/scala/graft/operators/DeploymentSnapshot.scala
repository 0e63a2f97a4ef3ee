package graft.operators

import org.apache.spark.sql.SparkSession

/** The ATOMIC MULTI-TIER handoff the per-tier serve pointers cannot
  * give readers by themselves: [[Nightly]]'s swap flips each tier's
  * pointer in sequence — crash-consistent (round marker) and
  * writer-fenced (pointer epochs), but a READER resolving three
  * pointers mid-swap can still observe tier A on tonight while tier B
  * serves yesterday, for the duration of the swap window. The
  * deployment snapshot closes that last window: one plain-text file of
  * `tier \t indexRoot` lines, written to a temp name and renamed over
  * the destination in ONE filesystem metadata operation — so a reader
  * that resolves EVERY tier from one snapshot read sees yesterday's
  * deployment or tonight's, never a mix. The same catalog-pointer
  * stance as [[ServePointer]] one level up (and the same pattern as a
  * lakehouse catalog commit naming many table versions at once); the
  * per-tier pointers remain the writer-side lifecycle surface
  * (history, rollback, retention all stay per-tier).
  *
  * Usage: pass `snapshotPath` to [[Nightly.run]] — the snapshot is
  * written AFTER every tier pointer flipped (and before the release
  * closure), naming exactly the roots the round published. Serve
  * paths resolve `DeploymentSnapshot.read(spark, path)` once per
  * request/batch and use the returned roots for every tier they
  * touch. Cadence caveat: the snapshot advances at NIGHTLY cadence —
  * intraday streaming ingest flips the per-tier pointers underneath
  * it, so consumers that must see the stream's progress resolve the
  * tier pointer directly and accept per-tier granularity; the
  * snapshot is for consumers whose correctness needs a CONSISTENT
  * cross-tier view (the cross-tier joins the audit exists to protect).
  * Writer contract: the snapshot has ONE publisher (the nightly
  * scheduler), and the contract gets the same FENCE the per-tier
  * pointers got — a `<snapshot>.epoch` beside the file, read before
  * the merge's read-modify-write and check-and-bumped (exclusive
  * create) at the rename — so two concurrent publishes (a fix-one-
  * tier re-run racing the nightly) get one committed winner and one
  * loud refusal. Same caveat as the pointer fence: the epoch
  * serializes commit DECISIONS, not execution spans — a publish that
  * ENTERS in the window between a winner's epoch bump and its
  * late-landing rename reads the pre-winner parts, passes its own
  * fence, and the two renames still race last-wins — so the fence
  * exists to catch single-publisher-contract violations loudly, not
  * to make concurrent publishers safe. Renaming or
  * decommissioning a tier is a deliberate operator action:
  * [[retire]] drops the tier atomically and TOMBSTONES it, so a
  * subsequent subset publish cannot resurrect the stale entry by
  * merge (a root retention will eventually reclaim); a full redeploy
  * with `replace = true` clears tombstones deliberately.
  *
  * Reference counterpart: none — the deployment composition over this
  * repo's own index lifecycle, like [[Nightly]] itself.
  */
object DeploymentSnapshot {

  /** Atomically publish the snapshot: every incoming (tier, indexRoot)
    * pair is resolved through the manifest handle FIRST — a snapshot
    * can never name a root that refuses to serve — then the whole map
    * lands in one rename. MERGES by default: tiers an existing
    * snapshot names that this publish does not carry keep their
    * (already-validated-at-write) roots, so a round over a SUBSET of
    * tiers — the fix-one-tier-and-re-run path — cannot silently evict
    * the others from the reader-facing deployment. `replace = true` is
    * the full-redeploy form that drops absent tiers deliberately.
    * `whats` names each tier's index family for handle validation
    * errors (defaults to the tier name).
    */
  def publish(
      spark: SparkSession, path: String, tiers: Seq[(String, String)],
      whats: Map[String, String] = Map.empty, replace: Boolean = false): Unit = {
    require(tiers.nonEmpty, "DeploymentSnapshot.publish: no tiers")
    require(tiers.map(_._1).distinct.size == tiers.size,
      s"DeploymentSnapshot.publish: duplicate tiers in ${tiers.map(_._1).mkString(", ")}")
    // the format is line-per-tier, tab-separated: a name or root
    // carrying the delimiters would publish a file read() rejects on
    // every subsequent resolve — refuse at the WRITE, not the reads
    tiers.foreach { case (t, r) =>
      require(!t.exists(c => c == '\t' || c == '\n' || c == '\r') && !t.startsWith("!") &&
        !r.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"DeploymentSnapshot.publish: tier '$t' / root '$r' may not contain tabs " +
          "or newlines (the snapshot format's delimiters) or a leading '!' (the " +
          "format's header sigil)")
    }
    // the fence spans the whole read-merge-rename: a concurrent
    // publish/retire committing anywhere inside it moves the epoch
    // and this write refuses having changed nothing (see the epoch
    // fence on the per-tier pointers, IndexManifest.readEpoch)
    val entryEpoch = IndexManifest.readEpoch(spark, path)
    val incoming = tiers.map { case (tier, root) =>
      IndexManifest.handle(spark, root, whats.getOrElse(tier, tier)): Unit
      tier -> IndexManifest.qualify(spark, Seq(root)).head
    }
    val (existing, retired) =
      if (replace) (Seq.empty[(String, String)], Set.empty[String])
      else {
        val named = incoming.map(_._1).toSet
        val (tiersNow, retiredNow) = readParts(spark, path)
        val resurrected = incoming.map(_._1).filter(retiredNow)
        require(resurrected.isEmpty,
          s"DeploymentSnapshot.publish: tier(s) ${resurrected.mkString(", ")} were " +
            s"RETIRED from the snapshot at $path — a merge publish cannot resurrect " +
            "a retired tier (its old roots may already be reclaimed). Re-introducing " +
            "the tier is a full-redeploy decision: publish with replace = true")
        (tiersNow.toSeq.filterNot { case (t, _) => named(t) }.sortBy(_._1), retiredNow)
      }
    IndexManifest.checkAndBumpEpoch(spark, path, entryEpoch, "DeploymentSnapshot.publish")
    IndexManifest.writeAtomic(spark, path,
      (retired.toSeq.sorted.map(t => s"!retired\t$t") ++
        (existing ++ incoming).map { case (t, r) => s"$t\t$r" }).mkString("\n"))
  }

  /** Atomically DROP `tier` from the snapshot and tombstone it — the
    * first-class decommission replacing the manual full-redeploy
    * footgun: readers' [[readTier]] refuses from the next resolve, the
    * tier's roots stop being snapshot-pinned (so pointer-side
    * retention reclaims its superseded generations on its own
    * schedule), and the `!retired` tombstone makes a later subset
    * [[publish]] REFUSE to resurrect the entry by merge. Fenced like
    * publish. Returns the root the retired tier was serving, so the
    * caller can hand it to [[ServePointer]] retention/vacuum once
    * snapshot readers have drained (the same one-round grace the
    * nightly gives superseded roots — the root is NOT deleted here).
    * The tier's own pointer lifecycle (pointer, history, epoch) is
    * untouched: retiring removes the tier from the reader-facing
    * deployment; decommissioning its data is the pointer lifecycle's
    * job.
    */
  def retire(spark: SparkSession, path: String, tier: String): String = {
    val entryEpoch = IndexManifest.readEpoch(spark, path)
    val (tiersNow, retiredNow) = readParts(spark, path)
    val root = tiersNow.getOrElse(tier, throw new IllegalArgumentException(
      s"DeploymentSnapshot.retire: snapshot at $path names no tier '$tier' " +
        s"(has: ${tiersNow.keys.toSeq.sorted.mkString(", ")}" +
        (if (retiredNow.nonEmpty) s"; already retired: ${retiredNow.toSeq.sorted.mkString(", ")}"
         else "") + ")"))
    IndexManifest.checkAndBumpEpoch(spark, path, entryEpoch, "DeploymentSnapshot.retire")
    IndexManifest.writeAtomic(spark, path,
      ((retiredNow + tier).toSeq.sorted.map(t => s"!retired\t$t") ++
        tiersNow.toSeq.filterNot(_._1 == tier).sortBy(_._1)
          .map { case (t, r) => s"$t\t$r" }).mkString("\n"))
    root
  }

  /** The whole deployment in one read — resolve EVERY tier from the
    * returned map to get the atomicity the snapshot exists for
    * (per-tier re-reads reopen the mixed window). Refuses when no
    * snapshot was ever published.
    */
  def read(spark: SparkSession, path: String): Map[String, String] =
    readParts(spark, path, requireExists = true)._1

  /** The tiers a past [[retire]] tombstoned out of the snapshot — the
    * set a merge [[publish]] refuses to resurrect. Empty when the
    * snapshot does not exist.
    */
  def readRetired(spark: SparkSession, path: String): Set[String] =
    readParts(spark, path)._2

  /** Both halves of the snapshot file: the live (tier -> root) map and
    * the `!retired` tombstone set. Lines starting with `!` are headers
    * (`!retired\t<tier>`); unknown headers refuse — they mean a newer
    * writer's format.
    */
  private def readParts(
      spark: SparkSession, path: String,
      requireExists: Boolean = false): (Map[String, String], Set[String]) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      require(!requireExists,
        s"no deployment snapshot at $path — publish has never run (or the snapshot " +
          "was deleted out-of-band)")
      return (Map.empty, Set.empty)
    }
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val lines = s.linesIterator.filter(_.nonEmpty).toSeq
    val retired = lines.filter(_.startsWith("!")).map { line =>
      line.split("\t", -1) match {
        case Array("!retired", tier) => tier
        case _ => throw new IllegalArgumentException(
          s"DeploymentSnapshot.read: unknown snapshot header at $path: '$line' — " +
            "written by a newer builder than this one")
      }
    }.toSet
    val tiers = lines.filterNot(_.startsWith("!")).map { line =>
      line.split("\t") match {
        case Array(tier, root) => tier -> root
        case _ => throw new IllegalArgumentException(
          s"DeploymentSnapshot.read: malformed snapshot line at $path: '$line'")
      }
    }.toMap
    (tiers, retired)
  }

  /** [[read]] when the snapshot may legitimately not exist yet (the
    * lifecycle paths that consult it opportunistically — retention
    * pinning, the nightly's outgoing-deployment capture, the publish
    * merge): absent = empty map, no refusal. The serve paths use
    * [[read]] — a READER's missing snapshot is an error.
    */
  def readIfExists(spark: SparkSession, path: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    if (!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) Map.empty
    else read(spark, path)
  }

  /** One tier's root from the snapshot; refuses on an unknown tier so
    * a renamed tier fails loudly instead of serving a stale default.
    */
  def readTier(spark: SparkSession, path: String, tier: String): String = {
    val snap = read(spark, path)
    snap.getOrElse(tier, throw new IllegalArgumentException(
      s"DeploymentSnapshot.readTier: snapshot at $path names no tier '$tier' " +
        s"(has: ${snap.keys.toSeq.sorted.mkString(", ")})"))
  }
}
