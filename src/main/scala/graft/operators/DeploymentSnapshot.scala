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
  * scheduler) — the merge is a read-modify-write with no fence, so
  * concurrent subset publishes are out of contract (they could lose
  * each other's tiers). Renaming or decommissioning a tier is a
  * deliberate operator action: publish the full new deployment with
  * `replace = true` so the stale entry leaves the snapshot instead of
  * pointing at a root retention will eventually reclaim.
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
      require(!t.exists(c => c == '\t' || c == '\n' || c == '\r') &&
        !r.exists(c => c == '\t' || c == '\n' || c == '\r'),
        s"DeploymentSnapshot.publish: tier '$t' / root '$r' may not contain tabs " +
          "or newlines (the snapshot format's delimiters)")
    }
    val incoming = tiers.map { case (tier, root) =>
      IndexManifest.handle(spark, root, whats.getOrElse(tier, tier)): Unit
      tier -> IndexManifest.qualify(spark, Seq(root)).head
    }
    val existing =
      if (replace) Seq.empty
      else {
        val named = incoming.map(_._1).toSet
        readIfExists(spark, path).toSeq.filterNot { case (t, _) => named(t) }.sortBy(_._1)
      }
    IndexManifest.writeAtomic(spark, path,
      (existing ++ incoming).map { case (t, r) => s"$t\t$r" }.mkString("\n"))
  }

  /** The whole deployment in one read — resolve EVERY tier from the
    * returned map to get the atomicity the snapshot exists for
    * (per-tier re-reads reopen the mixed window). Refuses when no
    * snapshot was ever published.
    */
  def read(spark: SparkSession, path: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no deployment snapshot at $path — publish has never run (or the snapshot " +
        "was deleted out-of-band)")
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    s.linesIterator.filter(_.nonEmpty).map { line =>
      line.split("\t") match {
        case Array(tier, root) => tier -> root
        case _ => throw new IllegalArgumentException(
          s"DeploymentSnapshot.read: malformed snapshot line at $path: '$line'")
      }
    }.toMap
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
