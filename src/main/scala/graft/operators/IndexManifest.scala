package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The commit-marker protocol shared by every on-disk index this
  * library publishes (the BM25 postings set in [[Retrieval]], the
  * IVF-PQ vector index in [[Similarity]]): a one-row parquet table
  * written strictly AFTER every data table of a build. Its presence
  * certifies the tables under `path` are a consistent set from one
  * build; builders delete it FIRST, so a crash mid-(re)build leaves an
  * index that loudly refuses to serve instead of serving
  * mixed-generation results.
  *
  * Segmented layout: the manifest additionally RECORDS the list of
  * segment directories that make up the index — the LSM stance that
  * makes maintenance O(increment): an update writes the delta as a
  * brand-new segment directory and publishes a manifest whose list is
  * (old segments ++ the new one); data files written before the
  * manifest lands are invisible to readers (they only ever read
  * LISTED segments), so the old index serves untouched until the new
  * manifest commits. Entries are resolved against the manifest's own
  * root when relative, or taken verbatim when absolute — an updated
  * index published at a fresh root points back at the base
  * generation's segments instead of copying them (which would be the
  * O(corpus) rewrite this layout exists to kill); [[compactIndex]]-
  * style merges are the explicit path that re-homes data.
  */
private[operators] object IndexManifest {

  /** One loaded manifest: everything a serve call needs to know about
    * an index generation, in memory. `segments` / `tombstones` are
    * already resolved to full paths against the manifest's root.
    */
  final case class Handle(
      version: Int, flavor: String, segments: Seq[String], tombstones: Seq[String]) {
    /** Per-generation memo of ASSEMBLED serve relations (the
      * segment-unioned table scans and the merged tombstone mask).
      * Segments and tombstone dirs are immutable once published (the
      * LSM contract — maintenance always writes NEW dirs and a new
      * manifest, which is a new fingerprint and so a new Handle), so
      * a relation assembled once is valid for the Handle's lifetime.
      * Without this, every serve call pays a driver file-listing +
      * parquet-footer read per table per segment just to rebuild an
      * identical plan. Session isolation rides the handle cache's own
      * per-(session, path) keying — a Handle is never shared across
      * sessions — so entries here key by table alone and the key
      * space is bounded by the tier's table count.
      */
    private[IndexManifest] val rels =
      new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.DataFrame]()
  }

  // stable per-session identity for cache keying: identityHashCode is
  // NOT enough — beyond live-pair collisions, a hash can be REUSED by
  // a brand-new session after an old one is GC'd, which would serve
  // the dead session's cached Handle (whose memoized DataFrames are
  // bound to the stopped session) to the new one at the same path.
  // Classic sessions carry a per-instance UUID; any other
  // implementation gets one assigned via a weak map (weak keys: the
  // map must not pin a stopped session in memory).
  private val assignedSids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())
  private def sid(spark: SparkSession): String =
    org.apache.spark.sql.graftbridge.Bridge.sessionUUID(spark).getOrElse(
      assignedSids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString))

  /** get-then-putIfAbsent rather than computeIfAbsent: a memoized
    * assembly (e.g. the PQ tier's masked vector union) composes the
    * OTHER memoized helpers, and nested computeIfAbsent on one
    * ConcurrentHashMap throws "Recursive update". A racing duplicate
    * build is harmless — both sides assemble the identical immutable
    * plan and one wins the publish.
    */
  private def cachedRel(h: Handle, key: String)(
      mk: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val cur = h.rels.get(key)
    if (cur != null) cur
    else {
      val v = mk
      val prev = h.rels.putIfAbsent(key, v)
      if (prev != null) prev else v
    }
  }

  /** [[Handle]]-memoized flat segment-table union — the common serve
    * read ([[segTableOrd]]'s multi-path cousin: one scan, pushdown
    * reaches every segment's row groups).
    */
  def segTable(spark: SparkSession, h: Handle, table: String): org.apache.spark.sql.DataFrame =
    cachedRel(h, s"flat/$table")(
      spark.read.parquet(h.segments.map(s => s"$s/$table"): _*))

  /** [[Handle]]-memoized [[segTableOrd]]. */
  def segTableOrd(spark: SparkSession, h: Handle, table: String): org.apache.spark.sql.DataFrame =
    cachedRel(h, s"ord/$table")(segTableOrd(spark, h.segments, table))

  /** [[Handle]]-memoized [[tombstoneRel]]. */
  def tombstoneRel(
      spark: SparkSession, h: Handle, idCol: String): Option[org.apache.spark.sql.DataFrame] =
    if (h.tombstones.isEmpty) None
    else Some(cachedRel(h, s"ts/$idCol")(
      tombstoneRel(spark, h.tombstones, idCol).get))

  /** [[Handle]]-memoized union of the per-tombstone `tsstats` one-row
    * tables (the delete-time mass each generation removed).
    */
  def tsStats(spark: SparkSession, h: Handle): org.apache.spark.sql.DataFrame =
    cachedRel(h, "tsstats")(
      spark.read.parquet(h.tombstones.map(t => s"$t/tsstats"): _*))

  /** Generic [[Handle]]-memoized relation for tier-specific assembled
    * reads (e.g. the PQ tier's masked vector union) — same contract as
    * the named helpers above: `mk` must assemble purely from the
    * Handle's immutable segment/tombstone dirs.
    */
  def memo(spark: SparkSession, h: Handle, key: String)(
      mk: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    cachedRel(h, s"memo/$key")(mk)

  /** Memoized [[Handle]] per index path. A cold serve call used to pay
    * 3–4 driver-blocking one-row parquet jobs (presence + version +
    * segments + tombstones) on EVERY invocation — fixed, corpus-size-
    * independent overhead, but real per-call latency for an online
    * serve path. The cache collapses that to ONE parquet read on first
    * touch and a pure filesystem METADATA listing afterwards: entries
    * are keyed by the path's qualified URI and fingerprinted by the
    * manifest directory's file listing (name+length+mtime). Every
    * republish rewrites the manifest with fresh part-file UUIDs, so
    * the fingerprint ALWAYS changes when a new generation lands and a
    * stale handle can never be served — the staleness check is the
    * listing compare, not a TTL. Bounded EXPLICITLY: an LRU cap of
    * [[handleCacheCap]] entries (access-ordered eviction), so a
    * years-long scheduler JVM touching dated index roots daily cannot
    * accrue entries forever — an evicted path simply pays the
    * one-parquet-read reload on its next touch.
    */
  private[operators] var handleCacheCap = 256

  /** Carried segment/tombstone roots are existence-checked on every
    * (re)load, but a base root deleted while the handle sits cached
    * (fingerprint unchanged — the manifest itself was untouched)
    * would otherwise surface as a raw missing-parquet failure deep in
    * a serve plan. Every Nth cached lookup re-runs the root checks —
    * pure filesystem metadata over a bounded dir list — so the
    * manifest-level refusal the format promises arrives within N
    * serve calls of the deletion instead of never.
    */
  private val RevalidateEvery = 64L

  // recency is a monotonic ticker, not a clock — cheap, totally
  // ordered, and immune to clock adjustments
  private val cacheTick = new java.util.concurrent.atomic.AtomicLong(0L)

  private final class CacheEntry(val fp: String, val h: Handle) {
    val hits = new java.util.concurrent.atomic.AtomicLong(0L)
    val lastUsed = new java.util.concurrent.atomic.AtomicLong(cacheTick.incrementAndGet())
  }

  /** Lock-free on the hot path: handle() lookups hit a
    * ConcurrentHashMap (a synchronized access-ordered LinkedHashMap
    * would put one JVM-global mutex on every serve entry of every
    * index family). LRU bookkeeping is a per-entry recency stamp set
    * on hit; eviction is amortized onto the rare INSERT path
    * ([[evictIfOver]]), where a linear scan over ≤ cap entries is
    * noise next to the manifest parquet read that preceded it.
    */
  private val handleCache =
    new java.util.concurrent.ConcurrentHashMap[String, CacheEntry]()

  private def evictIfOver(): Unit =
    while (handleCache.size() > handleCacheCap) {
      var oldestKey: String = null
      var oldest = Long.MaxValue
      handleCache.forEach { (k: String, e: CacheEntry) =>
        val lu = e.lastUsed.get()
        if (lu < oldest) { oldest = lu; oldestKey = k }
      }
      // concurrent inserts may race two evictors over the same scan;
      // the worst case is evicting one entry more than strictly needed
      // — it reloads on next touch
      if (oldestKey == null) return
      handleCache.remove(oldestKey): Unit
    }

  private[operators] def handleCacheSize: Int = handleCache.size()

  /** Test hook: drop every cached handle. Safe at any time — an
    * evicted entry just reloads on next touch — but only tests have a
    * reason to call it (isolating LRU assertions from whatever other
    * suites cached in the shared JVM).
    */
  private[operators] def handleCacheClear(): Unit = handleCache.clear()

  private def manifestDir(
      spark: SparkSession, path: String): (org.apache.hadoop.fs.FileSystem,
        org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(s"$path/manifest")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** The manifest directory's identity on disk, or None when absent.
    * Directory mtimes alone are too coarse to trust across filesystems;
    * the per-file (name, length, mtime) triple is not — Spark writes
    * every commit under a fresh part-file UUID, so two generations can
    * never collide.
    */
  private def fingerprint(
      spark: SparkSession, path: String): Option[String] = {
    val (fs, p) = manifestDir(spark, path)
    if (!fs.exists(p)) None
    else Some(fs.listStatus(p)
      .map(st => s"${st.getPath.getName}:${st.getLen}:${st.getModificationTime}")
      .sorted.mkString("\n"))
  }

  private def qualifiedPath(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p).toString
  }

  /** Cache entries are keyed per (session, path), not per path: a
    * Handle memoizes assembled DataFrames ([[Handle.rels]]), and a
    * DataFrame is bound to the session that built it — sharing a
    * Handle across sessions would serve one session's plans to
    * another. Per-session keying also makes the LRU cap bound the
    * WHOLE footprint: a JVM that creates a session per scheduled run
    * ages the dead sessions' entries (and the session objects their
    * DataFrames pin) out of the cache instead of accreting them.
    * Session identity is the session's own UUID (see [[sid]]), never
    * identityHashCode — a recycled identity hash after a GC'd session
    * would alias a dead session's cached plans onto a live one.
    */
  private def cacheKey(spark: SparkSession, path: String): String =
    s"${sid(spark)}|${qualifiedPath(spark, path)}"

  /** The loaded-and-current [[Handle]] for the index at `path`; fails
    * loudly (the [[requirePresent]] message) when no manifest exists.
    * All read-side helpers below route through here, so a serve entry
    * point that checks presence + version + flavor and lists segments
    * + tombstones costs one cached lookup, not four driver jobs.
    */
  def handle(spark: SparkSession, path: String, what: String = "segmented"): Handle = {
    val fp = fingerprint(spark, path).getOrElse(throw new IllegalArgumentException(
      s"requirement failed: no complete $what index at $path: manifest missing " +
        "(build interrupted or never run)"))
    val key = cacheKey(spark, path)
    val cached = handleCache.get(key)
    if (cached != null && cached.fp == fp) {
      cached.lastUsed.set(cacheTick.incrementAndGet())
      // periodic carried-root re-validation (see [[RevalidateEvery]]);
      // a tripped check drops the entry so every subsequent call pays
      // the reload path and refuses immediately
      if (cached.hits.incrementAndGet() % RevalidateEvery == 0L) {
        try validateRoots(spark, path, what, cached.h)
        catch {
          case e: IllegalArgumentException =>
            handleCache.remove(key); throw e
        }
      }
      cached.h
    } else {
      val row = spark.read.parquet(s"$path/manifest").head()
      def seqCol(name: String): Seq[String] =
        if (!row.schema.fieldNames.contains(name)) Seq.empty
        else row.getSeq[String](row.fieldIndex(name))
      val h = Handle(
        version = row.getInt(row.fieldIndex("format_version")),
        flavor =
          if (row.schema.fieldNames.contains("flavor"))
            row.getString(row.fieldIndex("flavor"))
          else "",
        segments = seqCol("segments").map(resolve(path, _)),
        tombstones = seqCol("tombstones").map(resolve(path, _)))
      validateRoots(spark, path, what, h)
      handleCache.put(key, new CacheEntry(fp, h))
      evictIfOver()
      h
    }
  }

  /** Segments/tombstones carried BY REFERENCE mean an index depends
    * on every ancestor root staying alive; if a retired base root was
    * deleted, fail with the manifest-level refusal the format
    * promises, not a raw missing-parquet error deep inside a serve
    * plan. Runs on every (re)load and on every [[RevalidateEvery]]th
    * cached lookup.
    */
  private def validateRoots(
      spark: SparkSession, path: String, what: String, h: Handle): Unit =
    (h.segments ++ h.tombstones).foreach { d =>
      val dp = new org.apache.hadoop.fs.Path(d)
      require(dp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(dp),
        s"$what index at $path references $d, which no longer exists — a base " +
          "generation this index carries by reference was deleted; rebuild the " +
          "index, or compactIndex before retiring base roots")
    }

  private def invalidate(spark: SparkSession, path: String): Unit =
    handleCache.remove(cacheKey(spark, path))

  /** `flavor` names the encode variant when an index family has more
    * than one (e.g. direct vs residual PQ codes) — it is part of the
    * index identity, so maintenance paths validate it via
    * [[requireFlavor]] instead of trusting caller discipline.
    * `segments` lists the directories (relative to `path`, or
    * absolute) whose tables a reader must union — order is the append
    * order, oldest first. `tombstones` lists delete-marker directories
    * the same way: a delete is a new tombstone dir + a manifest
    * listing it, never a data rewrite (the LSM delete stance); readers
    * subtract the union of listed tombstone ids, and compaction is
    * what applies them physically.
    */
  def write(
      spark: SparkSession, path: String, version: Int = 1, flavor: String = "",
      segments: Seq[String] = Seq.empty, tombstones: Seq[String] = Seq.empty): Unit = {
    spark.range(1).select(
        lit(version).as("format_version"), lit(flavor).as("flavor"),
        typedLit(segments).as("segments"),
        typedLit(tombstones).as("tombstones"))
      .write.mode("overwrite").parquet(s"$path/manifest")
    invalidate(spark, path)
  }

  /** The manifest's segment list resolved to full paths: relative
    * entries anchor at `path` (the manifest's own root), absolute ones
    * (leading '/' or a scheme://) pass through — how an incrementally
    * updated index at a fresh root references the base generation's
    * segments without copying a byte of them.
    */
  def segmentPaths(spark: SparkSession, path: String): Seq[String] =
    handle(spark, path).segments

  /** The manifest's tombstone-directory list, resolved like
    * [[segmentPaths]]. Reads the column defensively: a manifest
    * written before deletes existed simply has none.
    */
  def tombstonePaths(spark: SparkSession, path: String): Seq[String] =
    handle(spark, path).tombstones

  def resolve(root: String, entry: String): String =
    if (new org.apache.hadoop.fs.Path(entry).isAbsolute) entry else s"$root/$entry"

  /** Fully-qualified forms of `paths` — what a maintenance operation
    * must write into a NEW manifest when it carries another root's
    * segments/tombstones by reference: a relative base index path
    * ("rel/base") resolves to a still-relative segment entry, which a
    * reader of the new manifest would re-anchor at the NEW root and
    * crash (or silently read a wrong directory). Qualification makes
    * carried references root-independent once and forever.
    */
  def qualify(spark: SparkSession, paths: Seq[String]): Seq[String] =
    paths.map { s =>
      val p = new org.apache.hadoop.fs.Path(s)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(p).toString
    }

  /** The sequenced tombstone mask relation shared by every segmented
    * index family — ONE implementation of the LSM sequencing rule, so
    * the BM25 and IVF-PQ tiers cannot drift: one row per tombstoned id
    * with `__ts_up` = the per-id MAX of each delete's `up_to` (the
    * index's segment COUNT at delete time). A tombstone masks exactly
    * the segments that existed when the delete was published: a later
    * re-add lands in a NEW segment whose ordinal is >= up_to and
    * serves cleanly (a bare id mask would wrongly swallow it), and a
    * doc deleted AGAIN after a re-add gets a later horizon that covers
    * both generations — which is why MAX is the right merge.
    * Delta-sized: rows = deleted ids. None when the index has no
    * tombstones, so no-deletes plans carry zero extra operators.
    */
  def tombstoneRel(
      spark: SparkSession, tsPaths: Seq[String], idCol: String): Option[
        org.apache.spark.sql.DataFrame] =
    if (tsPaths.isEmpty) None
    else Some(spark.read.parquet(tsPaths.map(t => s"$t/ids"): _*)
      .groupBy(col(idCol)).agg(max("up_to").as("__ts_up")))

  /** One per-segment table read with each row's segment ordinal
    * (`__seg`) riding along — the shape [[maskLive]] needs. Per-path
    * reads keep multi-root partitioned directories legal (a single
    * multi-path scan would infer one partition spec across roots and
    * refuse), and filter pushdown still reaches every per-segment scan
    * (Catalyst pushes through Project-of-literal and Union).
    */
  /** The columns a segment generation may LEGITIMATELY lack, per
    * table — the sanctioned format-evolution cases, padded explicitly
    * as typed nulls before a STRICT union. Everything else refuses:
    * an unexpected missing column (a partial write, external
    * truncation, a foreign tool's rewrite) is corruption the union is
    * a tripwire for, not evolution to read through as silent nulls.
    * Today's only entry: doclen's content_hash fingerprint — an index
    * built before the column existed and updated after carries both
    * segment shapes, and null = "unknown" is exactly the audit's
    * pinned semantics for a fingerprint that was never recorded.
    */
  private val optionalSegColumns
      : Map[String, Seq[(String, org.apache.spark.sql.types.DataType)]] =
    Map("doclen" -> Seq("content_hash" -> org.apache.spark.sql.types.LongType))

  def segTableOrd(
      spark: SparkSession, segs: Seq[String], table: String): org.apache.spark.sql.DataFrame = {
    val optional = optionalSegColumns.getOrElse(table, Seq.empty)
    segs.zipWithIndex.map { case (s, i) =>
      val df = spark.read.parquet(s"$s/$table").withColumn("__seg", lit(i))
      optional.foldLeft(df) { case (d, (c, t)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(t))
      }
    }.reduce(_.unionByName(_))
  }

  /** `rows` (a [[segTableOrd]] relation) minus the tombstone-masked
    * ones: a row dies iff its id is tombstoned AND its segment
    * predates that tombstone's horizon. No join hint — tombstones are
    * usually tiny (Spark broadcasts them from stats), but a
    * mass-deletion batch must be allowed to hash-join.
    */
  def maskLive(
      rows: org.apache.spark.sql.DataFrame,
      ts: Option[org.apache.spark.sql.DataFrame],
      idCol: String): org.apache.spark.sql.DataFrame =
    ts.fold(rows)(t => rows.join(t, Seq(idCol), "left_outer")
        .where(col("__ts_up").isNull || col("__seg") >= col("__ts_up"))
        .drop("__ts_up"))
      .drop("__seg")

  /** The next free generation name under `segments/` — zero-padded so
    * listings sort in append order. Deterministic (count-derived, no
    * clock) and collision-checked against the CURRENT list, which is
    * all a linear maintenance chain needs.
    */
  def nextSegmentName(existing: Seq[String]): String =
    nextName(existing, "seg")

  /** [[nextSegmentName]] for tombstone directories (`ts-NNNNN`). */
  def nextTombstoneName(existing: Seq[String]): String =
    nextName(existing, "ts")

  private def nextName(existing: Seq[String], prefix: String): String = {
    val taken = existing.map(p => p.substring(p.lastIndexOf('/') + 1)).toSet
    Iterator.from(existing.size).map(i => f"$prefix%s-$i%05d").find(!taken(_)).get
  }

  def clear(spark: SparkSession, path: String): Unit = {
    val (fs, p) = manifestDir(spark, path)
    if (fs.exists(p)) fs.delete(p, true)
    invalidate(spark, path)
  }

  /** Fails loudly when no complete index sits at `path`, or when the
    * index on disk predates the table set the caller needs
    * (`minVersion`): a maintenance path that reads a table an older
    * build never wrote must say "rebuild", not die mid-update with an
    * opaque missing-parquet error. `what` names the index flavor in
    * the error (e.g. "BM25", "IVF-PQ").
    */
  def requirePresent(
      spark: SparkSession, path: String, what: String, minVersion: Int = 1): Unit =
    requireVersion(handle(spark, path, what), path, what, minVersion)

  /** The [[requirePresent]] version check on an ALREADY-loaded handle —
    * so a caller that needs presence + version + segments + tombstones
    * + flavor resolves the handle ONCE (one fingerprint listing per
    * call, one parquet read per generation) instead of once per
    * helper. On object stores every extra resolution is a listing
    * round trip, on the surfaces this cache exists to make cheap.
    */
  /** Refuses a maintenance-round output root that overlaps the index
    * being maintained or ANY generation it carries by reference. The
    * failure this blocks: a scheduler loop that reuses one outRoot
    * across rounds feeds round N's compacted output back as round
    * N+1's base — the new round's delete/update manifests then carry
    * `outRoot/compacted/segments/...` by reference, and when the
    * policy trips again, compaction READS those segments while
    * overwriting the very same directory (Spark's cannot-overwrite-a-
    * path-being-read error at best, silent corruption at worst). Each
    * round must publish under a FRESH root; this makes the contract
    * loud instead of leaving it to scheduler discipline.
    */
  def requireDisjointRoot(
      spark: SparkSession, indexPath: String, outRoot: String, what: String): Unit = {
    val h = handle(spark, indexPath, what)
    val out = qualifiedPath(spark, outRoot)
    val carried = qualify(spark, indexPath +: (h.segments ++ h.tombstones))
    carried.find(p => p == out || p.startsWith(out + "/")).foreach { p =>
      throw new IllegalArgumentException(
        s"requirement failed: maintenance outRoot $outRoot is not fresh — the $what index " +
          s"at $indexPath (or a generation it carries by reference: $p) lives under it; " +
          "a tripped compaction would overwrite data it is reading. Publish each " +
          "maintenance round under a new root")
    }
  }

  def requireVersion(h: Handle, path: String, what: String, minVersion: Int): Unit =
    if (minVersion > 1) {
      require(h.version >= minVersion,
        s"$what index at $path is format version ${h.version} but this operation needs " +
          s">= $minVersion — rebuild the index with the current builder")
    }

  // ==================== serve pointer + generation GC ====================

  /** The pointer's FENCING EPOCH lives beside it as `<pointer>.epoch`
    * (a plain-text counter, cat-able) plus per-commit EPOCH MARKERS
    * `<pointer>.epoch.<N>`. The pointer lifecycle is
    * SINGLE-WRITER — one maintenance scheduler owns publish /
    * rollback / vacuum / retention on a pointer — and the epoch is
    * what turns a violation into a refusal instead of a lost update
    * or a deleted serving root: every mutating lifecycle operation
    * reads the epoch AT ENTRY (before it reads the pointer state its
    * decisions derive from) and CHECK-AND-BUMPS it at its commit
    * point, immediately before the first visible mutation. A
    * concurrent scheduler — or the classic zombie, stalled past its
    * schedule and resumed after its replacement took over — finds the
    * epoch moved and refuses, having changed NOTHING; the committed
    * winner's state stands. The bump itself is an EXCLUSIVE CREATE of
    * the next marker file: two racers that both read epoch N cannot
    * both commit N+1 — the filesystem hands exactly one of them the
    * marker and the other refuses having changed nothing. Exclusivity
    * is only as atomic as the store's create-no-overwrite: genuinely
    * atomic on HDFS (a NameNode namespace operation) and on `file:`
    * paths (routed to an O_EXCL `Files.createFile`, because Hadoop's
    * RawLocalFileSystem `create(overwrite = false)` is
    * check-then-create, not atomic); on object stores without an
    * atomic conditional create (plain S3A) the exclusive create is
    * best-effort check-then-create — the fence there still catches
    * every non-simultaneous violation (the stalled-zombie class) but
    * two truly simultaneous commits can both pass, so deployments on
    * such stores keep the single-scheduler contract by external
    * means. What remains is fencing, not a
    * lock: the fence serializes commit DECISIONS, not execution spans
    * — an operation that ENTERS after a vacuum's bump can still
    * overlap the vacuum's in-flight deletes — so within the documented
    * single-scheduler deployment the fence exists to catch
    * misconfiguration loudly, not to make concurrent schedulers safe.
    */
  private def epochPath(pointerPath: String): String = pointerPath + ".epoch"

  /** The committed epoch-marker numbers beside the pointer (the
    * exclusive-create commit records). The newest marker is never
    * deleted before a higher one exists, so their max never
    * understates the committed epoch; the counter file is the
    * human-readable floor that lets older markers be reclaimed.
    */
  private def epochMarkers(
      fs: org.apache.hadoop.fs.FileSystem, pointerPath: String): Seq[Long] = {
    val base = new org.apache.hadoop.fs.Path(epochPath(pointerPath))
    val dir = base.getParent
    val prefix = base.getName + "."
    if (dir == null || !fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toLong).toOption)
  }

  /** The pointer's current fencing epoch — 0 before any lifecycle
    * operation ever committed. Monotonic: every committed publish /
    * rollback / vacuum / retention round bumps it by one. The value is
    * the max of the counter file and the commit markers, so a crash
    * between the marker create and the counter rewrite still counts.
    */
  /** Paths whose epoch-floor file was seen with unparseable content —
    * the warn-once guard of [[readEpoch]]'s corruption diagnostic.
    */
  private val garbledFloorWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def readEpoch(spark: SparkSession, pointerPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(epochPath(pointerPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the floor is CONVENIENCE, never the truth: the newest commit
    // marker always survives until a higher commit exists, so
    // max(markers) alone carries the committed epoch. Concurrent
    // commits' floor rewrites can therefore be tolerated failing in
    // ANY transient way here — momentarily absent (delete-then-rename
    // overwrite on the local FileContext), or paired with another
    // writer's .crc sidecar (ChecksumFs renames file and crc as two
    // steps) — floor 0 and the markers still answer correctly, and
    // the next commit rewrites a consistent floor.
    val floor =
      try {
        if (!fs.exists(p)) 0L
        else {
          val in = fs.open(p)
          val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          try s.trim.toLong
          catch { case _: NumberFormatException =>
            // PERSISTENTLY garbled content is not one of the tolerated
            // transient races (those are absence/crc-sidecar shapes, IO
            // errors): the answer stays correct (markers carry the
            // committed epoch), but out-of-band corruption must remain
            // observable — warn once per path, not once per fence read
            if (garbledFloorWarned.add(p.toString))
              System.err.println(
                s"[readEpoch] epoch floor at $p exists but does not parse " +
                  s"('${s.trim.take(40)}') — serving from commit markers; the next " +
                  "committed operation rewrites a consistent floor")
            0L
          }
        }
      } catch { case scala.util.control.NonFatal(_) => 0L }
    (floor +: epochMarkers(fs, pointerPath)).max
  }

  /** Test seam: invoked with the pointer path immediately before every
    * fence check reads the epoch — the only way a deterministic spec
    * can interleave a racing publish at exactly the commit point.
    * Production never sets it.
    */
  private[graft] var onFenceCheck: String => Unit = _ => ()

  /** Second test seam: fires BETWEEN the fence's epoch read and its
    * exclusive-create commit — the window the pre-r19 read-then-rename
    * bump left open (two racers could both read N and both write N+1).
    * A spec interleaving a full racing commit here proves the
    * exclusive create hands the epoch to exactly one of them.
    */
  private[graft] var onFenceCommit: String => Unit = _ => ()

  private[operators] def checkAndBumpEpoch(
      spark: SparkSession, pointerPath: String, entryEpoch: Long, who: String): Unit = {
    onFenceCheck(pointerPath)
    val cur = readEpoch(spark, pointerPath)
    require(cur == entryEpoch,
      s"$who lost the pointer fence at $pointerPath: epoch moved $entryEpoch -> $cur — " +
        "a concurrent (or stalled-and-resumed) scheduler committed its own lifecycle " +
        "operation on this pointer after this one read its state, so this operation's " +
        "reads are stale. The pointer lifecycle is single-writer per pointer; the " +
        "losing side changed NOTHING — re-read the pointer and retry from the " +
        "current state")
    onFenceCommit(pointerPath)
    // the commit: EXCLUSIVE create of the next marker — two racers
    // that both passed the read check above get exactly one winner,
    // not two writers both renaming the same counter value. On local
    // paths the create goes through java.nio (O_EXCL — genuinely
    // atomic under thread/process concurrency) because Hadoop's
    // RawLocalFileSystem create(overwrite=false) is check-then-create;
    // the marker is an empty name-only file nothing reads back, so
    // skipping the checksummed writer loses nothing (no .crc sidecar
    // to drift). HDFS keeps the namespace-atomic fs.create path.
    val marker = new org.apache.hadoop.fs.Path(s"${epochPath(pointerPath)}.${entryEpoch + 1}")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def lostRace() = new IllegalArgumentException(
      s"$who lost the pointer fence at $pointerPath: a concurrent lifecycle " +
        s"operation committed epoch ${entryEpoch + 1} first (exclusive create of " +
        s"${marker.getName} refused). The pointer lifecycle is single-writer per " +
        "pointer; the losing side changed NOTHING — re-read the pointer and " +
        "retry from the current state")
    val markerQ = fs.makeQualified(marker)
    if (markerQ.toUri.getScheme == "file") {
      val local = java.nio.file.Paths.get(markerQ.toUri.getPath)
      // Hadoop's create auto-creates parents; match it (a first-ever
      // publish commits its epoch before any other file exists there)
      if (local.getParent != null) java.nio.file.Files.createDirectories(local.getParent): Unit
      try java.nio.file.Files.createFile(local): Unit
      catch { case _: java.nio.file.FileAlreadyExistsException => throw lostRace() }
    } else {
      try fs.create(marker, false).close()
      catch {
        case e: java.io.IOException =>
          if (fs.exists(marker)) throw lostRace() else throw e
      }
    }
    // floor rewrite + marker GC are housekeeping, not the commit: the
    // counter keeps the epoch cat-able and lets superseded markers be
    // reclaimed. Deleting only markers <= entryEpoch keeps the newest
    // marker alive until a HIGHER commit exists, so readEpoch's max
    // never understates the committed epoch even if a slow racer's
    // floor rewrite lands late (rename last-wins) or a crash skips it.
    // Best-effort BY CONSTRUCTION, so failures must not propagate: two
    // closely-spaced commits' floor rewrites can race on stores whose
    // overwrite-rename is delete-then-rename (the local FileContext),
    // and throwing HERE would report a COMMITTED operation as failed —
    // the epoch already moved. A skipped rewrite just leaves the floor
    // low until the next commit; the marker carries the truth.
    try writeAtomic(spark, epochPath(pointerPath), (entryEpoch + 1).toString)
    catch { case scala.util.control.NonFatal(_) => () }
    epochMarkers(fs, pointerPath).filter(_ <= entryEpoch).foreach { n =>
      try fs.delete(new org.apache.hadoop.fs.Path(s"${epochPath(pointerPath)}.$n"), false): Unit
      catch { case scala.util.control.NonFatal(_) => () } // best effort
    }
  }

  /** Atomically flip the SERVE POINTER at `pointerPath` to the index
    * at `indexRoot` — the missing handoff in the maintenance story:
    * every maintain round mints a FRESH root, so without a published
    * "current" location each consumer needs out-of-band coordination
    * to learn where tonight's generation landed. The pointer is a
    * one-line plain-text file holding the QUALIFIED index root
    * (cat-able from a shell), written to a temp name and renamed over
    * the destination in ONE filesystem metadata operation
    * (Options.Rename.OVERWRITE — atomic on POSIX and HDFS), so a
    * reader never observes a half-written pointer: it sees yesterday's
    * root or today's, nothing in between. The target index is resolved
    * through [[handle]] FIRST, so a pointer can never be flipped onto
    * a root that refuses to serve (missing manifest, severed carried
    * generation). Fenced: the publish check-and-bumps the pointer's
    * epoch before its first visible write, so a publisher racing
    * another lifecycle operation refuses instead of interleaving (see
    * [[readEpoch]]).
    */
  def publishPointer(
      spark: SparkSession, pointerPath: String, indexRoot: String,
      what: String = "segmented"): Unit =
    publishPointerFenced(spark, pointerPath, indexRoot, what,
      readEpoch(spark, pointerPath))

  /** [[publishPointer]] with the fence epoch read EARLIER by the
    * caller — how a long-running operation (an ingest round's
    * maintain, a rollback's history read) extends the fence across
    * its whole read-decide-write span instead of just the final flip:
    * a pointer movement anywhere inside the span moves the epoch and
    * the publish refuses.
    */
  private[operators] def publishPointerFenced(
      spark: SparkSession, pointerPath: String, indexRoot: String,
      what: String, entryEpoch: Long): Unit = {
    handle(spark, indexRoot, what): Unit
    val newQ = qualifiedPath(spark, indexRoot)
    val dst = new org.apache.hadoop.fs.Path(pointerPath)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // record the superseded root in the GENERATION HISTORY before the
    // flip: history is what [[rollbackPointer]] rolls back onto and
    // what [[retainGenerations]] retires, so it must never miss a
    // generation that actually served — and it must never DROP one in
    // a crash window either, which is why the write is two-phase. The
    // pre-flip write appends the about-to-be-superseded root but KEEPS
    // the publish target if history already holds it (the rollback /
    // roll-forward case): pruning the target before the flip would
    // orphan its generation if the flip crashes — pointer still
    // serving the old root, target in neither pointer nor history, so
    // retention could never reclaim it and rollback could not find it.
    // The prune runs AFTER the flip instead. Either crash window
    // leaves at worst the CURRENT root listed in its own history —
    // benign: every consumer filters entries equal to the current
    // pointer, and the next successful publish prunes the residue.
    val prev = if (fs.exists(dst)) Some(readPointer(spark, pointerPath)) else None
    // commit point: everything above is reads and target validation;
    // the history append below is the first visible mutation
    checkAndBumpEpoch(spark, pointerPath, entryEpoch, "publishPointer")
    prev.filter(_ != newQ).foreach { p =>
      val hist = readHistory(spark, pointerPath)
      writeAtomic(spark, historyPath(pointerPath),
        (hist.filterNot(_ == p) :+ p).mkString("\n"))
    }
    writeAtomic(spark, pointerPath, newQ)
    val hist = readHistory(spark, pointerPath)
    if (hist.contains(newQ))
      writeAtomic(spark, historyPath(pointerPath),
        hist.filterNot(_ == newQ).mkString("\n"))
  }

  /** Write a small metadata file atomically: temp name, then ONE
    * rename over the destination (Options.Rename.OVERWRITE — atomic on
    * POSIX and HDFS), so a reader sees the old content or the new,
    * never a torn write. A failed write or rename deletes its temp —
    * a retrying scheduler must not accrete one orphan per attempt,
    * and nothing else (vacuum included) cleans them.
    */
  private[operators] def writeAtomic(spark: SparkSession, path: String, content: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dst = new org.apache.hadoop.fs.Path(path)
    val fs = dst.getFileSystem(conf)
    val tmp = fs.makeQualified(new org.apache.hadoop.fs.Path(
      path + ".tmp-" + java.util.UUID.randomUUID()))
    try {
      val out = fs.create(tmp, true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
        .rename(tmp, fs.makeQualified(dst), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case e: Throwable =>
        try { if (fs.exists(tmp)) fs.delete(tmp, false): Unit }
        catch { case _: Throwable => () }
        throw e
    }
  }

  private def historyPath(pointerPath: String): String = pointerPath + ".history"

  /** The pointer-side DURABLE record of the deployment's nightly
    * round-marker path — `<pointerPath>.nightly`, one line, cat-able.
    * Written by [[Nightly.run]] at entry whenever the deployment runs
    * marker-protected, so the half-swap ingest refusal rides with the
    * pointer itself: an intraday stream launched through a standard
    * wrapper with NO marker argument still discovers the marker from
    * the pointer it already reads and refuses under a standing crashed
    * swap ([[ingestRound]]) — the protection a deployment most needs
    * is no longer the easiest to forget. The latest nightly's config
    * wins (a deliberate marker-path move propagates on the next run);
    * deployments that never ran a marker-protected nightly have no
    * record and no check, exactly the pre-config behavior.
    */
  private def nightlyConfigPath(pointerPath: String): String = pointerPath + ".nightly"

  private[operators] def readNightlyMarkerConfig(
      spark: SparkSession, pointerPath: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(nightlyConfigPath(pointerPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      Some(s.trim).filter(_.nonEmpty)
    }
  }

  private[operators] def writeNightlyMarkerConfig(
      spark: SparkSession, pointerPath: String, markerPath: String): Unit =
    // skip the rewrite when current — the config changes when an
    // operator deliberately moves the marker path, not nightly
    if (!readNightlyMarkerConfig(spark, pointerPath).contains(markerPath))
      writeAtomic(spark, nightlyConfigPath(pointerPath), markerPath)

  /** The pointer's GENERATION HISTORY: the distinct roots this pointer
    * previously served, oldest first, current root excluded. Written
    * beside the pointer as `<pointerPath>.history` (one qualified root
    * per line, cat-able); empty when the pointer has never been
    * superseded. Entries stay until [[retainGenerations]] retires them
    * or [[rollbackPointer]] rolls back onto them.
    */
  def readHistory(spark: SparkSession, pointerPath: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(historyPath(pointerPath))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else {
      val in = fs.open(p)
      val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      s.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
    }
  }

  /** Flip the pointer BACK onto the most recent previous generation —
    * the bad-round escape hatch: tonight's generation misbehaves in
    * ways the audit gate cannot see (a ranking regression, a bad
    * codebook), and yesterday's root is still on disk because
    * [[retainGenerations]] keeps a rollback window. The abandoned
    * (rolled-back-from) root moves into the history like any
    * superseded generation — roll forward by re-publishing it, or let
    * the next retention round vacuum it. Refuses when the history
    * holds no previous generation; the target is handle-validated by
    * the publish, so a rollback can never land on a root that refuses
    * to serve. Returns the root now serving.
    */
  def rollbackPointer(
      spark: SparkSession, pointerPath: String, what: String = "segmented"): String = {
    // the fence spans the history read too: a publish landing between
    // the read and the flip would make prev.last a stale target
    val fence = readEpoch(spark, pointerPath)
    val current = readPointer(spark, pointerPath)
    val prev = readHistory(spark, pointerPath).filterNot(_ == current)
    require(prev.nonEmpty,
      s"rollbackPointer: the pointer at $pointerPath has no previous generation in its " +
        "history — nothing to roll back onto (retention may have vacuumed it)")
    publishPointerFenced(spark, pointerPath, prev.last, what, fence)
    prev.last
  }

  /** The index root the pointer currently serves; refuses loudly when
    * no pointer has ever been published. Compose with the tier's read
    * entry points: `SideIndex.read(spark, readPointer(...), ...)`.
    */
  def readPointer(spark: SparkSession, pointerPath: String): String = {
    val p = new org.apache.hadoop.fs.Path(pointerPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no serve pointer at $pointerPath — publishPointer has never run (or the " +
        "pointer was deleted out-of-band)")
    val in = fs.open(p)
    val s = try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    s.trim
  }

  /** REACHABILITY-AWARE generation GC — the only safe way to reclaim
    * superseded maintenance roots: segments and tombstones are carried
    * BY REFERENCE across roots (an updated index's manifest points
    * back at the base generation's directories), so deleting a retired
    * root wholesale can sever data the CURRENT index still lists —
    * root-level cleanup is wrong by construction, which is why nothing
    * short of this entry point should ever delete one.
    *
    * The reachable set is computed from the pointer's current handle:
    * the served root itself plus every segment/tombstone directory its
    * manifest lists (qualified). Each retired root is then either
    *  - FULLY UNREACHABLE: no reachable path lives under it — deleted
    *    wholesale (a root owns at most one data directory plus its
    *    manifest, so partial-root garbage does not exist);
    *  - still holding referenced data (or the served root itself, or
    *    an ancestor/descendant of it): REFUSED loudly, with the
    *    pointer into it named — run the tier's compaction to re-home
    *    the data into a self-contained generation first;
    *  - already absent: skipped (a re-run after a crash mid-vacuum is
    *    a no-op, not an error).
    *
    * Returns one row per retired root: (root, n_files_deleted,
    * bytes_deleted) — zeros for the already-absent. Pure filesystem
    * metadata plus the deletes; nothing scans data. Fenced: the
    * reachable set is computed from a pointer read the epoch fence
    * guards — a flip COMMITTING between that read and the vacuum's
    * own commit moves the epoch (the bump is an exclusive create, so
    * the race has exactly one winner), and the vacuum refuses having
    * deleted nothing. The fence serializes commit decisions, not
    * execution spans: a flip that ENTERS after the vacuum committed
    * can still overlap its in-flight deletes — best-effort
    * misconfiguration detection, not a lock; the single-writer
    * contract is what makes vacuum safe (see [[readEpoch]]).
    */
  def vacuum(
      spark: SparkSession, pointerPath: String, retiredRoots: Seq[String],
      what: String = "segmented", alsoServing: Seq[String] = Nil): org.apache.spark.sql.DataFrame =
    vacuumFenced(spark, pointerPath, retiredRoots, what, alsoServing,
      Some(readEpoch(spark, pointerPath)))

  /** [[vacuum]] with the fence already read (or owned) by the caller:
    * `fence = Some(e)` check-and-bumps after validation, immediately
    * before the first delete; `fence = None` means the caller already
    * bumped the epoch this round ([[retainGenerations]]) and owns the
    * commit.
    */
  private def vacuumFenced(
      spark: SparkSession, pointerPath: String, retiredRoots: Seq[String],
      what: String, alsoServing: Seq[String],
      fence: Option[Long]): org.apache.spark.sql.DataFrame = {
    val current = readPointer(spark, pointerPath)
    // `alsoServing` extends the reachable set with generations that
    // must SURVIVE the vacuum even though nothing points at them —
    // [[retainGenerations]]'s rollback window: each is loaded like the
    // served root (a kept generation that cannot serve is a refusal,
    // not a skip) and contributes its root + carried directories
    val serving = (current +: alsoServing).map { root =>
      val h = handle(spark, root, what)
      (qualifiedPath(spark, root), root, h)
    }
    val reachable = serving.flatMap { case (_, root, h) =>
      qualify(spark, root +: (h.segments ++ h.tombstones))
    }
    val conf = spark.sparkContext.hadoopConfiguration
    // validate EVERY root before deleting ANY: a refusal on the last
    // root after the first was already deleted would report nothing
    // about the bytes it removed — "a refused vacuum deletes NOTHING"
    // must hold regardless of argument order
    val qualified = retiredRoots.map { r =>
      val rq = qualifiedPath(spark, r)
      serving.foreach { case (sq, root, _) =>
        require(rq != sq && !sq.startsWith(rq + "/") && !rq.startsWith(sq + "/"),
          s"vacuum: $r is (or contains, or sits inside) the ${
            if (root == current) s"SERVED root $current"
            else s"RETAINED rollback generation $root"} — " +
            "flip the pointer (or shrink the retention window) before retiring it")
      }
      val held = reachable.filter(p => p == rq || p.startsWith(rq + "/"))
      require(held.isEmpty,
        s"vacuum: retired root $r still holds generation data a serving or retained " +
          s"index carries by reference (${held.take(3).mkString(", ")}) — compact the " +
          "index to re-home the data into a self-contained generation before retiring " +
          "this root")
      rq
    }
    // commit point: validation is complete, deletes follow — a racing
    // pointer flip since the entry read invalidates the reachable set
    // this vacuum derived its verdicts from
    if (qualified.nonEmpty)
      fence.foreach(f => checkAndBumpEpoch(spark, pointerPath, f, "vacuum"))
    val rows = qualified.map { rq =>
      val rp = new org.apache.hadoop.fs.Path(rq)
      val fs = rp.getFileSystem(conf)
      if (!fs.exists(rp)) (rq, 0L, 0L)
      else {
        val summary = fs.getContentSummary(rp)
        require(fs.delete(rp, true), s"vacuum: failed to delete $rq")
        invalidate(spark, rq)
        (rq, summary.getFileCount, summary.getLength)
      }
    }
    spark.createDataFrame(rows).toDF("root", "n_files_deleted", "bytes_deleted")
  }

  /** RETENTION-POLICY GC over the pointer's own generation history —
    * the one-call form a scheduler actually runs nightly: keep the
    * `keep` most recent superseded generations as a [[rollbackPointer]]
    * window and [[vacuum]] older history entries, HOLDING (not
    * refusing) any that something surviving still carries by
    * reference — the normal LSM state between compactions, so
    * retention composes with every maintain round, not just
    * compaction nights. Reachability is transitive the way survival
    * needs it to be: the served root and the kept window must stay
    * valid indexes, so what THEY reference survives; a held
    * generation must stay deletable-later-as-a-unit, so what IT
    * references survives too (newest-first accumulation). Held
    * entries stay in the history and fall out on a later round once a
    * compaction re-homes the data that pinned them.
    *
    * Crash-safe: deletes go through [[vacuum]] (which re-validates
    * every retired root against the surviving set — belt and
    * suspenders) and the history file is rewritten only after they
    * succeed; a crash between the two leaves retired roots listed but
    * absent, which the next round reports as `absent` and drops —
    * WHEREVER they land: an absent entry that `keep` was raised over
    * since the crash (now inside the kept window) heals the same way
    * instead of wedging the round on a missing-manifest load. Fenced
    * like [[vacuum]]. Returns one row per history entry outside the
    * window (plus one per healed absent entry anywhere):
    * (root, status = vacuumed | held | absent, n_files_deleted,
    * bytes_deleted).
    */
  /** A maintain round mints its steps under ONE outRoot
    * (`outRoot/deleted|updated|compacted` — the only roots the
    * maintain entry points publish), and the pointer history records
    * the SERVED step; retiring that step by name would leak the
    * round's intermediate roots (an uncompacted round's tombstone dir
    * lives under `outRoot/deleted`, a sibling of the served
    * `outRoot/updated`). When a history entry is a step root whose
    * parent holds ONLY step roots, retention operates on the whole
    * round root — unless a serving generation sits inside that parent
    * (never true under the fresh-outRoot contract, refused into the
    * narrow form anyway) or anything else was placed there (a stray
    * file or foreign directory falls back to the entry itself:
    * retention must never delete what it cannot attribute to the
    * round).
    */
  private def expandRoundRoot(
      spark: SparkSession, entry: String, servingQ: Seq[String]): String = {
    val steps = Set("deleted", "updated", "compacted")
    val p = new org.apache.hadoop.fs.Path(entry)
    val parent = p.getParent
    if (parent == null || !steps.contains(p.getName)) entry
    else {
      val fs = parent.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(parent)) entry
      else {
        val kids = fs.listStatus(parent)
        val pq = qualifiedPath(spark, parent.toString)
        val servingInside = servingQ.exists(s => s == pq || s.startsWith(pq + "/"))
        // the round's own artifacts: step directories plus the ingest
        // round's `chainbase` record (a file) — anything else is
        // foreign and blocks the expansion
        if (kids.nonEmpty && !servingInside &&
          kids.forall(st =>
            (st.isDirectory && steps.contains(st.getPath.getName)) ||
              (st.isFile && st.getPath.getName == "chainbase")))
          parent.toString
        else entry
      }
    }
  }

  /** `pinned` extends the surviving set with roots something OUTSIDE
    * this pointer's own lifecycle still serves — the [[Nightly]] use:
    * the deployment snapshot a pre-swap reader resolved can name a
    * root that intraday ingest pushed several generations deep in the
    * history, where a count-based keep window alone would reclaim it;
    * pinning the superseded snapshot's root for the round that
    * replaces it gives those readers the same one-generation grace the
    * keep window gives pointer readers. An already-absent pinned root
    * is skipped (the grace is moot once it is gone).
    */
  def retainGenerations(
      spark: SparkSession, pointerPath: String, keep: Int,
      what: String = "segmented",
      pinned: Seq[String] = Nil): org.apache.spark.sql.DataFrame = {
    require(keep >= 0, s"retainGenerations: keep must be >= 0, got $keep")
    val fence = readEpoch(spark, pointerPath)
    val current = readPointer(spark, pointerPath)
    val histAll = readHistory(spark, pointerPath).filterNot(_ == current)
    // heal ABSENT entries first, wherever they land: a prior round's
    // crash between vacuum and history rewrite leaves entries whose
    // roots are gone, and a raised `keep` can pull one INSIDE the kept
    // window — where a handle load would wedge retention with a raw
    // missing-manifest error until keep is shrunk again. An absent
    // root can never be held, vacuumed, or rolled back onto: report
    // it `absent` and drop it from the history below.
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val (hist, absent) = histAll.partition { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      p.getFileSystem(hadoopConf).exists(p)
    }
    val kept = hist.takeRight(keep)
    val candidates = hist.dropRight(keep)
    // only roots from THIS pointer's own lifecycle can be retired
    // here, so foreign pins (a multi-tier snapshot's other tiers) drop
    // up front — no cross-tier handle loads on what is a per-micro-
    // batch path under streaming ingest
    val ownRoots = (current +: histAll).map(qualifiedPath(spark, _)).toSet
    // a pin degrades on the PERMANENT refusals — root absent, or
    // manifest gone (IllegalArgumentException: the grace is moot, the
    // reader it protects is already broken) — but any OTHER load
    // failure (a transient IO blip) PROPAGATES: silently un-pinning on
    // a flaky read would make a live snapshot root vacuum-eligible.
    // Kept-window entries stay strict — this pointer's own rollback
    // targets must refuse loudly.
    val pinnedLive = pinned
      .filter(r => ownRoots(qualifiedPath(spark, r)))
      .filter { r =>
        val p = new org.apache.hadoop.fs.Path(r)
        p.getFileSystem(hadoopConf).exists(p) &&
          (try { handle(spark, r, what); true }
          catch { case _: IllegalArgumentException => false })
      }
    val survivors = (kept ++ pinnedLive).distinct
    var reachable = (current +: survivors).flatMap { r =>
      val h = handle(spark, r, what)
      qualify(spark, r +: (h.segments ++ h.tombstones))
    }.toSet
    val servingQ = (current +: survivors).map(qualifiedPath(spark, _))
    // newest-first: a candidate referenced by anything that survives
    // is HELD, and what it references must then survive as well — the
    // hold test runs over the candidate's whole ROUND root, so a
    // reference into a sibling step (the round's tombstone dir) pins
    // it too. An ABSENT candidate (a prior round crashed between
    // delete and history rewrite) can never be held — a surviving
    // index referencing an absent root would have refused its handle
    // load
    val held = scala.collection.mutable.LinkedHashSet.empty[String]
    candidates.reverse.foreach { r =>
      val rq = qualifiedPath(spark, expandRoundRoot(spark, r, servingQ))
      if (reachable.exists(p => p == rq || p.startsWith(rq + "/"))) {
        held += r
        // a held candidate whose manifest is gone (a partial cleanup's
        // residue) cannot extend reachability — hold it WITHOUT the
        // extension rather than wedging every subsequent round; its
        // carried bases survive only if something readable still
        // references them. Transient read failures still propagate
        // (refusing retention is safe; deleting on a flaky read is not).
        try {
          val h = handle(spark, r, what)
          reachable ++= qualify(spark, r +: (h.segments ++ h.tombstones))
        } catch { case _: IllegalArgumentException => () }
      }
    }
    val retired = candidates.filterNot(held.contains)
    // the vacuum carries this round's fence and bumps it before its
    // deletes; an absent-only healing round has no deletes, so it
    // commits its history rewrite under its own bump
    val report = vacuumFenced(spark, pointerPath,
      retired.map(expandRoundRoot(spark, _, servingQ)), what,
      alsoServing = survivors ++ held.toSeq,
      fence = if (retired.nonEmpty) Some(fence) else None)
    if (retired.nonEmpty || absent.nonEmpty) {
      if (retired.isEmpty)
        checkAndBumpEpoch(spark, pointerPath, fence, "retainGenerations")
      writeAtomic(spark, historyPath(pointerPath),
        hist.filterNot(retired.contains).mkString("\n"))
    }
    import org.apache.spark.sql.functions.{col, lit, when}
    val extraRows =
      held.toSeq.map(r => (qualifiedPath(spark, r), "held", 0L, 0L)) ++
        absent.map(r => (qualifiedPath(spark, r), "absent", 0L, 0L))
    report
      .withColumn("status",
        when(col("n_files_deleted") > 0L, lit("vacuumed")).otherwise(lit("absent")))
      .select(col("root"), col("status"), col("n_files_deleted"), col("bytes_deleted"))
      .unionByName(
        spark.createDataFrame(extraRows)
          .toDF("root", "status", "n_files_deleted", "bytes_deleted"))
  }

  // ==================== streaming ingest round ====================

  /** The upsert-batch validation shared by every family's CDC ingest
    * ([[Retrieval.ingestUpsertBatch]] and its vector/side siblings):
    * ONE bounded aggregate over the batch refuses — BEFORE any state
    * change or filtering that could hide a malformed row — null ids
    * (an upsert row must name what it replaces), null payloads when
    * the family has a single payload column (a null payload looks
    * like a deletion, and silently skipping it would leave the STALE
    * version serving — deletions belong to the maintenance tier), and
    * duplicate ids (no version column orders them; last-write-wins
    * under Spark's unordered batches would be a nondeterministic lie
    * — collapse versions upstream, e.g. through a `latest_per_key`
    * step). `who` names the entry point in the error.
    */
  private[operators] def requireUpsertBatch(
      batch: org.apache.spark.sql.DataFrame, batchId: Long,
      idCol: String, payloadCol: Option[String], who: String): Unit = {
    val aggs = Seq(
      count(lit(1)).as("n"),
      count(when(col(idCol).isNull, 1)).as("n_null_id"),
      countDistinct(col(idCol)).as("n_ids")) ++
      payloadCol.map(p => count(when(col(p).isNull, 1)).as("n_null_payload"))
    val chk = batch.agg(aggs.head, aggs.tail: _*).head()
    val (n, nNullId, nIds) = (chk.getLong(0), chk.getLong(1), chk.getLong(2))
    require(nNullId == 0L,
      s"$who: batch $batchId carries $nNullId rows with a null '$idCol' — an upsert " +
        "row must name the row it replaces")
    payloadCol.foreach { p =>
      val nNullPayload = chk.getLong(3)
      require(nNullPayload == 0L,
        s"$who: batch $batchId carries $nNullPayload rows with a null '$p' — " +
          "skipping them would leave the stale version serving; route deletions " +
          s"through the maintenance tier, not null-'$p' upserts")
    }
    require(n == nIds,
      s"$who: batch $batchId carries ${n - nIds} duplicate '$idCol' rows — no version " +
        "column orders them, so last-write-wins would be nondeterministic; collapse " +
        "versions upstream first")
  }

  /** ONE streaming micro-batch's ingest round, shared by every index
    * family (the tier wrappers — [[Retrieval.ingestIndexBatch]],
    * [[Similarity.ingestPqIndexBatch]], [[SideIndex.ingestBatch]] —
    * supply only the filtered rows and the maintain closure): append
    * the batch as an O(batch) increment generation on whatever the
    * serve pointer currently publishes and flip the pointer.
    * Idempotent under Structured Streaming's `foreachBatch` replay
    * contract via the batchId-keyed root (`ingestRoot/batch-<id>`):
    *
    *  - COMMITTED (a manifest stands under the batch root): the crash
    *    fell between commit and pointer flip — re-publish the pointer
    *    and stop. A compaction that crashed after its update step
    *    committed leaves uncommitted `compacted` residue beside a
    *    valid `updated` chain: delete the residue (nothing references
    *    an uncommitted root), serve the valid chain, and let the
    *    policy re-evaluate next batch.
    *  - HALF-WRITTEN (the batch root exists, no readable manifest —
    *    absent OR torn mid-write): delete the residue wholesale and
    *    re-run — manifest-last means nothing serves it. Exception: an
    *    unreadable manifest under the root the pointer SERVES is
    *    out-of-band corruption and refuses loudly instead of being
    *    auto-deleted by a retrying stream.
    *  - FRESH: run the round.
    *
    * An EMPTY batch publishes nothing. With `keepGenerations` set,
    * every round ends with [[retainGenerations]], so a long-running
    * ingest's disk footprint is bounded by the compaction cadence,
    * not the batch count.
    */
  /** `snapshotPath` names the deployment snapshot (if any) whose roots
    * this round's retention must PIN: intraday batches push the root
    * the nightly snapshot names several generations deep, where the
    * keep window alone would reclaim it from under every snapshot
    * reader hours before the next nightly republish. The whole
    * snapshot's root set is pinned — other tiers' roots merely extend
    * the reachable set harmlessly, and a torn/absent pinned root
    * degrades instead of wedging (see retainGenerations).
    *
    * `nightlyMarkerPath` names the [[Nightly]] round marker (if the
    * deployment runs a marker-protected nightly); the round ALSO
    * discovers the marker path recorded beside the pointer by every
    * marker-protected [[Nightly.run]] ([[readNightlyMarkerConfig]]),
    * so the check holds even for call sites that never thread the
    * parameter: a STANDING marker
    * that names this pointer means a crashed swap left the deployment
    * half-flipped, and the round REFUSES up front — intraday ingest
    * chaining new generations on the mixed state would move the
    * pointer off the marker's recorded base, after which
    * [[Nightly.recover]] refuses to heal and the nightly wedges until
    * an operator reconciles by hand. Refusing here keeps the heal
    * automatic: run recover (or the next nightly, which heals at
    * entry), then resume the stream.
    */
  /** The chainbase record format this builder writes. v1 is one line:
    * `graft-chainbase-v1\t<qualified base root>`. A bare qualified
    * path with no stamp is the first (r18) format — semantically
    * identical to v1, so it parses; any HIGHER stamp was written by a
    * newer builder whose replay semantics this one may not share, and
    * refuses loudly instead of applying the wrong era's rules.
    */
  private val ChainbaseVersion = 1

  private def parseChainbase(content: String, outRoot: String): String =
    if (!content.startsWith("graft-chainbase-v")) content // pre-stamp (r18) record
    else content.split("\t", 2) match {
      case Array(tag, base) =>
        // an unparsable tag is CORRUPTION, not a newer writer — the
        // refusal is equally loud either way (nothing is mutated), but
        // the remedy differs: upgrade the builder vs restore the record
        val v = scala.util.Try(tag.stripPrefix("graft-chainbase-v").toInt).toOption
          .filter(_ >= 1) // v0 never existed: a sub-1 stamp is garbling too
          .getOrElse(throw new IllegalArgumentException(
            s"ingestRound: malformed chainbase record at $outRoot/chainbase: " +
              s"version tag '$tag' does not parse — the record is corrupt or " +
              "garbled, not a recognizable format version. Restore the batch " +
              "root (or retire it through ServePointer.vacuum) before resuming " +
              "the ingest"))
        require(v <= ChainbaseVersion,
          s"ingestRound: the chainbase record at $outRoot/chainbase carries format " +
            s"'$tag', newer than this builder understands (max " +
            s"v$ChainbaseVersion) — replaying it here could apply superseded replay " +
            "semantics. Upgrade the builder before resuming the ingest")
        base.trim
      case _ => throw new IllegalArgumentException(
        s"ingestRound: malformed chainbase record at $outRoot/chainbase: '$content'")
    }

  private[operators] def ingestRound(
      spark: SparkSession,
      rows: org.apache.spark.sql.DataFrame,
      batchId: Long,
      pointerPath: String,
      ingestRoot: String,
      what: String,
      maintain: (org.apache.spark.sql.DataFrame, String, String) => String,
      keepGenerations: Option[Int],
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None): Unit = {
    val outRoot = s"$ingestRoot/batch-$batchId"
    val rootP = new org.apache.hadoop.fs.Path(outRoot)
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the crashed-swap check runs against the explicitly passed marker
    // path AND the one the deployment recorded beside the pointer
    // (readNightlyMarkerConfig — written by every marker-protected
    // Nightly.run): a stream wrapper that never threads
    // nightlyMarkerPath keeps the protection anyway
    (nightlyMarkerPath.toSeq ++
        readNightlyMarkerConfig(spark, pointerPath)).distinct.foreach { m =>
      val standing = Nightly.readMarker(spark, m)
      if (standing.nonEmpty) {
        val ptrQ = qualify(spark, Seq(pointerPath)).head
        require(!standing.exists(e => qualify(spark, Seq(e._2)).head == ptrQ),
          s"ingestRound: a standing nightly round marker at $m names this pointer " +
            s"($pointerPath) — a crashed swap left the deployment half-flipped. Run " +
            "Nightly.recover (or let the next nightly heal at entry) before resuming " +
            "intraday ingest: generations chained on the half-swapped state would " +
            "move the pointer off the marker's recorded base, and recover would then " +
            "refuse to heal the deployment")
      }
    }
    // the fence spans the WHOLE round — pointer read, maintain, flip:
    // a pointer movement during the maintain (a nightly scheduler
    // racing this stream, out of the single-writer contract) moves
    // the epoch and the round's publish refuses, instead of flipping
    // onto a chain built from the superseded base. NOTE the refusal
    // lands AFTER the batch root committed; a foreachBatch replay
    // would classify it COMMITTED and re-flip a stale-based chain, so
    // a refused round means the operator must delete the batch root
    // (and resolve who owns the pointer) before resuming the stream.
    val fence = readEpoch(spark, pointerPath)
    // the committed step of the round's chain, newest first — ingest
    // never deletes, so only updated / compacted can stand. A step is
    // classified by EVIDENCE, not exception class: manifest dir absent
    // = uncommitted (the normal fresh / half-written states); present
    // and loading = committed; present but UNREADABLE (a crash
    // mid-manifest-write tore it — read failures here surface as
    // AnalysisException, not the missing-manifest refusal) = torn
    // residue, deletable like any half-written root — but ONLY when
    // the pointer does not reference into this round: a torn manifest
    // under the SERVING root is out-of-band corruption that must
    // refuse loudly, never be auto-deleted by a retrying stream.
    var torn = false
    val committed = Seq(s"$outRoot/compacted", s"$outRoot/updated").find { p =>
      val mp = new org.apache.hadoop.fs.Path(s"$p/manifest")
      mp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(mp) && {
        try { handle(spark, p, what); true }
        catch { case scala.util.control.NonFatal(_) => torn = true; false }
      }
    }
    committed match {
      case Some(root) =>
        if (root == s"$outRoot/updated") {
          val residue = new org.apache.hadoop.fs.Path(s"$outRoot/compacted")
          if (fs.exists(residue)) {
            // the residue is only deletable while NOTHING serves it: if
            // the pointer was flipped to this round's compacted step
            // and that manifest was later torn OUT-OF-BAND, the replay
            // classifies it unreadable and lands here — deleting it
            // would destroy the SERVING root and silently roll the
            // pointer back onto the updated step. Same refusal as the
            // torn-serving-root case below.
            val resQ = qualifiedPath(spark, s"$outRoot/compacted")
            val curQ = qualifiedPath(spark, readPointer(spark, pointerPath))
            require(curQ != resQ && !curQ.startsWith(resQ + "/"),
              s"ingestRound: the serving root $curQ has an unreadable manifest — " +
                "out-of-band corruption, not replayable crash residue; refusing to " +
                "auto-delete it. Restore the generation (or republish the pointer " +
                "onto a valid one) before resuming the ingest")
            fs.delete(residue, true): Unit
          }
        }
        // a committed chain extends the pointer value it was BUILT
        // from, recorded (qualified) in the batch root (`chainbase`)
        // before the maintain ran. A replay may re-flip only while the
        // pointer still serves that base — or already serves this
        // batch's own committed step (the normal crash-after-flip
        // heal). If the pointer serves a generation that CARRIES this
        // batch's root by reference (a maintenance round chained on
        // top while the stream was down), the batch's data already
        // serves and the replay is a NO-OP. Any OTHER pointer value
        // means a different writer moved it after this round committed
        // — the fence-refusal-then-restart footgun: a restarted stream
        // would otherwise re-flip a chain built from the superseded
        // base and silently un-serve the other writer's generation.
        // Refuse; the operator retires the batch root through
        // ServePointer.vacuum (NEVER a raw delete — the root may be
        // carried by reference) or republishes deliberately. A batch
        // root WITHOUT the record predates chain-aware replay (built
        // before the upgrade): version skew must be loud, so unless
        // the pointer already serves this batch's own committed step
        // (the provably-safe crash-after-flip heal), the replay
        // refuses instead of silently keeping the old re-flip
        // behavior — re-flipping without a recorded base could
        // un-serve another writer's generation exactly like the
        // fenced case above.
        val baseRec = new org.apache.hadoop.fs.Path(s"$outRoot/chainbase")
        val bfs = baseRec.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val curRoot = readPointer(spark, pointerPath)
        val curQ = qualifiedPath(spark, curRoot)
        val rootQ = qualifiedPath(spark, root)
        val replayNoop = if (!bfs.exists(baseRec)) {
          require(curQ == rootQ,
            s"ingestRound: batch $batchId committed at $root with NO chainbase " +
              "record — this batch root predates chain-aware replay, so the replay " +
              "cannot prove the pointer still serves the base the chain was built " +
              s"from (it now serves $curQ). Verify the pointer state manually: if " +
              "the batch's data already serves (or is carried by the serving " +
              "generation), retire the batch root through ServePointer.vacuum — " +
              "never a raw delete, it may be carried by reference — otherwise " +
              "republish deliberately; then resume the ingest")
          false // pointer already on this root: re-flip is the idempotent heal
        } else {
          val in = bfs.open(baseRec)
          val recorded = try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim finally in.close()
          val recordedBase = parseChainbase(recorded, outRoot)
          if (curQ == recordedBase || curQ == rootQ) false
          else {
            val curH = handle(spark, curRoot, what)
            val chainedThrough = qualify(spark, curH.segments ++ curH.tombstones)
              .exists(p => p == rootQ || p.startsWith(rootQ + "/"))
            require(chainedThrough,
              s"ingestRound: batch $batchId committed at $root chaining from " +
                s"$recordedBase, but the pointer now serves $curQ — another writer " +
                "moved the pointer after this round committed (out of the " +
                "single-writer contract), and re-flipping would silently un-serve " +
                "its generation. Retire the batch root through ServePointer.vacuum " +
                "(never a raw delete — it may be carried by reference) or republish " +
                "deliberately before resuming the ingest")
            true // the serving generation carries this batch: already applied
          }
        }
        if (!replayNoop) publishPointerFenced(spark, pointerPath, root, what, fence)
      case None =>
        val outQ = qualifiedPath(spark, outRoot)
        if (torn) {
          val curQ = qualifiedPath(spark, readPointer(spark, pointerPath))
          require(curQ != outQ && !curQ.startsWith(outQ + "/"),
            s"ingestRound: the serving root $curQ has an unreadable manifest — " +
              "out-of-band corruption, not replayable crash residue; refusing to " +
              "auto-delete it. Restore the generation (or republish the pointer " +
              "onto a valid one) before resuming the ingest")
        }
        if (!rows.isEmpty) {
          if (fs.exists(rootP))
            require(fs.delete(rootP, true),
              s"ingestRound: failed to clear half-written residue at $outRoot")
          val cur = readPointer(spark, pointerPath)
          // record the chain base FIRST (see the COMMITTED branch): a
          // replay of this batch may only re-flip while the pointer
          // still serves what this round built on. Qualified, so a
          // hand-bootstrapped (unqualified) pointer file compares
          // scheme-stably at replay time; version-stamped, so a future
          // semantic change to replay classification refuses loudly on
          // records it does not understand instead of silently
          // applying the wrong era's rules (see parseChainbase)
          writeAtomic(spark, s"$outRoot/chainbase",
            s"graft-chainbase-v$ChainbaseVersion\t${qualifiedPath(spark, cur)}")
          publishPointerFenced(spark, pointerPath, maintain(rows, cur, outRoot), what,
            fence)
        }
    }
    keepGenerations.foreach { k =>
      // TWO pin sources, two DIFFERENT failure domains — never one catch:
      // - an unreadable/malformed SNAPSHOT loses only its own pins for
      //   the round (its readers are already broken — read() throws for
      //   them too) and the refusal belongs to the serve path;
      // - an unreadable GRACE LEDGER must SKIP the retention pass
      //   entirely (reclaim nothing this batch): pre-retire readers
      //   resolved their roots from an earlier HEALTHY snapshot read and
      //   are mid-drain — a torn .grace file does not break them, but
      //   running retention without its pins would reclaim the promised
      //   root under them, the exact failure gracePinnedRoots exists to
      //   prevent. Holding one extra generation for a round is the
      //   fail-safe side; the stream itself never wedges.
      val snapPinned = snapshotPath.toSeq.flatMap { sp =>
        try DeploymentSnapshot.readIfExists(spark, sp).values.toSeq
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      }
      val gracePinned =
        try Right(snapshotPath.toSeq.flatMap(sp =>
          // a root still in retirement grace (Nightly.retireTier) is
          // promised to pre-retire readers — intraday retention on a
          // pointer whose tier left the deployment must not reclaim it
          Nightly.gracePinnedRoots(spark, sp, pointerPath)))
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      gracePinned match {
        case Right(g) =>
          retainGenerations(spark, pointerPath, k, what, snapPinned ++ g).collect(): Unit
        case Left(e) =>
          System.err.println(
            s"[ingestRound] $what: retirement-grace ledger unreadable beside " +
              s"${snapshotPath.getOrElse("<none>")} — skipping this batch's retention " +
              s"(reclaiming nothing) rather than running it unpinned: ${e.getMessage}")
      }
    }
  }

}
