package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** r19 lifecycle hardening drills: the exclusive-create epoch commit
  * (the read-then-rename bump's both-racers-pass window is closed),
  * the deployment snapshot's fenced merge and first-class tier
  * retirement, chainbase record versioning, round-marker delimiter
  * validation, intraday-ingest refusal on a standing crashed-swap
  * marker, and the scoped (strict-by-default) segment-table union.
  */
class LifecycleHardeningSpec extends SparkTestBase {
  import spark.implicits._

  private def rowsDf = (1L to 10L).map(i => (i, i * 2)).toDF("doc_id", "v")

  private def hfs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeFile(path: String, content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val out = hfs(path).create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  test("the fence's exclusive-create commit: a racer landing INSIDE the read-commit window loses exactly once") {
    val root = java.nio.file.Files.createTempDirectory("graft-fence-excl").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0")
    SideIndex.compact(spark, s"$root/gen0", s"$root/gen1")
    SideIndex.compact(spark, s"$root/gen0", s"$root/gen2")
    assert(ServePointer.epoch(spark, ptr) == 1L)
    // the pre-r19 bump read the counter then renamed it: two racers
    // that both read epoch 1 could BOTH commit 2 and both pass the
    // fence. The commit is now an exclusive create of the next epoch
    // marker — interleave a full racing publish between this one's
    // epoch read (which passes) and its create (which must then lose)
    ServePointer.setFenceCommitHook { p =>
      if (p == ptr) {
        ServePointer.setFenceCommitHook(_ => ()) // the racer must not recurse
        ServePointer.publish(spark, ptr, s"$root/gen2")
      }
    }
    try {
      val e = intercept[IllegalArgumentException] {
        ServePointer.publish(spark, ptr, s"$root/gen1")
      }
      assert(e.getMessage.contains("lost the pointer fence"), e.getMessage)
    } finally ServePointer.setFenceCommitHook(_ => ())
    // exactly one winner: the racer's publish stands, the loser
    // changed NOTHING (pointer, history, epoch)
    assert(ServePointer.read(spark, ptr).endsWith("/gen2"))
    assert(ServePointer.epoch(spark, ptr) == 2L, "one commit, one bump")
    assert(!ServePointer.history(spark, ptr).exists(_.endsWith("/gen1")),
      "the losing publish must not have touched the history")
    // the loser's documented remedy works: re-read and retry
    ServePointer.publish(spark, ptr, s"$root/gen1")
    assert(ServePointer.read(spark, ptr).endsWith("/gen1"))
    assert(ServePointer.epoch(spark, ptr) == 3L)
    // marker GC: superseded epoch markers are reclaimed — the epoch
    // state stays O(1) files (floor + the newest marker), not one
    // file per lifecycle operation forever
    val markers = new java.io.File(root).list().filter(_.startsWith("CURRENT.epoch."))
      .filterNot(_.endsWith(".crc"))
    assert(markers.toSeq == Seq("CURRENT.epoch.3"), markers.mkString(", "))
  }

  test("a crash between the marker create and the floor rewrite still counts the committed epoch") {
    val root = java.nio.file.Files.createTempDirectory("graft-fence-crash").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0")
    assert(ServePointer.epoch(spark, ptr) == 1L)
    // simulate the crash window: epoch 2's exclusive-create landed but
    // the process died before rewriting the floor counter
    hfs(root).create(new org.apache.hadoop.fs.Path(s"$ptr.epoch.2"), false).close()
    assert(ServePointer.epoch(spark, ptr) == 2L,
      "the marker alone must carry the committed epoch")
    // and the next lifecycle operation proceeds from 2, not 1
    SideIndex.compact(spark, s"$root/gen0", s"$root/gen1")
    ServePointer.publish(spark, ptr, s"$root/gen1")
    assert(ServePointer.epoch(spark, ptr) == 3L)
  }

  test("the deployment snapshot's merge is fenced: racing subset publishes get one winner and no lost tiers") {
    val root = java.nio.file.Files.createTempDirectory("graft-snap-fence").toString
    val snap = s"$root/DEPLOYMENT"
    Seq("a", "b", "c").foreach(t => SideIndex.build(rowsDf, "doc_id", t, s"$root/${t}0"))
    DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/a0"))
    // two fix-one-tier re-runs race: each read the snapshot (tier a
    // only), each merges its own tier in. Unfenced, the slower rename
    // would silently evict the faster one's tier; fenced, the slower
    // one refuses having written nothing
    ServePointer.setFenceCommitHook { p =>
      if (p == snap) {
        ServePointer.setFenceCommitHook(_ => ())
        DeploymentSnapshot.publish(spark, snap, Seq("c" -> s"$root/${t0("c")}"))
      }
    }
    try {
      val e = intercept[IllegalArgumentException] {
        DeploymentSnapshot.publish(spark, snap, Seq("b" -> s"$root/${t0("b")}"))
      }
      assert(e.getMessage.contains("lost the pointer fence"), e.getMessage)
    } finally ServePointer.setFenceCommitHook(_ => ())
    val afterRace = DeploymentSnapshot.read(spark, snap)
    assert(afterRace.keySet == Set("a", "c"),
      s"the winner's merge must stand untouched: $afterRace")
    // the loser retries from the current state and ALL tiers survive
    DeploymentSnapshot.publish(spark, snap, Seq("b" -> s"$root/${t0("b")}"))
    assert(DeploymentSnapshot.read(spark, snap).keySet == Set("a", "b", "c"))
  }

  private def t0(t: String) = s"${t}0"

  test("retire drops a tier atomically, readers refuse, and a merge publish cannot resurrect it") {
    val root = java.nio.file.Files.createTempDirectory("graft-retire").toString
    val snap = s"$root/DEPLOYMENT"
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b1")
    DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/a0", "b" -> s"$root/b0"))
    val retired = DeploymentSnapshot.retire(spark, snap, "a")
    assert(retired.endsWith("/a0"), retired)
    assert(DeploymentSnapshot.read(spark, snap).keySet == Set("b"))
    assert(DeploymentSnapshot.readRetired(spark, snap) == Set("a"))
    // readers refuse with the live tier list from the next resolve
    val e = intercept[IllegalArgumentException] {
      DeploymentSnapshot.readTier(spark, snap, "a")
    }
    assert(e.getMessage.contains("names no tier 'a'") && e.getMessage.contains("b"),
      e.getMessage)
    // a subset publish of ANOTHER tier merges without resurrecting a
    DeploymentSnapshot.publish(spark, snap, Seq("b" -> s"$root/b1"))
    assert(DeploymentSnapshot.read(spark, snap).keySet == Set("b"))
    assert(DeploymentSnapshot.readRetired(spark, snap) == Set("a"),
      "the tombstone must survive unrelated merges")
    // a merge publish CARRYING the retired tier refuses with the remedy
    val e2 = intercept[IllegalArgumentException] {
      DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/a0"))
    }
    assert(e2.getMessage.contains("RETIRED") && e2.getMessage.contains("replace = true"),
      e2.getMessage)
    // re-introduction is the deliberate full-redeploy form, which
    // clears tombstones
    DeploymentSnapshot.publish(spark, snap,
      Seq("a" -> s"$root/a0", "b" -> s"$root/b1"), replace = true)
    assert(DeploymentSnapshot.read(spark, snap).keySet == Set("a", "b"))
    assert(DeploymentSnapshot.readRetired(spark, snap).isEmpty)
    // retiring an unknown tier refuses loudly
    assert(intercept[IllegalArgumentException] {
      DeploymentSnapshot.retire(spark, snap, "zzz")
    }.getMessage.contains("names no tier 'zzz'"))
  }

  test("Nightly.retireTier refuses under a standing marker, then reclaims history with reader grace") {
    val root = java.nio.file.Files.createTempDirectory("graft-retire-tier").toString
    val snap = s"$root/DEPLOYMENT"
    val marker = s"$root/nightly.round"
    val ptr = s"$root/A"
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    ServePointer.publish(spark, ptr, s"$root/a0", "a")
    // the snapshot names a0; intraday ingest then moves the pointer one
    // generation further — the snapshot root is now HISTORY, the state
    // where retirement's reader grace actually matters
    DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/a0"))
    SideIndex.compact(spark, s"$root/a0", s"$root/a1")
    ServePointer.publish(spark, ptr, s"$root/a1", "a")
    SideIndex.compact(spark, s"$root/a1", s"$root/a2")
    ServePointer.publish(spark, ptr, s"$root/a2", "a")
    assert(ServePointer.history(spark, ptr).size == 2)
    // a standing crashed-swap marker blocks retirement: healing first
    // keeps recover unambiguous
    Nightly.writeMarker(spark, marker, Seq(("a", ptr, s"$root/a2", s"$root/a1")))
    val e = intercept[IllegalArgumentException] {
      Nightly.retireTier(spark, snap, "a", ptr, "a", markerPath = Some(marker))
    }
    assert(e.getMessage.contains("round marker stands"), e.getMessage)
    assert(DeploymentSnapshot.read(spark, snap).keySet == Set("a"), "nothing retired")
    hfs(marker).delete(new org.apache.hadoop.fs.Path(marker), false)
    // now the retire: snapshot entry gone, history reclaimed EXCEPT the
    // just-retired root (a reader that resolved the snapshot moments
    // before may still serve from it — one round of grace)
    val retired = Nightly.retireTier(spark, snap, "a", ptr, "a",
      markerPath = Some(marker))
    assert(retired.endsWith("/a0"), retired)
    assert(intercept[IllegalArgumentException] {
      DeploymentSnapshot.readTier(spark, snap, "a")
    }.getMessage.contains("names no tier 'a'"))
    assert(new java.io.File(s"$root/a0").exists,
      "the retired snapshot root keeps one round of reader grace")
    assert(!new java.io.File(s"$root/a1").exists,
      "unpinned history outside the keep window is reclaimed")
    // once readers drained, the ordinary pointer lifecycle reclaims the
    // graced root too — retirement leaves no special state behind
    ServePointer.retain(spark, ptr, keep = 0, "a").collect(): Unit
    assert(!new java.io.File(s"$root/a0").exists)
  }

  test("retirement reader grace is configurable: the retired root survives N published rounds and reclaims on round N+1") {
    val root = java.nio.file.Files.createTempDirectory("graft-grace").toString
    val snap = s"$root/DEPLOYMENT"
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    ServePointer.publish(spark, ptrB, s"$root/b0", "b")
    DeploymentSnapshot.publish(spark, snap,
      Seq("a" -> s"$root/a0", "b" -> s"$root/b0"))
    // intraday ingest advances A past the snapshot root: a0 is history,
    // the state where a long-draining pre-retire reader needs grace
    SideIndex.compact(spark, s"$root/a0", s"$root/a1")
    ServePointer.publish(spark, ptrA, s"$root/a1", "a")
    Nightly.retireTier(spark, snap, "a", ptrA, "a", graceRounds = 2)
    assert(new java.io.File(s"$snap.grace").exists, "durable grace ledger")
    var n = 0
    def publishedRound(): Unit = {
      n += 1
      val prev = ServePointer.read(spark, ptrB)
      Nightly.run(spark, Seq(Nightly.Tier("b", rowsDf.select("doc_id"), "doc_id", ptrB,
        () => { SideIndex.compact(spark, prev, s"$root/b$n"); s"$root/b$n" },
        p => SideIndex.read(spark, p, "doc_id", "b").select(col("doc_id")))),
        snapshotPath = Some(snap)): Unit
    }
    publishedRound() // round 1 of 2: a pre-retire reader still reads
    assert(SideIndex.read(spark, s"$root/a0", "doc_id", "a").count() == 10,
      "grace round 1: the pre-retire snapshot's root must still serve")
    publishedRound() // round 2 of 2: still readable
    assert(SideIndex.read(spark, s"$root/a0", "doc_id", "a").count() == 10,
      "grace round 2: the pre-retire snapshot's root must still serve")
    publishedRound() // round 3 = graceRounds + 1: reclaim
    assert(!new java.io.File(s"$root/a0").exists,
      "the retired root reclaims on round graceRounds + 1")
    assert(!new java.io.File(s"$snap.grace").exists,
      "a fully-ticked ledger leaves no state behind")
    // the serving root of the retired tier's own pointer is untouched:
    // retirement removed the tier from the deployment, not its data
    assert(SideIndex.read(spark, ServePointer.read(spark, ptrA), "doc_id", "a")
      .count() == 10)
    // graceRounds < 1 refuses: a just-resolved reader always needs a round
    assert(intercept[IllegalArgumentException] {
      Nightly.retireTier(spark, snap, "b", ptrB, "b", graceRounds = 0)
    }.getMessage.contains("graceRounds"))
  }

  test("a graced root survives EVERY other retention pass: intraday ingest, a re-introduced tier's nightly retain, a second retire") {
    val root = java.nio.file.Files.createTempDirectory("graft-grace-pin").toString
    val snap = s"$root/DEPLOYMENT"
    val ptrA = s"$root/A"
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/a0"))
    SideIndex.compact(spark, s"$root/a0", s"$root/a1")
    ServePointer.publish(spark, ptrA, s"$root/a1", "a")
    Nightly.retireTier(spark, snap, "a", ptrA, "a", graceRounds = 2)
    assert(new java.io.File(s"$root/a0").exists)
    // 1. the tier left the deployment but its pointer lifecycle keeps
    // running: intraday ingest retention (keep = 0) reclaims ordinary
    // history (a1 — no longer snapshot-pinned) but NOT the graced a0
    SideIndex.ingestBatch(spark, Seq((11L, 22L)).toDF("doc_id", "v"), 0L, ptrA,
      s"$root/ingest", "doc_id", "a",
      keepGenerations = Some(0), snapshotPath = Some(snap))
    // (a1 is HELD, not graced — the serving batch root carries its
    // segments by reference until a compaction re-homes them)
    assert(new java.io.File(s"$root/a0").exists,
      "intraday retention must pin the graced root")
    // 2. the tier is re-introduced; its nightly round's own retention
    // (keep = 0) must pin the graced root too — and the round's tick
    // counts the grace down without reclaiming it
    val batchRoot = ServePointer.read(spark, ptrA)
    DeploymentSnapshot.publish(spark, snap, Seq("a" -> batchRoot), replace = true)
    val registry = (1L to 11L).toDF("doc_id")
    Nightly.run(spark, Seq(Nightly.Tier("a", registry, "doc_id", ptrA,
      () => { SideIndex.compact(spark, batchRoot, s"$root/a2"); s"$root/a2" },
      p => SideIndex.read(spark, p, "doc_id", "a").select(col("doc_id")))),
      keepGenerations = Some(0), snapshotPath = Some(snap)): Unit
    assert(ServePointer.read(spark, ptrA).endsWith("/a2"))
    assert(new java.io.File(s"$root/a0").exists,
      "the re-introduced tier's nightly retention must pin the graced root")
    // 3. a second retirement of the same pointer (keep = 0) reclaims
    // what it may (the superseded batch root) but pins the still-graced
    // a0 alongside its own root, and STACKS a second ledger entry
    Nightly.retireTier(spark, snap, "a", ptrA, "a", graceRounds = 1)
    assert(new java.io.File(s"$root/a0").exists,
      "a second retire must pin earlier grace entries")
    assert(Nightly.readGrace(spark, snap).size == 2, "stacked grace entries")
    // with a2 re-homed, the batch root (and the a1 it carried) lose
    // their last reference and reclaim through the second retire's pass
    assert(!new java.io.File(batchRoot.stripPrefix("file:")).exists &&
      !new java.io.File(s"$root/a1").exists,
      "unpinned, no-longer-carried history reclaims as usual")
    // 4. the schedule still holds: published rounds tick both entries
    // down; a0 (retired first, graceRounds = 2: one nightly already
    // ticked it) reclaims exactly one round after its promise expires,
    // while the second entry's root keeps serving (current root —
    // retention never touches it)
    val ptrB = s"$root/B"
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    ServePointer.publish(spark, ptrB, s"$root/b0", "b")
    DeploymentSnapshot.publish(spark, snap, Seq("b" -> s"$root/b0"))
    var n = 0
    def publishedRound(): Unit = {
      n += 1
      val prev = ServePointer.read(spark, ptrB)
      Nightly.run(spark, Seq(Nightly.Tier("b", rowsDf.select("doc_id"), "doc_id", ptrB,
        () => { SideIndex.compact(spark, prev, s"$root/b$n"); s"$root/b$n" },
        p => SideIndex.read(spark, p, "doc_id", "b").select(col("doc_id")))),
        snapshotPath = Some(snap)): Unit
    }
    publishedRound() // both entries wait (a0 at 0, a2 at 0 after this tick)
    assert(new java.io.File(s"$root/a0").exists, "still graced")
    publishedRound() // both due: a0 reclaims; a2 is current and stays
    assert(!new java.io.File(s"$root/a0").exists, "grace expired, root reclaimed")
    assert(!new java.io.File(s"$snap.grace").exists, "ledger fully drained")
    assert(SideIndex.read(spark, s"$root/a2", "doc_id", "a").count() == 11,
      "the second retirement's root keeps serving its readers")
  }

  test("a committed batch root with NO chainbase record refuses the replay unless it provably heals") {
    val root = java.nio.file.Files.createTempDirectory("graft-chainbase").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0", "t")
    val batch = Seq((11L, 22L), (12L, 24L)).toDF("doc_id", "v")
    SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    val committedRoot = ServePointer.read(spark, ptr)
    assert(committedRoot.contains("/batch-0/"))
    // hand-write the LEGACY state: a pre-upgrade batch root has no
    // chainbase record. While the pointer still serves this batch's own
    // committed step, the replay is the provably-safe crash-after-flip
    // heal and proceeds
    val rec = s"$root/ingest/batch-0/chainbase"
    assert(hfs(rec).delete(new org.apache.hadoop.fs.Path(rec), false))
    SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    assert(ServePointer.read(spark, ptr) == committedRoot)
    // but once the pointer serves anything else, a record-less replay
    // cannot prove its chain base and must refuse — version skew is
    // loud, not a silent re-flip of a stale chain
    ServePointer.publish(spark, ptr, s"$root/gen0", "t")
    val e = intercept[IllegalArgumentException] {
      SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    }
    assert(e.getMessage.contains("NO chainbase record") &&
      e.getMessage.contains("ServePointer.vacuum"), e.getMessage)
    assert(ServePointer.read(spark, ptr).endsWith("/gen0"), "the refusal changed nothing")
    // a chainbase stamped by a NEWER builder refuses too, with the
    // upgrade remedy — its replay semantics may differ from this era's
    writeFile(rec, s"graft-chainbase-v9\t${IndexManifest.qualify(spark, Seq(s"$root/gen0")).head}")
    val e2 = intercept[IllegalArgumentException] {
      SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    }
    assert(e2.getMessage.contains("newer than this builder"), e2.getMessage)
    // the CURRENT record format (and the r18 bare-path form it
    // supersedes) both replay: same-base re-flip proceeds
    writeFile(rec, IndexManifest.qualify(spark, Seq(s"$root/gen0")).head)
    SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    assert(ServePointer.read(spark, ptr) == committedRoot)
  }

  test("round-marker delimiter validation refuses at write AND at run entry, before any maintain") {
    val root = java.nio.file.Files.createTempDirectory("graft-marker-val").toString
    val e = intercept[IllegalArgumentException] {
      Nightly.writeMarker(spark, s"$root/m",
        Seq(("bad\ttier", s"$root/P", s"$root/r", "")))
    }
    assert(e.getMessage.contains("may not contain tabs"), e.getMessage)
    assert(!new java.io.File(s"$root/m").exists, "nothing may be written")
    // at run entry: the refusal lands BEFORE the round's expensive
    // phase — the maintain closure must never run
    var maintained = false
    val e2 = intercept[IllegalArgumentException] {
      Nightly.run(spark, Seq(Nightly.Tier("bad\ttier", rowsDf.select("doc_id"),
        "doc_id", s"$root/P", () => { maintained = true; s"$root/never" },
        _ => rowsDf.select("doc_id"))),
        markerPath = Some(s"$root/m"))
    }
    assert(e2.getMessage.contains("may not contain tabs"), e2.getMessage)
    assert(!maintained, "the refusal must land before any maintain runs")
  }

  test("intraday ingest refuses while a standing round marker names its pointer") {
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-marker").toString
    val (ptr, marker) = (s"$root/CURRENT", s"$root/nightly.round")
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0", "t")
    val batch = Seq((11L, 22L)).toDF("doc_id", "v")
    // a crashed swap left its marker naming this pointer: ingest must
    // not chain on the half-swapped state (recover would later refuse)
    Nightly.writeMarker(spark, marker, Seq(("t", ptr, s"$root/gen0", "")))
    val e = intercept[IllegalArgumentException] {
      SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t",
        nightlyMarkerPath = Some(marker))
    }
    assert(e.getMessage.contains("standing nightly round marker") &&
      e.getMessage.contains("Nightly.recover"), e.getMessage)
    assert(ServePointer.read(spark, ptr).endsWith("/gen0"), "the refusal changed nothing")
    // a marker over OTHER tiers' pointers does not block this stream
    Nightly.writeMarker(spark, marker, Seq(("x", s"$root/OTHER", s"$root/gen0", "")))
    SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t",
      nightlyMarkerPath = Some(marker))
    assert(ServePointer.read(spark, ptr).contains("/batch-0/"))
    // and once the marker is healed away, the same config proceeds
    hfs(marker).delete(new org.apache.hadoop.fs.Path(marker), false)
    SideIndex.ingestBatch(spark, Seq((12L, 24L)).toDF("doc_id", "v"), 1L, ptr,
      s"$root/ingest", "doc_id", "t", nightlyMarkerPath = Some(marker))
    assert(ServePointer.read(spark, ptr).contains("/batch-1/"))
  }

  test("fence stress: real threads racing commits on one pointer and one snapshot — epoch == total successes, exactly one winner per epoch") {
    // the hook drills above prove the interleaving SEMANTICS
    // single-threaded; this pins the whole commit path — entry read,
    // O_EXCL marker create, floor rewrite, marker GC — under genuine
    // thread scheduling. Each attempt re-reads the epoch at entry and
    // tries to commit; the filesystem must hand every epoch value to
    // exactly one winner, and the final epoch must count exactly the
    // successful commits (a lost update would undercount, a
    // double-winner would overcount the winners-per-epoch set).
    val root = java.nio.file.Files.createTempDirectory("graft-fence-stress").toString
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    val ptr = s"$root/CURRENT"
    ServePointer.publish(spark, ptr, s"$root/gen0", "t")
    val snap = s"$root/DEPLOYMENT"
    DeploymentSnapshot.publish(spark, snap, Seq("t" -> s"$root/gen0"))
    for (path <- Seq(ptr, snap)) {
      val startEpoch = IndexManifest.readEpoch(spark, path)
      assert(startEpoch == 1L)
      val threads = 8
      val attemptsPerThread = 25 // 200 racing commit attempts per path
      val successes = new java.util.concurrent.atomic.AtomicInteger(0)
      val wonEpochs = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val start = new java.util.concurrent.CyclicBarrier(threads)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val futures = (1 to threads).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit = {
              start.await()
              var i = 0
              while (i < attemptsPerThread) {
                val entry = IndexManifest.readEpoch(spark, path)
                try {
                  IndexManifest.checkAndBumpEpoch(spark, path, entry, "stress")
                  successes.incrementAndGet(): Unit
                  if (!wonEpochs.add(entry + 1))
                    violations.add(s"epoch ${entry + 1} committed twice"): Unit
                } catch {
                  case _: IllegalArgumentException => () // lost the race: fine
                }
                i += 1
              }
            }
          })
        }
        futures.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      } finally pool.shutdownNow(): Unit
      assert(violations.isEmpty, violations.toArray.mkString("; "))
      assert(successes.get > 0, "at least some commits must win")
      val finalEpoch = IndexManifest.readEpoch(spark, path)
      assert(finalEpoch == startEpoch + successes.get,
        s"final epoch $finalEpoch must count exactly the ${successes.get} successful " +
          s"commits over $startEpoch — a mismatch means a lost or double-counted commit")
      assert(wonEpochs.asScala.toSeq.sorted ==
        ((startEpoch + 1) to finalEpoch).toSeq,
        "the winners must cover every epoch value exactly once, gap-free")
      // marker GC keeps epoch state O(1) files even under contention:
      // the newest marker survives; superseded ones are reclaimed
      // (best-effort — a handful may outlive a racing deleter)
      val base = new java.io.File(path).getName + ".epoch."
      val markers = new java.io.File(root).list()
        .filter(n => n.startsWith(base) && !n.endsWith(".crc"))
        .map(_.stripPrefix(base).toLong)
      assert(markers.max == finalEpoch, s"newest marker must be $finalEpoch")
      assert(markers.length <= threads,
        s"marker GC must keep epoch state bounded, found ${markers.length}")
    }
  }

  test("the half-swap refusal is un-forgettable: a marker-protected nightly records its marker path beside the pointer, and a NO-ARGS ingest discovers it") {
    val root = java.nio.file.Files.createTempDirectory("graft-marker-config").toString
    val (ptr, marker) = (s"$root/CURRENT", s"$root/nightly.round")
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0", "t")
    // ONE marker-protected nightly: the round records the marker path
    // as durable deployment config beside the pointer
    Nightly.run(spark, Seq(Nightly.Tier("t", rowsDf.select("doc_id"), "doc_id", ptr,
      () => { SideIndex.compact(spark, s"$root/gen0", s"$root/gen1"); s"$root/gen1" },
      p => SideIndex.read(spark, p, "doc_id", "t").select(col("doc_id")))),
      markerPath = Some(marker))
    assert(ServePointer.read(spark, ptr).endsWith("/gen1"))
    assert(new java.io.File(s"$ptr.nightly").exists,
      "the nightly must record its marker path beside the pointer")
    // a later crashed swap leaves its marker standing; an intraday
    // batch launched through the STANDARD wrapper — NO marker argument
    // — must refuse anyway: the protection rides with the pointer, not
    // with each call site's memory of an optional parameter
    Nightly.writeMarker(spark, marker, Seq(("t", ptr, s"$root/gen1", "")))
    val batch = Seq((11L, 22L)).toDF("doc_id", "v")
    val e = intercept[IllegalArgumentException] {
      SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    }
    assert(e.getMessage.contains("standing nightly round marker"), e.getMessage)
    assert(ServePointer.read(spark, ptr).endsWith("/gen1"), "the refusal changed nothing")
    // retireTier discovers the same config when markerPath is not threaded
    val snap = s"$root/DEPLOYMENT"
    DeploymentSnapshot.publish(spark, snap, Seq("t" -> s"$root/gen1"))
    val e2 = intercept[IllegalArgumentException] {
      Nightly.retireTier(spark, snap, "t", ptr, "t")
    }
    assert(e2.getMessage.contains("round marker stands"), e2.getMessage)
    assert(DeploymentSnapshot.read(spark, snap).keySet == Set("t"), "nothing retired")
    // healed, the same no-args call proceeds
    Nightly.recover(spark, marker)
    SideIndex.ingestBatch(spark, batch, 0L, ptr, s"$root/ingest", "doc_id", "t")
    assert(ServePointer.read(spark, ptr).contains("/batch-0/"))
  }

  test("the segment-table union is STRICT except the sanctioned doclen content_hash evolution") {
    val root = java.nio.file.Files.createTempDirectory("graft-seg-union").toString
    // the sanctioned case: a doclen segment built before content_hash
    // existed unions as typed nulls — the audit's "never recorded"
    Seq((1L, 3L, 99L)).toDF("doc_id", "dl", "content_hash")
      .write.parquet(s"$root/segNew/doclen")
    Seq((2L, 4L)).toDF("doc_id", "dl").write.parquet(s"$root/segOld/doclen")
    val doclen = IndexManifest.segTableOrd(spark, Seq(s"$root/segNew", s"$root/segOld"),
      "doclen").orderBy("doc_id").collect()
    assert(doclen.length == 2 && !doclen(0).isNullAt(2) && doclen(1).isNullAt(2))
    // everything else stays a corruption tripwire: a segment missing a
    // NON-sanctioned column refuses the union instead of reading as
    // silent nulls in serve paths
    Seq((1L, 2L)).toDF("doc_id", "v").write.parquet(s"$root/s0/rows")
    Seq(3L).toDF("doc_id").write.parquet(s"$root/s1/rows")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      IndexManifest.segTableOrd(spark, Seq(s"$root/s0", s"$root/s1"), "rows").collect()
    }
    assert(e.getMessage.contains("\"v\""), e.getMessage)
  }
}
