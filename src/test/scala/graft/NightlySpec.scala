package graft

import graft.operators.{Nightly, ServePointer, SideIndex}
import org.apache.spark.sql.functions._

/** The audit-gated nightly composition: all tiers maintain, the
  * cross-tier audit decides, pointers flip all-or-nothing.
  */
class NightlySpec extends SparkTestBase {
  import spark.implicits._

  private def rowsDf = (1L to 10L).map(i => (i, i * 2)).toDF("doc_id", "v")

  private def tier(
      name: String, reg: org.apache.spark.sql.DataFrame, ptr: String,
      maintain: () => String): Nightly.Tier =
    Nightly.Tier(name, reg, "doc_id", ptr, maintain,
      p => SideIndex.read(spark, p, "doc_id", name).select(col("doc_id")))

  test("a clean round audits in_sync, flips every pointer, and runs the release") {
    val root = java.nio.file.Files.createTempDirectory("graft-nightly-ok").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    ServePointer.publish(spark, ptrA, s"$root/a0")
    ServePointer.publish(spark, ptrB, s"$root/b0")
    // tonight: doc 2 retired everywhere
    val registry = rowsDf.where(col("doc_id") =!= 2L).select("doc_id")
    var releaseRan = false
    val (report, rel) = Nightly.run(spark, Seq(
      tier("a", registry, ptrA, () => SideIndex.maintain(spark, s"$root/a0",
        Some(Seq(2L).toDF("doc_id")), None, "doc_id", "a", s"$root/a1",
        maxMaskedRatio = 1.0)),
      tier("b", registry, ptrB, () => SideIndex.maintain(spark, s"$root/b0",
        Some(Seq(2L).toDF("doc_id")), None, "doc_id", "b", s"$root/b1",
        maxMaskedRatio = 1.0))),
      release = Some(() => { releaseRan = true; Seq(("en", true)).toDF("s", "published") }),
      keepGenerations = Some(0))
    val rows = report.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(6), r.getBoolean(7)))
    assert(rows.toSet == Set(("a", 9L, 1L, true), ("b", 9L, 1L, true)), rows.mkString(", "))
    assert(releaseRan && rel.isDefined, "the release must run behind a passed gate")
    assert(ServePointer.read(spark, ptrA).endsWith("/a1/deleted"))
    assert(ServePointer.read(spark, ptrB).endsWith("/b1/deleted"))
    // retention ran post-swap with keep=0, but tonight's delete round
    // CARRIES yesterday's segment by reference — the superseded roots
    // are HELD, not refused and not deleted: retention composes with
    // an uncompacted nightly round
    assert(new java.io.File(s"$root/a0").exists && new java.io.File(s"$root/b0").exists,
      "carried generations must survive keep=0 retention")
    assert(ServePointer.history(spark, ptrA).exists(_.endsWith("/a0")),
      "a held generation stays in the pointer history")
  }

  test("a crash between two tiers' flips heals to the consistent state via the round marker") {
    val root = java.nio.file.Files.createTempDirectory("graft-nightly-crash").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    ServePointer.publish(spark, ptrB, s"$root/b0", "b")
    // tonight's generations, both committed (the marker is only ever
    // written after the audit gate passed, so both roots are valid)
    val a1 = SideIndex.maintain(spark, s"$root/a0", Some(Seq(2L).toDF("doc_id")), None,
      "doc_id", "a", s"$root/a1", maxMaskedRatio = 1.0)
    val b1 = SideIndex.maintain(spark, s"$root/b0", Some(Seq(2L).toDF("doc_id")), None,
      "doc_id", "b", s"$root/b1", maxMaskedRatio = 1.0)
    // simulate kill -9 INSIDE the swap window: marker written, tier a
    // flipped, tier b not — the mixed state nothing inside one tier
    // can see
    val marker = s"$root/nightly.round"
    // the marker records each tier's intended root AND the base the
    // round flipped from
    Nightly.writeMarker(spark, marker,
      Seq(("a", ptrA, a1, s"$root/a0"), ("b", ptrB, b1, s"$root/b0")))
    ServePointer.publish(spark, ptrA, a1, "a")
    assert(ServePointer.read(spark, ptrA).endsWith("/a1/deleted") &&
      ServePointer.read(spark, ptrB).endsWith("/b0"), "precondition: mixed pointers")
    // recover rolls FORWARD: the gate had passed, so tonight is the
    // consistent state — never a mix
    val healed = Nightly.recover(spark, marker)
    assert(healed.toSet == Set("a" -> "already-current", "b" -> "completed"),
      healed.mkString(", "))
    assert(ServePointer.read(spark, ptrA).endsWith("/a1/deleted"))
    assert(ServePointer.read(spark, ptrB).endsWith("/b1/deleted"))
    assert(!new java.io.File(marker).exists, "the healed marker must be cleared")
    // both tiers serve the SAME post-round relation — the consistency
    // the marker exists to guarantee
    assert(SideIndex.read(spark, ServePointer.read(spark, ptrA), "doc_id", "a")
      .collect().map(_.getLong(0)).sorted.toSeq ==
      SideIndex.read(spark, ServePointer.read(spark, ptrB), "doc_id", "b")
        .collect().map(_.getLong(0)).sorted.toSeq)
    // no marker left = recover is a no-op
    assert(Nightly.recover(spark, marker).isEmpty)
    // and a FULL run with markerPath set heals at entry, completes, and
    // leaves no marker behind
    val registry = rowsDf.where(col("doc_id") =!= 2L && col("doc_id") =!= 3L)
      .select("doc_id")
    val (report, _) = Nightly.run(spark, Seq(
      tier("a", registry, ptrA, () => SideIndex.maintain(spark,
        ServePointer.read(spark, ptrA),
        Some(Seq(3L).toDF("doc_id")), None, "doc_id", "a", s"$root/a2",
        maxMaskedRatio = 1.0)),
      tier("b", registry, ptrB, () => SideIndex.maintain(spark,
        ServePointer.read(spark, ptrB),
        Some(Seq(3L).toDF("doc_id")), None, "doc_id", "b", s"$root/b2",
        maxMaskedRatio = 1.0))),
      markerPath = Some(marker))
    assert(report.collect().forall(_.getAs[Boolean]("published")), "the clean round must publish")
    assert(!new java.io.File(marker).exists,
      "a completed swap must not leave its marker behind")
    assert(ServePointer.read(spark, ptrA).endsWith("/a2/deleted"))
    // a FOREIGN write between the crash and the next run fences the
    // marker's stale intent out: the marker describes a crashed
    // a0 -> a1 round, but the pointer has since moved to a2 — recover
    // must refuse, not clobber it
    val before = ServePointer.read(spark, ptrA)
    Nightly.writeMarker(spark, marker, Seq(("a", ptrA, a1, s"$root/a0")))
    val e = intercept[IllegalArgumentException] { Nightly.recover(spark, marker) }
    assert(e.getMessage.contains("after the crashed round"), e.getMessage)
    assert(new java.io.File(marker).exists,
      "a refused recover must leave the marker for the operator")
    assert(ServePointer.read(spark, ptrA) == before, "the foreign write must stand")
    assert(new java.io.File(marker).delete())
  }

  test("the deployment snapshot flips ALL tiers atomically for readers") {
    import graft.operators.DeploymentSnapshot
    val root = java.nio.file.Files.createTempDirectory("graft-snap").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    ServePointer.publish(spark, ptrB, s"$root/b0", "b")
    val snap = s"$root/DEPLOYMENT"
    DeploymentSnapshot.publish(spark, snap,
      Seq("a" -> s"$root/a0", "b" -> s"$root/b0"))
    // an unservable root can never enter a snapshot
    assert(intercept[IllegalArgumentException] {
      DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/nowhere"))
    }.getMessage.contains("manifest missing"))
    val before = DeploymentSnapshot.read(spark, snap)
    val registry = rowsDf.where(col("doc_id") =!= 2L).select("doc_id")
    val marker = s"$root/round.marker"
    // a READER lands exactly between the two pointer flips: tier a's
    // pointer already serves tonight, but the snapshot still names
    // yesterday for EVERY tier — the window the snapshot closes
    var midSwap: Map[String, String] = null
    ServePointer.setFenceCheckHook { p =>
      if (p == ptrB) {
        ServePointer.setFenceCheckHook(_ => ())
        midSwap = DeploymentSnapshot.read(spark, snap)
      }
    }
    try {
      Nightly.run(spark, Seq(
        tier("a", registry, ptrA, () => SideIndex.maintain(spark, s"$root/a0",
          Some(Seq(2L).toDF("doc_id")), None, "doc_id", "a", s"$root/a1",
          maxMaskedRatio = 1.0)),
        tier("b", registry, ptrB, () => SideIndex.maintain(spark, s"$root/b0",
          Some(Seq(2L).toDF("doc_id")), None, "doc_id", "b", s"$root/b1",
          maxMaskedRatio = 1.0))),
        markerPath = Some(marker), snapshotPath = Some(snap)): Unit
    } finally ServePointer.setFenceCheckHook(_ => ())
    assert(midSwap == before,
      s"a mid-swap snapshot read must see the OLD deployment on every tier: $midSwap")
    val after = DeploymentSnapshot.read(spark, snap)
    assert(after("a").endsWith("/a1/deleted") && after("b").endsWith("/b1/deleted"),
      s"the completed round must snapshot tonight's roots: $after")
    assert(DeploymentSnapshot.readTier(spark, snap, "a") == after("a"))
    assert(intercept[IllegalArgumentException] {
      DeploymentSnapshot.readTier(spark, snap, "zzz")
    }.getMessage.contains("names no tier"))
    // crash AFTER the flips but BEFORE the snapshot publish: pointers
    // serve tonight, readers still see yesterday — recover republishes
    // the snapshot from the standing marker's intent
    Nightly.writeMarker(spark, marker,
      Seq(("a", ptrA, after("a"), before("a")), ("b", ptrB, after("b"), before("b"))))
    DeploymentSnapshot.publish(spark, snap,
      Seq("a" -> before("a"), "b" -> before("b")))
    val healed = Nightly.recover(spark, marker, Some(snap))
    assert(healed.toSet == Set("a" -> "already-current", "b" -> "already-current"))
    assert(DeploymentSnapshot.read(spark, snap) == after,
      "recover must bring the reader-side snapshot forward with the pointers")
    assert(!new java.io.File(marker).exists)
  }

  test("retention pins the superseded snapshot's root for one round of reader grace") {
    import graft.operators.DeploymentSnapshot
    val root = java.nio.file.Files.createTempDirectory("graft-snap-pin").toString
    val ptrA = s"$root/A"
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    val snap = s"$root/DEPLOYMENT"
    DeploymentSnapshot.publish(spark, snap, Seq("a" -> s"$root/a0"))
    // INTRADAY: two compacting flips push the snapshot's root two
    // generations deep — beyond any keep=1 window
    SideIndex.compact(spark, s"$root/a0", s"$root/i1")
    ServePointer.publish(spark, ptrA, s"$root/i1", "a")
    SideIndex.compact(spark, s"$root/i1", s"$root/i2")
    ServePointer.publish(spark, ptrA, s"$root/i2", "a")
    def night(out: String, dropId: Long, reg: org.apache.spark.sql.DataFrame) =
      Nightly.run(spark, Seq(
        tier("a", reg, ptrA, () => SideIndex.maintain(spark,
          ServePointer.read(spark, ptrA), Some(Seq(dropId).toDF("doc_id")), None,
          "doc_id", "a", out, maxSegments = 1, maxMaskedRatio = 0.0))),
        keepGenerations = Some(1), markerPath = Some(s"$root/marker"),
        snapshotPath = Some(snap))
    val (r1, _) = night(s"$root/n1", 2L, rowsDf.where(col("doc_id") =!= 2L).select("doc_id"))
    assert(r1.head().getAs[Boolean]("published"))
    // keep=1 kept i2; i1 (unreferenced, unpinned) was vacuumed; a0 —
    // two generations deep — survives ONLY because the outgoing
    // snapshot named it: a reader that resolved that snapshot just
    // before the swap still reads a whole index
    assert(!new java.io.File(s"$root/i1").exists, "i1 had no pin and no window")
    assert(new java.io.File(s"$root/a0").exists,
      "the superseded snapshot's root must get one round of grace")
    assert(SideIndex.read(spark, s"$root/a0", "doc_id", "a").count() == 10L,
      "the pinned root must still serve whole")
    assert(DeploymentSnapshot.readTier(spark, snap, "a").endsWith("/n1/compacted"))
    // the NEXT round un-pins it: the snapshot has moved on, the grace
    // window closes, and retention reclaims a0 normally
    val (r2, _) = night(s"$root/n2", 3L,
      rowsDf.where(col("doc_id") =!= 2L && col("doc_id") =!= 3L).select("doc_id"))
    assert(r2.head().getAs[Boolean]("published"))
    assert(!new java.io.File(s"$root/a0").exists,
      "the grace lasts exactly one round — then the root reclaims")
  }

  test("a failed restore keeps the marker, and recover completes the gated swap") {
    val root = java.nio.file.Files.createTempDirectory("graft-nightly-restorefail").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    ServePointer.publish(spark, ptrB, s"$root/b0", "b")
    val registry = rowsDf.where(col("doc_id") =!= 2L).select("doc_id")
    val marker = s"$root/round.marker"
    // tier b's flip fails transiently (an FS hiccup), and the
    // best-effort restore of already-flipped tier a fails TOO — the
    // double-fault that used to delete the marker over a MIXED state
    var phase = 0
    ServePointer.setFenceCheckHook { p =>
      if (p == ptrB && phase == 0) {
        phase = 1; throw new RuntimeException("injected transient flip failure")
      } else if (p == ptrA && phase == 1) {
        phase = 2; ServePointer.setFenceCheckHook(_ => ())
        throw new RuntimeException("injected transient restore failure")
      }
    }
    try {
      val e = intercept[RuntimeException] {
        Nightly.run(spark, Seq(
          tier("a", registry, ptrA, () => SideIndex.maintain(spark, s"$root/a0",
            Some(Seq(2L).toDF("doc_id")), None, "doc_id", "a", s"$root/a1",
            maxMaskedRatio = 1.0)),
          tier("b", registry, ptrB, () => SideIndex.maintain(spark, s"$root/b0",
            Some(Seq(2L).toDF("doc_id")), None, "doc_id", "b", s"$root/b1",
            maxMaskedRatio = 1.0))),
          markerPath = Some(marker))
      }
      assert(e.getMessage.contains("flip failure"), e.getMessage)
    } finally ServePointer.setFenceCheckHook(_ => ())
    // mixed pointers (a on tonight, b on yesterday) AND the marker
    // stands — the heal survives exactly because the restore failed
    assert(ServePointer.read(spark, ptrA).endsWith("/a1/deleted"))
    assert(ServePointer.read(spark, ptrB).endsWith("/b0"))
    assert(new java.io.File(marker).exists,
      "a failed restore must keep the marker — it is the only heal for the mixed state")
    // the next run's entry recover (here called directly) rolls the
    // gate-approved round forward: consistent tonight, marker cleared
    val healed = Nightly.recover(spark, marker)
    assert(healed.toSet == Set("a" -> "already-current", "b" -> "completed"),
      healed.mkString(", "))
    assert(ServePointer.read(spark, ptrB).endsWith("/b1/deleted"))
    assert(!new java.io.File(marker).exists)
  }

  test("a pointer flip during the round fences that tier's swap out; the round rolls back consistent") {
    val root = java.nio.file.Files.createTempDirectory("graft-nightly-fence").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    ServePointer.publish(spark, ptrB, s"$root/b0", "b")
    // the racing writer's generation on tier b (an out-of-contract
    // second scheduler — or an ingest stream sharing the pointer)
    val intrude = SideIndex.maintain(spark, s"$root/b0", Some(Seq(5L).toDF("doc_id")),
      None, "doc_id", "b", s"$root/intrude", maxMaskedRatio = 1.0)
    val registry = rowsDf.where(col("doc_id") =!= 2L).select("doc_id")
    val marker = s"$root/round.marker"
    // fire the race at exactly tier b's flip commit point — AFTER the
    // audit passed and tier a already flipped
    ServePointer.setFenceCheckHook { p =>
      if (p == ptrB) {
        ServePointer.setFenceCheckHook(_ => ())
        ServePointer.publish(spark, ptrB, intrude, "b")
      }
    }
    try {
      val e = intercept[IllegalArgumentException] {
        Nightly.run(spark, Seq(
          tier("a", registry, ptrA, () => SideIndex.maintain(spark, s"$root/a0",
            Some(Seq(2L).toDF("doc_id")), None, "doc_id", "a", s"$root/a1",
            maxMaskedRatio = 1.0)),
          tier("b", registry, ptrB, () => SideIndex.maintain(spark, s"$root/b0",
            Some(Seq(2L).toDF("doc_id")), None, "doc_id", "b", s"$root/b1",
            maxMaskedRatio = 1.0))),
          markerPath = Some(marker))
      }
      assert(e.getMessage.contains("lost the pointer fence"), e.getMessage)
    } finally ServePointer.setFenceCheckHook(_ => ())
    // the refused round rolled tier a BACK to yesterday, never touched
    // the racing writer's generation, and left no marker (the rollback
    // restored a consistent state — a standing marker would wrongly
    // roll FORWARD next run, clobbering the racer again)
    assert(ServePointer.read(spark, ptrA).endsWith("/a0"),
      "the fenced-out round must restore the tiers it already flipped")
    assert(ServePointer.read(spark, ptrB).endsWith("/intrude/deleted"),
      "the racing writer's generation must keep serving")
    assert(!new java.io.File(marker).exists)
    assert(SideIndex.read(spark, ServePointer.read(spark, ptrB), "doc_id", "b")
      .count() == 9L)
  }

  test("a STALE payload refuses the swap like a lost tombstone (the content-audit gate)") {
    val root = java.nio.file.Files.createTempDirectory("graft-nightly-stale").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    val ptrA = s"$root/A"
    ServePointer.publish(spark, ptrA, s"$root/a0", "a")
    // tonight's truth: doc 3's payload was refreshed upstream to v+1 —
    // the id set is UNCHANGED, so the id-only audit would wave the
    // round through; only the content hashes can see it
    val registry = rowsDf.select(col("doc_id"),
      when(col("doc_id") === 3L, col("v") + 1).otherwise(col("v")).as("v"))
    def tierH(maintain: () => String): Nightly.Tier =
      Nightly.Tier("a", registry, "doc_id", ptrA, maintain,
        p => SideIndex.read(spark, p, "doc_id", "a").select(col("doc_id")),
        hashCol = Some("v"),
        liveHashes = Some(p => SideIndex.read(spark, p, "doc_id", "a")))
    // the round FORGETS the refresh (republishes a compaction): stale
    val (r1, _) = Nightly.run(spark, Seq(tierH(() => {
      SideIndex.compact(spark, s"$root/a0", s"$root/a1"); s"$root/a1"
    })))
    val row1 = r1.head()
    assert(row1.getAs[Long]("n_stale") == 1L && row1.getAs[Long]("n_missing") == 0L,
      s"exactly the unrefreshed doc is stale: $row1")
    assert(!row1.getAs[Boolean]("published"), "a stale payload must refuse the swap")
    assert(ServePointer.read(spark, ptrA).endsWith("/a0"),
      "yesterday keeps serving behind a stale-refused round")
    // the round that actually applies the refresh passes the same gate
    val (r2, _) = Nightly.run(spark, Seq(tierH(() => SideIndex.maintain(spark, s"$root/a0",
      Some(Seq(3L).toDF("doc_id")), Some(Seq((3L, 7L)).toDF("doc_id", "v")),
      "doc_id", "a", s"$root/a2", maxMaskedRatio = 1.0))))
    val row2 = r2.head()
    assert(row2.getAs[Long]("n_stale") == 0L && row2.getAs[Boolean]("published"), s"$row2")
    assert(ServePointer.read(spark, ptrA).endsWith("/a2/updated"))
  }

  test("one slipped tier refuses the WHOLE swap: yesterday's pointers serve, no release") {
    val root = java.nio.file.Files.createTempDirectory("graft-nightly-bad").toString
    SideIndex.build(rowsDf, "doc_id", "a", s"$root/a0")
    SideIndex.build(rowsDf, "doc_id", "b", s"$root/b0")
    val (ptrA, ptrB) = (s"$root/A", s"$root/B")
    ServePointer.publish(spark, ptrA, s"$root/a0")
    ServePointer.publish(spark, ptrB, s"$root/b0")
    val registry = rowsDf.where(col("doc_id") =!= 2L).select("doc_id")
    var releaseRan = false
    // tier b LOSES the tombstone (its round forgets the delete and
    // republishes a compaction instead): doc 2 still serves there —
    // the audit's n_orphaned row, which must refuse the round for
    // BOTH tiers even though a's own round was clean
    val (report, rel) = Nightly.run(spark, Seq(
      tier("a", registry, ptrA, () => SideIndex.maintain(spark, s"$root/a0",
        Some(Seq(2L).toDF("doc_id")), None, "doc_id", "a", s"$root/a1",
        maxMaskedRatio = 1.0)),
      tier("b", registry, ptrB, () => {
        SideIndex.compact(spark, s"$root/b0", s"$root/b1"); s"$root/b1"
      })),
      release = Some(() => { releaseRan = true; Seq(("en", true)).toDF("s", "published") }))
    val byTier = report.collect()
      .map(r => r.getString(0) -> (r.getLong(3), r.getLong(6), r.getBoolean(7))).toMap
    assert(byTier("b") == ((1L, 0L, false)), s"the lost tombstone must orphan: $byTier")
    assert(byTier("a") == ((0L, 1L, false)),
      s"the clean tier's row must still read published=false — the verdict is round-wide: $byTier")
    assert(!releaseRan && rel.isEmpty, "the release must NOT run behind a refused gate")
    // yesterday keeps serving on EVERY tier — including the clean one
    assert(ServePointer.read(spark, ptrA).endsWith("/a0"),
      "a refused round must not flip even the clean tier's pointer")
    assert(ServePointer.read(spark, ptrB).endsWith("/b0"))
    // tonight's clean generation is on disk for diagnosis, unserved
    assert(new java.io.File(s"$root/a1/deleted").exists)
  }
}
