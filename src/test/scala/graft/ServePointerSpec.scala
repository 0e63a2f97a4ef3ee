package graft

import graft.operators.{IndexManifest, ServePointer, SideIndex}
import org.apache.spark.sql.functions._

/** Serve pointer + reachability-aware generation GC — the deployment
  * lifecycle over the segmented index families.
  */
class ServePointerSpec extends SparkTestBase {
  import spark.implicits._

  private def rowsDf = (1L to 20L).map(i => (i, i * 10)).toDF("doc_id", "payload")

  test("pointer flips atomically, reads back, and refuses unservable targets") {
    val root = java.nio.file.Files.createTempDirectory("graft-ptr").toString
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    val ptr = s"$root/CURRENT"
    // no pointer yet: read refuses
    assert(intercept[IllegalArgumentException] { ServePointer.read(spark, ptr) }
      .getMessage.contains("publishPointer has never run"))
    // a target with no manifest can never be pointed at
    assert(intercept[IllegalArgumentException] {
      ServePointer.publish(spark, ptr, s"$root/nowhere")
    }.getMessage.contains("manifest missing"))
    ServePointer.publish(spark, ptr, s"$root/gen0")
    val served = ServePointer.read(spark, ptr)
    assert(served.endsWith("/gen0"), served)
    // the pointer composes with the tier's read entry point
    assert(SideIndex.read(spark, served, "doc_id", "t").count() == 20L)
    // re-publish flips to the new root (overwrite rename, no residue)
    SideIndex.compact(spark, s"$root/gen0", s"$root/gen1")
    ServePointer.publish(spark, ptr, s"$root/gen1")
    assert(ServePointer.read(spark, ptr).endsWith("/gen1"))
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val residue = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("CURRENT.tmp"))
    assert(residue.isEmpty, s"temp pointer residue: ${residue.mkString(", ")}")
  }

  test("vacuum deletes only fully-unreachable roots and the served relation survives byte-for-byte") {
    val b = java.nio.file.Files.createTempDirectory("graft-vac-b").toString
    val o1 = java.nio.file.Files.createTempDirectory("graft-vac-o1").toString
    val o2 = java.nio.file.Files.createTempDirectory("graft-vac-o2").toString
    val ptr = s"$b/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$b/base")
    // round 1: delete + re-key, NO compaction — o1/updated carries
    // b/base's segment by reference
    val served1 = SideIndex.maintain(spark, s"$b/base",
      deletes = Some(rowsDf.where(col("doc_id") % 4 === 0).select("doc_id")),
      increment = Some(rowsDf.where(col("doc_id") % 8 === 0)
        .select(col("doc_id"), (col("payload") + 1).as("payload"))),
      "doc_id", "t", o1, maxSegments = 8, maxMaskedRatio = 1.0)
    assert(served1 == s"$o1/updated")
    ServePointer.publish(spark, ptr, served1)
    // the base root is still REACHED (its segment is carried): refuse
    val e1 = intercept[IllegalArgumentException] {
      ServePointer.vacuum(spark, ptr, Seq(s"$b/base"))
    }
    assert(e1.getMessage.contains("carries by reference"), e1.getMessage)
    // the served root itself, and anything containing it, refuses
    assert(intercept[IllegalArgumentException] {
      ServePointer.vacuum(spark, ptr, Seq(served1))
    }.getMessage.contains("SERVED root"))
    assert(intercept[IllegalArgumentException] {
      ServePointer.vacuum(spark, ptr, Seq(o1))
    }.getMessage.contains("SERVED root"))
    // a refused vacuum deletes NOTHING — regardless of argument order:
    // validation runs over EVERY root before any deletion, so a
    // deletable root listed before a still-referenced one survives
    val disposable = s"$o1/disposable"
    SideIndex.build(rowsDf, "doc_id", "t2", disposable)
    assert(intercept[IllegalArgumentException] {
      ServePointer.vacuum(spark, ptr, Seq(disposable, s"$b/base"))
    }.getMessage.contains("carries by reference"))
    assert(new java.io.File(disposable).exists,
      "a refusal on a LATER root must not have deleted an earlier one")
    ServePointer.vacuum(spark, ptr, Seq(disposable)): Unit
    assert(!new java.io.File(disposable).exists)
    assert(SideIndex.read(spark, served1, "doc_id", "t").count() == 17L)
    // round 2: another churn, compaction FORCED — o2/compacted is
    // self-contained, so every prior root becomes fully unreachable
    val served2 = SideIndex.maintain(spark, served1,
      deletes = Some(rowsDf.where(col("doc_id") === 1L).select("doc_id")),
      increment = Some(Seq((101L, 5L)).toDF("doc_id", "payload")),
      "doc_id", "t", o2, maxSegments = 1)
    assert(served2 == s"$o2/compacted")
    ServePointer.publish(spark, ptr, served2)
    val pre = SideIndex.read(spark, served2, "doc_id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val retired = Seq(s"$b/base", s"$o1/deleted", s"$o1/updated",
      s"$o2/deleted", s"$o2/updated")
    val report = ServePointer.vacuum(spark, ptr, retired)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(report.length == 5 && report.forall(_._2 > 0L),
      s"every retired root held files to delete: ${report.mkString(", ")}")
    retired.foreach { r =>
      assert(!new java.io.File(r).exists, s"retired root $r must be gone")
    }
    // the compacted generation is untouched and serves hash-identically
    assert(new java.io.File(s"$o2/compacted").exists)
    val post = SideIndex.read(spark, served2, "doc_id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(post == pre, "vacuum changed the served relation")
    // and through the pointer, end to end
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == pre.length.toLong)
    // crash-safe re-run: an already-absent root is a zero-row no-op
    val again = ServePointer.vacuum(spark, ptr, retired)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(again.forall(_ == (0L, 0L)), s"re-vacuum must be a no-op: ${again.mkString(", ")}")
    // disk now holds ONLY the reachable generation (plus the pointer):
    // o1 and o2 contain nothing but the served root's tree
    val fs = new org.apache.hadoop.fs.Path(o2)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftover = fs.listStatus(new org.apache.hadoop.fs.Path(o2)).map(_.getPath.getName)
    assert(leftover.toSet == Set("compacted"), leftover.mkString(", "))
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(o1)).isEmpty)
  }

  test("publish records the generation history; rollback flips onto the previous generation") {
    val root = java.nio.file.Files.createTempDirectory("graft-rb").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0")
    assert(ServePointer.history(spark, ptr).isEmpty,
      "a first publish supersedes nothing")
    // nothing to roll back onto yet
    assert(intercept[IllegalArgumentException] { ServePointer.rollback(spark, ptr) }
      .getMessage.contains("no previous generation"))
    val g1 = SideIndex.maintain(spark, s"$root/gen0",
      deletes = Some(rowsDf.where(col("doc_id") % 4 === 0).select("doc_id")),
      increment = None, "doc_id", "t", s"$root/o1", maxMaskedRatio = 1.0)
    ServePointer.publish(spark, ptr, g1)
    val h1 = ServePointer.history(spark, ptr)
    assert(h1.length == 1 && h1.head.endsWith("/gen0"), h1.mkString(", "))
    // tonight's generation "misbehaves": roll back — gen0 serves again
    // (all 20 rows), and the abandoned g1 moves into the history
    val back = ServePointer.rollback(spark, ptr)
    assert(back.endsWith("/gen0") && ServePointer.read(spark, ptr) == back)
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == 20L)
    val h2 = ServePointer.history(spark, ptr)
    assert(h2.length == 1 && h2.head.endsWith("/o1/deleted"), h2.mkString(", "))
    // roll FORWARD by re-publishing the abandoned generation: history
    // swaps back, never accretes duplicates or the current root
    ServePointer.publish(spark, ptr, g1)
    val h3 = ServePointer.history(spark, ptr)
    assert(h3.length == 1 && h3.head.endsWith("/gen0"), h3.mkString(", "))
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == 15L)
  }

  test("a history crash window (current root listed in its own history) is benign and self-heals") {
    val root = java.nio.file.Files.createTempDirectory("graft-hist-crash").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0")
    val g1 = SideIndex.maintain(spark, s"$root/gen0",
      deletes = Some(rowsDf.where(col("doc_id") % 4 === 0).select("doc_id")),
      increment = None, "doc_id", "t", s"$root/o1", maxMaskedRatio = 1.0)
    ServePointer.publish(spark, ptr, g1)
    val current = ServePointer.read(spark, ptr)
    val gen0Q = ServePointer.history(spark, ptr).head
    // out-of-band history writes go through the Hadoop FS (the local
    // FS keeps checksum sidecars a raw java.nio write would corrupt)
    def injectHistory(content: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(s"$ptr.history")
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(hp, true)
      try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    // simulate the two-phase write's crash window: the CURRENT root
    // appears in its own history (pre-flip append landed, post-flip
    // prune did not)
    injectHistory(s"$gen0Q\n$current")
    // every consumer filters the current root: rollback still targets
    // the real previous generation, never a self-flip
    val back = ServePointer.rollback(spark, ptr)
    assert(back == gen0Q, s"rollback must skip the crash residue, got $back")
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == 20L)
    // roll forward; then re-inject the residue and let a publish of
    // the CURRENT root prune it (the documented self-heal)
    ServePointer.publish(spark, ptr, g1)
    injectHistory(s"$gen0Q\n${ServePointer.read(spark, ptr)}")
    ServePointer.publish(spark, ptr, g1)
    val healed = ServePointer.history(spark, ptr)
    assert(healed.length == 1 && healed.head == gen0Q,
      s"re-publishing the current root must prune the residue: ${healed.mkString(", ")}")
    // retention with residue present also stays safe: the current root
    // is filtered, the carried gen0 is HELD, nothing is deleted
    injectHistory(s"$gen0Q\n${ServePointer.read(spark, ptr)}")
    val rep = ServePointer.retain(spark, ptr, keep = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rep == Seq((gen0Q, "held")), rep.mkString(", "))
    assert(new java.io.File(g1).exists && SideIndex.read(spark, g1, "doc_id", "t")
      .count() == 15L)
  }

  test("the epoch fence: a racing publish makes an in-flight vacuum refuse and delete nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft-fence").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    assert(ServePointer.epoch(spark, ptr) == 0L, "no lifecycle op has committed yet")
    ServePointer.publish(spark, ptr, s"$root/gen0")
    assert(ServePointer.epoch(spark, ptr) == 1L, "every committed publish bumps the epoch")
    SideIndex.compact(spark, s"$root/gen0", s"$root/gen1")
    ServePointer.publish(spark, ptr, s"$root/gen1")
    assert(ServePointer.epoch(spark, ptr) == 2L)
    // a SECOND scheduler's round, built from the old base: it carries
    // gen0's segment by reference (no compaction)
    val gen2 = SideIndex.maintain(spark, s"$root/gen0",
      deletes = Some(Seq(1L).toDF("doc_id")), increment = None,
      "doc_id", "t", s"$root/o2", maxMaskedRatio = 1.0)
    // interleave the race at exactly the vacuum's commit point: the
    // vacuum validated gen0 as unreachable (the served gen1 is
    // self-contained), and then the racing publish flips the pointer
    // onto gen2 — which SERVES THROUGH gen0
    ServePointer.setFenceCheckHook { _ =>
      ServePointer.setFenceCheckHook(_ => ()) // the racer itself must not recurse
      ServePointer.publish(spark, ptr, gen2)
    }
    try {
      val e = intercept[IllegalArgumentException] {
        ServePointer.vacuum(spark, ptr, Seq(s"$root/gen0"))
      }
      assert(e.getMessage.contains("lost the pointer fence"), e.getMessage)
    } finally ServePointer.setFenceCheckHook(_ => ())
    // the loser deleted NOTHING: gen0 survives, and the relation the
    // winning publish serves reads back whole through it
    assert(new java.io.File(s"$root/gen0").exists,
      "the fenced-out vacuum must not have deleted the root the new pointer serves through")
    assert(ServePointer.read(spark, ptr).endsWith("/o2/deleted"))
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == 19L)
    // a FRESH vacuum attempt now sees the new reachability and refuses
    // on the merits, not the fence
    assert(intercept[IllegalArgumentException] {
      ServePointer.vacuum(spark, ptr, Seq(s"$root/gen0"))
    }.getMessage.contains("carries by reference"))
    // rollback is fenced-and-bumping too
    val eBefore = ServePointer.epoch(spark, ptr)
    ServePointer.rollback(spark, ptr): Unit
    assert(ServePointer.epoch(spark, ptr) == eBefore + 1)
  }

  test("retention heals an absent history entry even when a raised keep pulls it inside the window") {
    val root = java.nio.file.Files.createTempDirectory("graft-retain-heal").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/gen0")
    ServePointer.publish(spark, ptr, s"$root/gen0")
    SideIndex.compact(spark, s"$root/gen0", s"$root/gen1")
    ServePointer.publish(spark, ptr, s"$root/gen1")
    SideIndex.compact(spark, s"$root/gen1", s"$root/gen2")
    ServePointer.publish(spark, ptr, s"$root/gen2")
    val hist = ServePointer.history(spark, ptr)
    assert(hist.length == 2 && hist.last.endsWith("/gen1"), hist.mkString(", "))
    // simulate a prior round's crash between vacuum and history
    // rewrite: gen1's root is gone but its entry still stands — and a
    // RAISED keep now pulls the dangling entry inside the kept window,
    // where loading its handle used to wedge retention outright
    val g1 = new org.apache.hadoop.fs.Path(s"$root/gen1")
    assert(g1.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(g1, true))
    val rep = ServePointer.retain(spark, ptr, keep = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rep == Seq((hist.last, "absent", 0L)),
      s"the dangling entry must report absent, not wedge: ${rep.mkString(", ")}")
    val healed = ServePointer.history(spark, ptr)
    assert(healed.length == 1 && healed.head.endsWith("/gen0"),
      s"the absent entry must leave the history: ${healed.mkString(", ")}")
    // nothing else moved: gen0 is still the (kept) rollback window and
    // the served generation is untouched
    assert(new java.io.File(s"$root/gen0").exists)
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == 20L)
    // the next shrink reclaims the survivor normally
    val rep2 = ServePointer.retain(spark, ptr, keep = 0)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rep2.length == 1 && rep2.head._1.endsWith("/gen0") && rep2.head._2 == "vacuumed")
    assert(!new java.io.File(s"$root/gen0").exists)
  }

  test("retain vacuums unreachable history, HOLDS carried generations, and is transitive both ways") {
    val root = java.nio.file.Files.createTempDirectory("graft-retain").toString
    val ptr = s"$root/CURRENT"
    SideIndex.build(rowsDf, "doc_id", "t", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base")
    // round A compacts: gA is self-contained, so base becomes garbage
    val gA = SideIndex.maintain(spark, s"$root/base",
      deletes = Some(rowsDf.where(col("doc_id") % 4 === 0).select("doc_id")),
      increment = None, "doc_id", "t", s"$root/oA", maxSegments = 1)
    assert(gA == s"$root/oA/compacted")
    ServePointer.publish(spark, ptr, gA)
    // round B does NOT compact: gB carries gA's segment by reference
    val gB = SideIndex.maintain(spark, gA,
      deletes = Some(Seq(1L).toDF("doc_id")), increment = None,
      "doc_id", "t", s"$root/oB", maxMaskedRatio = 1.0)
    assert(gB == s"$root/oB/deleted")
    ServePointer.publish(spark, ptr, gB)
    val pre = SideIndex.read(spark, gB, "doc_id", "t")
      .collect().map(_.getLong(0)).sorted.toSeq
    // keep=0: base is unreachable → vacuumed; gA is carried by the
    // SERVED generation → held, not refused — retention composes with
    // an uncompacted round
    val r1 = ServePointer.retain(spark, ptr, keep = 0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(r1.exists(r => r._1.endsWith("/base") && r._2 == "vacuumed" && r._3 > 0L), r1.mkString(", "))
    assert(r1.exists(r => r._1.endsWith("/oA/compacted") && r._2 == "held"), r1.mkString(", "))
    assert(!new java.io.File(s"$root/base").exists, "base must be vacuumed")
    assert(new java.io.File(gA).exists, "a held generation must survive")
    val hAfter = ServePointer.history(spark, ptr)
    assert(hAfter.length == 1 && hAfter.head.endsWith("/oA/compacted"),
      s"held entries stay in history: ${hAfter.mkString(", ")}")
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .collect().map(_.getLong(0)).sorted.toSeq == pre)
    // round C compacts: gC self-contained; history = [gA, gB]
    val gC = SideIndex.maintain(spark, gB,
      deletes = Some(Seq(2L).toDF("doc_id")), increment = None,
      "doc_id", "t", s"$root/oC", maxSegments = 1, maxMaskedRatio = 0.0)
    assert(gC == s"$root/oC/compacted")
    ServePointer.publish(spark, ptr, gC)
    // keep=1: the rollback window keeps gB, and gB still carries gA —
    // the KEPT generation's references hold gA alive (transitivity
    // through the window, not just the served root)
    val r2 = ServePointer.retain(spark, ptr, keep = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(r2.length == 1 && r2.head._1.endsWith("/oA/compacted") && r2.head._2 == "held",
      r2.mkString(", "))
    assert(new java.io.File(gA).exists && new java.io.File(gB).exists)
    // keep=0: nothing surviving references gB or gA any more — BOTH
    // fall in one round (newest-first: gB retired, so gA unpinned)
    val r3 = ServePointer.retain(spark, ptr, keep = 0)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(r3.length == 2 && r3.forall(r => r._2 == "vacuumed" && r._3 > 0L), r3.mkString(", "))
    assert(!new java.io.File(gA).exists && !new java.io.File(gB).exists)
    assert(ServePointer.history(spark, ptr).isEmpty)
    // the served generation is untouched; rollback now refuses
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == pre.length - 1L)
    assert(intercept[IllegalArgumentException] { ServePointer.rollback(spark, ptr) }
      .getMessage.contains("no previous generation"))
  }
}
