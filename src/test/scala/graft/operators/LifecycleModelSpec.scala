package graft.operators

import graft.SparkTestBase

/** Model-based randomized lifecycle properties — the example drills
  * (ServePointerSpec, LifecycleHardeningSpec) pin chosen interleavings;
  * these drive LONG RANDOM op sequences against a trivial in-memory
  * reference model and assert full-state equality after every op:
  *
  *   - snapshot: `publish` (merge and replace), `retire`, resurrect
  *     refusals, retire-unknown refusals — reader view (`readIfExists`
  *     + `readRetired`) must equal the model map + tombstone set, and
  *     the fencing epoch must count EXACTLY the successful mutating
  *     commits (a refusal that bumped, or a commit that didn't, is a
  *     fence bug no single drill would catch);
  *   - pointer: `publish` (including same-root republish and
  *     roll-forward onto a history entry), `rollback`, empty-history
  *     rollback refusals — served root + ORDERED history must equal a
  *     reference stack model, epoch counts successful commits.
  *
  * The models are deliberately dumb (a Map, a Set, an ordered buffer):
  * any divergence is the operator's bug, not the model's.
  */
class LifecycleModelSpec extends SparkTestBase {
  import spark.implicits._

  private def rowsDf = (1L to 10L).map(i => (i, i * 2)).toDF("doc_id", "v")
  private def q(p: String): String = IndexManifest.qualify(spark, Seq(p)).head

  test("random snapshot op sequences match the reference model exactly, op by op") {
    val base = java.nio.file.Files.createTempDirectory("graft-snap-model").toString
    val tiers = Seq("a", "b", "c")
    val roots: Map[String, IndexedSeq[String]] = tiers.map { t =>
      t -> (0 to 2).map { g =>
        SideIndex.build(rowsDf, "doc_id", t, s"$base/$t-g$g"); s"$base/$t-g$g"
      }
    }.toMap
    val prnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 4) {
      val snap = s"$base/t$trial/SNAP"
      val model = scala.collection.mutable.Map.empty[String, String]
      val retired = scala.collection.mutable.Set.empty[String]
      var commits = 0L
      def pick() = tiers(prnd.nextInt(tiers.length))
      def rootFor(t: String) = roots(t)(prnd.nextInt(3))
      // first op is always a publish so the snapshot file exists
      for (op <- 1 to 60) {
        prnd.nextInt(if (op == 1) 1 else 4) match {
          case 0 => // merge publish of a random 1-2 tier subset
            val chosen = prnd.shuffle(tiers).take(1 + prnd.nextInt(2))
              .map(t => t -> rootFor(t))
            if (chosen.exists(c => retired(c._1))) {
              val e = intercept[IllegalArgumentException] {
                DeploymentSnapshot.publish(spark, snap, chosen)
              }
              assert(e.getMessage.contains("RETIRED"), e.getMessage)
            } else {
              DeploymentSnapshot.publish(spark, snap, chosen)
              chosen.foreach { case (t, r) => model(t) = q(r) }
              commits += 1
            }
          case 1 => // full redeploy: drops absent tiers, clears tombstones
            val chosen = prnd.shuffle(tiers).take(1 + prnd.nextInt(2))
              .map(t => t -> rootFor(t))
            DeploymentSnapshot.publish(spark, snap, chosen, replace = true)
            model.clear(); chosen.foreach { case (t, r) => model(t) = q(r) }
            retired.clear()
            commits += 1
          case 2 => // retire a random tier (known or not)
            val t = pick()
            if (model.contains(t)) {
              val r = DeploymentSnapshot.retire(spark, snap, t)
              assert(r == model(t), s"retire must return the serving root, got $r")
              model -= t; retired += t
              commits += 1
            } else {
              val e = intercept[IllegalArgumentException] {
                DeploymentSnapshot.retire(spark, snap, t)
              }
              assert(e.getMessage.contains(s"names no tier '$t'"), e.getMessage)
            }
          case 3 => () // a read-only turn: the asserts below are the op
        }
        assert(DeploymentSnapshot.readIfExists(spark, snap) == model.toMap,
          s"trial $trial op $op: reader view diverged from the model")
        assert(DeploymentSnapshot.readRetired(spark, snap) == retired.toSet,
          s"trial $trial op $op: tombstones diverged")
        assert(IndexManifest.readEpoch(spark, snap) == commits,
          s"trial $trial op $op: epoch must count exactly the successful commits")
      }
    }
  }

  test("random pointer op sequences match the reference stack model exactly, op by op") {
    val base = java.nio.file.Files.createTempDirectory("graft-ptr-model").toString
    val gens: IndexedSeq[String] = (0 to 5).map { g =>
      SideIndex.build(rowsDf, "doc_id", "t", s"$base/g$g"); s"$base/g$g"
    }
    val prnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 4) {
      val ptr = s"$base/t$trial/CURRENT"
      var current: Option[String] = None
      val hist = scala.collection.mutable.ListBuffer.empty[String]
      var commits = 0L
      def modelPublish(newQ: String): Unit = {
        current.filter(_ != newQ).foreach { prev =>
          hist --= Seq(prev); hist += prev
        }
        current = Some(newQ)
        hist --= Seq(newQ)
        commits += 1
      }
      for (op <- 1 to 60) {
        prnd.nextInt(if (op == 1) 1 else 3) match {
          case 0 => // publish a random generation (same-root republish included)
            val tgt = gens(prnd.nextInt(gens.length))
            ServePointer.publish(spark, ptr, tgt, "t")
            modelPublish(q(tgt))
          case 1 => // rollback onto the most recent previous generation
            if (hist.isEmpty) {
              val e = intercept[IllegalArgumentException] {
                ServePointer.rollback(spark, ptr, "t")
              }
              assert(e.getMessage.contains("no previous generation"), e.getMessage)
            } else {
              val expected = hist.last
              val got = ServePointer.rollback(spark, ptr, "t")
              assert(got == expected,
                s"trial $trial op $op: rollback target $got, model says $expected")
              modelPublish(expected)
            }
          case 2 => () // read-only turn
        }
        assert(current.contains(ServePointer.read(spark, ptr)),
          s"trial $trial op $op: served root diverged")
        assert(ServePointer.history(spark, ptr) == hist.toList,
          s"trial $trial op $op: ordered history diverged " +
            s"(got ${ServePointer.history(spark, ptr)}, model $hist)")
        assert(ServePointer.epoch(spark, ptr) == commits,
          s"trial $trial op $op: epoch must count exactly the successful commits")
      }
    }
  }
}
