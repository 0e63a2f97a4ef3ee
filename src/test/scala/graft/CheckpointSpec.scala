package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{CheckpointConfig, CheckpointCorruptException, CheckpointManager, CheckpointPolicy, Checkpoints}

/** Checkpoint manager semantics ported from the reference
  * (reference: src/checkpoint.rs): policy evaluation, save/recover
  * roundtrip, newest-wins recovery, retention sweep, and checksum-based
  * rejection of corrupt or torn checkpoints.
  */
class CheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("graft-ckpt-").toString
    d
  }

  private def mgr(dir: String, keep: Option[Int] = Some(10)) =
    new CheckpointManager(CheckpointConfig(directory = dir, maxCheckpoints = keep))

  test("policy: AfterEveryBarrier fires only on barriers") {
    val m = mgr(freshDir())
    assert(m.shouldCheckpoint(3, isBarrier = true))
    assert(!m.shouldCheckpoint(3, isBarrier = false))
  }

  test("policy: EveryNNodes fires on multiples of n, never at node 0") {
    val m = new CheckpointManager(CheckpointConfig(
      directory = freshDir(), policy = CheckpointPolicy.EveryNNodes(3)))
    assert(!m.shouldCheckpoint(0, isBarrier = true))
    assert(!m.shouldCheckpoint(2, isBarrier = true))
    assert(m.shouldCheckpoint(3, isBarrier = false))
    assert(m.shouldCheckpoint(6, isBarrier = false))
  }

  test("policy: TimeInterval fires when the interval elapsed; Hybrid is OR") {
    val ti = new CheckpointManager(CheckpointConfig(
      directory = freshDir(), policy = CheckpointPolicy.TimeInterval(60)))
    // no checkpoint yet -> due immediately
    assert(ti.shouldCheckpoint(1, isBarrier = false, nowMs = 1000000L))
    ti.lastCheckpointTimeMs = Some(1000000L)
    assert(!ti.shouldCheckpoint(1, isBarrier = false, nowMs = 1000000L + 59000))
    assert(ti.shouldCheckpoint(1, isBarrier = false, nowMs = 1000000L + 60000))

    val hy = new CheckpointManager(CheckpointConfig(
      directory = freshDir(), policy = CheckpointPolicy.Hybrid(barriers = true, intervalSecs = 60)))
    hy.lastCheckpointTimeMs = Some(1000000L)
    assert(hy.shouldCheckpoint(1, isBarrier = true, nowMs = 1000000L + 1))
    assert(!hy.shouldCheckpoint(1, isBarrier = false, nowMs = 1000000L + 1))
    assert(hy.shouldCheckpoint(1, isBarrier = false, nowMs = 1000000L + 61000))
  }

  test("disabled config never checkpoints") {
    val m = new CheckpointManager(CheckpointConfig(
      enabled = false, directory = freshDir()))
    assert(!m.shouldCheckpoint(5, isBarrier = true))
  }

  test("save / findLatest / load roundtrip preserves the relation") {
    val m = mgr(freshDir())
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    m.save(df, "pipe", timestamp = 100L)
    m.save(df.where(col("id") <= 10), "pipe", timestamp = 200L)
    val latest = m.findLatest("pipe").get
    assert(latest.getFileName.toString == "checkpoint_pipe_200")
    val loaded = m.load(spark, latest)
    assert(loaded.count() == 10)
    // pipelines are isolated by id
    assert(m.findLatest("otherpipe").isEmpty)
  }

  test("retention keeps only the newest maxCheckpoints") {
    val dir = freshDir()
    val m = mgr(dir, keep = Some(2))
    val df = Seq((1L, "a")).toDF("id", "v")
    m.save(df, "p", timestamp = 1L)
    m.save(df, "p", timestamp = 2L)
    m.save(df, "p", timestamp = 3L)
    val remaining = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(remaining.length == 2, remaining.mkString(","))
    assert(remaining.exists(_.endsWith("checkpoint_p_2")) && remaining.exists(_.endsWith("checkpoint_p_3")))
  }

  test("corrupt checksum is rejected by load; recoverLatest falls back to newest valid") {
    val m = mgr(freshDir())
    val df = (1 to 20).map(i => (i.toLong, i * 2L)).toDF("id", "dbl")
    m.save(df, "p", timestamp = 100L)
    val d2 = m.save(df.where(col("id") <= 5), "p", timestamp = 200L)
    // tamper the newest checkpoint's metadata
    val metaPath = d2.resolve(Checkpoints.MetaFile)
    val tampered = new String(Files.readAllBytes(metaPath), "UTF-8")
      .replaceAll("checksum=.*", "checksum=0000")
    Files.write(metaPath, tampered.getBytes("UTF-8"))

    intercept[CheckpointCorruptException] { m.load(spark, d2) }
    val recovered = m.recoverLatest(spark, "p").get
    assert(recovered.count() == 20, "should fall back to the ts=100 full snapshot")
  }

  test("a torn checkpoint (no metadata) is invisible to discovery") {
    val dir = freshDir()
    val m = mgr(dir)
    val df = Seq((1L, "a")).toDF("id", "v")
    m.save(df, "p", timestamp = 100L)
    // simulate a crash mid-save: snapshot dir exists, metadata never written
    val torn = Paths.get(dir, "checkpoint_p_999")
    Files.createDirectories(torn)
    assert(m.findLatest("p").get.getFileName.toString == "checkpoint_p_100")
  }

  test("clear removes all checkpoints for the pipeline id only") {
    val m = mgr(freshDir())
    val df = Seq((1L, "a")).toDF("id", "v")
    m.save(df, "a", timestamp = 1L)
    m.save(df, "b", timestamp = 1L)
    m.clear("a")
    assert(m.findLatest("a").isEmpty)
    assert(m.findLatest("b").nonEmpty)
  }

  test("PCollection.checkpointWith resumes from the snapshot after a 'crash'") {
    val dir = freshDir()
    val m1 = mgr(dir)
    val pc = PCollection.fromSeq(spark, (1 to 100).map(i => (i.toLong, s"v$i")))
    val resumed = pc.checkpointWith(m1, "pipe")
    assert(resumed.count() == 100)
    // simulate a crashed driver: a brand-new manager over the same dir
    // recovers the snapshot without the original lineage
    val m2 = mgr(dir)
    val recovered = m2.recoverLatest(spark, "pipe").get
    assert(recovered.count() == 100)
    assert(recovered.columns.toSet == Set("_1", "_2"))
  }

  test("checkpointWith defers the snapshot write to the first downstream action") {
    // same deferred contract as waitOn: wiring a pipeline with a
    // checkpoint barrier must not run a write job — only the first
    // action on the returned collection does
    val dir = freshDir()
    val m = mgr(dir)
    val pc = PCollection.fromSeq(spark, (1 to 10).map(i => (i.toLong, s"v$i")))
    val resumed = pc.checkpointWith(m, "lazy-pipe")
    // composing further transforms is still wiring, not execution
    val downstream = resumed.map(_._1)
    assert(m.findLatest("lazy-pipe").isEmpty,
      "checkpoint snapshot written at wiring time; save must run inside the lazy thunk")
    assert(downstream.collect().toSet == (1L to 10L).toSet)
    assert(m.findLatest("lazy-pipe").nonEmpty,
      "first downstream action must have materialized the snapshot")
  }

  test("checksum and pipeline id are stable functions") {
    assert(Checkpoints.checksumOf("p", 1L, 2L, 3) == Checkpoints.checksumOf("p", 1L, 2L, 3))
    assert(Checkpoints.checksumOf("p", 1L, 2L, 3) != Checkpoints.checksumOf("p", 1L, 2L, 4))
    assert(Checkpoints.pipelineId("some plan").length == 16)
  }
}
