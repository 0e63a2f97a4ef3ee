package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Policy for when checkpoints are created during execution
  * (reference: CheckpointPolicy, src/checkpoint.rs:98-110).
  */
sealed trait CheckpointPolicy
object CheckpointPolicy {
  /** Checkpoint after every barrier (shuffle-producing) node. */
  case object AfterEveryBarrier extends CheckpointPolicy
  /** Checkpoint after every N nodes in the execution chain. */
  final case class EveryNNodes(n: Int) extends CheckpointPolicy
  /** Checkpoint after approximately every N seconds of execution. */
  final case class TimeInterval(secs: Long) extends CheckpointPolicy
  /** Barriers and/or time interval — the most frequent schedule. */
  final case class Hybrid(barriers: Boolean, intervalSecs: Long) extends CheckpointPolicy
}

/** Checkpoint behavior configuration (reference: CheckpointConfig,
  * src/checkpoint.rs:66-96; same defaults: policy AfterEveryBarrier,
  * auto-recover on, retain 10).
  */
final case class CheckpointConfig(
    enabled: Boolean = true,
    directory: String,
    policy: CheckpointPolicy = CheckpointPolicy.AfterEveryBarrier,
    autoRecover: Boolean = true,
    maxCheckpoints: Option[Int] = Some(10)
)

/** Metadata persisted alongside each checkpoint's parquet snapshot
  * (reference: CheckpointState, src/checkpoint.rs:112-135). The
  * checksum is SHA-256 over the metadata identity string — the same
  * integrity scheme as the reference (src/checkpoint.rs:382-393).
  */
final case class CheckpointMeta(
    pipelineId: String,
    timestamp: Long,
    rowCount: Long,
    fileCount: Int,
    checksum: String
)

final class CheckpointCorruptException(msg: String) extends RuntimeException(msg)

/** Checkpoint creation, recovery, retention and integrity on Spark.
  *
  * The reference checkpoints progress markers and re-executes from the
  * last barrier (src/checkpoint.rs:112-118); the Spark-native analog
  * checkpoints the *relation itself* as a parquet snapshot — on
  * recovery the pipeline resumes from materialized data instead of
  * recomputing the upstream lineage, which is exactly what Spark's own
  * `Dataset.checkpoint` does minus the recover-across-JVMs story this
  * class adds. Layout: `<dir>/checkpoint_<pipelineId>_<timestamp>/`
  * holding the snapshot plus `_graft_checkpoint.meta` (identity +
  * checksum). Parquet keeps the snapshot splittable and
  * schema-carrying at any scale; metadata I/O is a single tiny file per
  * checkpoint, so driver-side listing stays O(#checkpoints).
  *
  * Semantics ported from the reference:
  *  - [[shouldCheckpoint]]  — policy evaluation (checkpoint.rs:170-205)
  *  - [[save]]              — write + fsync'd metadata + retention sweep
  *                            (save_checkpoint, checkpoint.rs:211-236)
  *  - [[findLatest]]        — newest by timestamp encoded in the dir name
  *                            (find_latest_checkpoint, checkpoint.rs:236-280)
  *  - [[load]]              — checksum-validated load; corrupt metadata
  *                            rejected (load_checkpoint, checkpoint.rs:284-310)
  *  - [[recoverLatest]]     — auto-recover: newest valid checkpoint wins,
  *                            corrupt ones are skipped (runner auto_recover)
  *  - [[clear]]             — drop all checkpoints for a pipeline
  *                            (clear_checkpoints, checkpoint.rs:360-380)
  */
final class CheckpointManager(val config: CheckpointConfig) {

  @volatile private[graft] var lastCheckpointTimeMs: Option[Long] = None

  if (config.enabled) Files.createDirectories(Paths.get(config.directory))

  /** Policy evaluation (reference: should_checkpoint,
    * src/checkpoint.rs:170-205). `nowMs` is injectable for tests.
    */
  def shouldCheckpoint(
      nodeIndex: Int,
      isBarrier: Boolean,
      nowMs: Long = System.currentTimeMillis()
  ): Boolean = {
    if (!config.enabled) return false
    def timeDue(intervalSecs: Long): Boolean =
      lastCheckpointTimeMs.forall(last => nowMs - last >= intervalSecs * 1000L)
    config.policy match {
      case CheckpointPolicy.AfterEveryBarrier => isBarrier
      case CheckpointPolicy.EveryNNodes(n)    => nodeIndex > 0 && n > 0 && nodeIndex % n == 0
      case CheckpointPolicy.TimeInterval(s)   => timeDue(s)
      case CheckpointPolicy.Hybrid(barriers, s) => (barriers && isBarrier) || timeDue(s)
    }
  }

  private def dirFor(pipelineId: String, timestamp: Long): Path =
    Paths.get(config.directory, s"checkpoint_${pipelineId}_$timestamp")

  /** Write a checkpoint snapshot + metadata, then apply retention.
    * Returns the checkpoint directory. The metadata file is written
    * last, so a crash mid-write leaves a metadata-less (= invisible,
    * never recovered) directory rather than a torn checkpoint.
    */
  def save(
      df: DataFrame,
      pipelineId: String,
      timestamp: Long = System.currentTimeMillis()
  ): Path = {
    require(config.enabled, "checkpointing is disabled")
    val dir = dirFor(pipelineId, timestamp)
    // observe folds the row count into the write job itself — one scan
    // per checkpoint, no second read-back pass over the snapshot
    val obs = org.apache.spark.sql.Observation(s"ckpt_${pipelineId}_$timestamp")
    df.observe(obs, org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write.mode("overwrite").parquet(dir.toString)
    val files = listDataFiles(dir)
    val rowCount = obs.get("rows").asInstanceOf[Long]
    val meta = CheckpointMeta(
      pipelineId, timestamp, rowCount, files.size,
      Checkpoints.checksumOf(pipelineId, timestamp, rowCount, files.size))
    writeMeta(dir, meta)
    lastCheckpointTimeMs = Some(System.currentTimeMillis())
    cleanupOld(pipelineId)
    dir
  }

  /** Newest checkpoint directory for the pipeline, by the timestamp
    * encoded in the directory name — only directories that finished
    * writing metadata count.
    */
  def findLatest(pipelineId: String): Option[Path] =
    listCheckpoints(pipelineId).lastOption.map(_._2)

  /** Load one checkpoint, validating metadata integrity. Throws
    * [[CheckpointCorruptException]] on a checksum/shape mismatch.
    */
  def load(spark: SparkSession, dir: Path): DataFrame = {
    val meta = readMeta(dir).getOrElse(
      throw new CheckpointCorruptException(s"missing checkpoint metadata in $dir"))
    val expected = Checkpoints.checksumOf(meta.pipelineId, meta.timestamp, meta.rowCount, meta.fileCount)
    if (expected != meta.checksum)
      throw new CheckpointCorruptException(
        s"checkpoint integrity check failed in $dir: checksum mismatch")
    val nFiles = listDataFiles(dir).size
    if (nFiles != meta.fileCount)
      throw new CheckpointCorruptException(
        s"checkpoint integrity check failed in $dir: expected ${meta.fileCount} data files, found $nFiles")
    spark.read.parquet(dir.toString)
  }

  /** Auto-recovery: newest checkpoint that passes integrity validation
    * (corrupt or torn checkpoints are skipped, falling back to the next
    * newest — a stricter caller can [[load]] [[findLatest]] directly to
    * fail fast instead).
    */
  def recoverLatest(spark: SparkSession, pipelineId: String): Option[DataFrame] = {
    val candidates = listCheckpoints(pipelineId).reverse
    candidates.iterator.flatMap { case (_, dir) =>
      try Some(load(spark, dir))
      catch { case _: CheckpointCorruptException => None }
    }.nextOption()
  }

  /** Drop checkpoints beyond `maxCheckpoints`, oldest first. */
  private def cleanupOld(pipelineId: String): Unit =
    config.maxCheckpoints.foreach { keep =>
      val cps = listCheckpoints(pipelineId)
      cps.dropRight(keep).foreach { case (_, dir) => deleteRecursively(dir) }
    }

  /** Delete all checkpoints for a pipeline. */
  def clear(pipelineId: String): Unit =
    listCheckpoints(pipelineId).foreach { case (_, dir) => deleteRecursively(dir) }

  /** (timestamp, dir) ascending by timestamp; metadata-less dirs are
    * in-flight or torn and never listed.
    */
  private def listCheckpoints(pipelineId: String): Seq[(Long, Path)] = {
    val base = Paths.get(config.directory)
    if (!Files.isDirectory(base)) return Seq.empty
    val prefix = s"checkpoint_${pipelineId}_"
    Files.list(base).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith(prefix))
      .flatMap { p =>
        val ts = p.getFileName.toString.stripPrefix(prefix)
        ts.toLongOption.filter(_ => Files.exists(p.resolve(Checkpoints.MetaFile))).map(_ -> p)
      }
      .toSeq.sortBy(_._1)
  }

  private def listDataFiles(dir: Path): Seq[Path] =
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .toSeq.sortBy(_.getFileName.toString)

  private def writeMeta(dir: Path, meta: CheckpointMeta): Unit = {
    val body =
      s"""pipelineId=${meta.pipelineId}
         |timestamp=${meta.timestamp}
         |rowCount=${meta.rowCount}
         |fileCount=${meta.fileCount}
         |checksum=${meta.checksum}
         |""".stripMargin
    Files.write(dir.resolve(Checkpoints.MetaFile), body.getBytes(StandardCharsets.UTF_8))
  }

  private[sources] def readMeta(dir: Path): Option[CheckpointMeta] = {
    val f = dir.resolve(Checkpoints.MetaFile)
    if (!Files.exists(f)) return None
    val kv = new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap
    for {
      pid <- kv.get("pipelineId")
      ts <- kv.get("timestamp").flatMap(_.toLongOption)
      rc <- kv.get("rowCount").flatMap(_.toLongOption)
      fc <- kv.get("fileCount").flatMap(_.toIntOption)
      cs <- kv.get("checksum")
    } yield CheckpointMeta(pid, ts, rc, fc, cs)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).iterator().asScala.toSeq.foreach(deleteRecursively)
    Files.deleteIfExists(p): Unit
  }
}

object Checkpoints {

  val MetaFile = "_graft_checkpoint.meta"

  /** SHA-256 hex of a string (reference: compute_checksum,
    * src/checkpoint.rs:382-393).
    */
  def sha256Hex(s: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Checksum over the metadata identity string — the reference's
    * `pipeline_id:completed_node_index:timestamp:partition_count`
    * scheme (src/checkpoint.rs:284-310) with rowCount/fileCount as the
    * snapshot-shape analog of node-index/partition-count.
    */
  def checksumOf(pipelineId: String, timestamp: Long, rowCount: Long, fileCount: Int): String =
    sha256Hex(s"$pipelineId:$timestamp:$rowCount:$fileCount")

  /** Stable pipeline id from a logical-plan description (reference:
    * generate_pipeline_id, src/checkpoint.rs:396-406 — first 16 hex
    * chars of the SHA-256).
    */
  def pipelineId(planDescription: String): String =
    sha256Hex(planDescription).take(16)
}
