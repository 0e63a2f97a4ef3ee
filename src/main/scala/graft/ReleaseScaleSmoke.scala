package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Scaling smoke for the incremental-release tier — the publish-side
  * sibling of [[RetrievalScaleSmoke]]: replicate the release registry
  * N times (fresh ids, token counts unchanged) and run ONE
  * [[Curation.maintainRelease]] round whose churn touches a SINGLE
  * stratum, at 1x and Nx. The claim under test is the release tier's
  * 100 TB posture: publish bytes are O(changed shards), never a full
  * republish — a daily churn confined to one language must leave
  * every other language's shard files untouched ON DISK. Wall-clock
  * is printed for the record; the ASSERTED properties are exact:
  *
  *  - locality: every file created or modified by the round lives
  *    under the churned stratum's partition, `_removed/` or the
  *    commit marker — and no `_staged/` residue survives a clean
  *    round.
  *  - byte-identity: all other files are untouched — same name,
  *    length, AND mtime (the [[CurationSpec]] toy assertion, held at
  *    20x).
  *  - the delta law at scale: the maintained tree read back through
  *    the commit-marker gate EQUALS the from-scratch release of the
  *    churned registry, row for row.
  *  - `_removed` exact: the published removed-doc record is exactly
  *    (previous manifest ids) minus (new manifest ids) — no misses,
  *    no duplicates (a row-count-sensitive compare, the r15
  *    idempotence lesson).
  *
  * The churned stratum is chosen as the LARGEST by tokens: with the
  * release's min-ratio budget rule, shrinking a non-binding stratum
  * leaves every other stratum's budget — and so its packing and its
  * shards — bit-identical, which is what makes the locality assertion
  * exact rather than probabilistic. (Churning the BINDING stratum
  * legitimately rescales every budget; that is a semantics property
  * of proportional mixes, not a publish-cost bug.)
  *
  * Usage: runMain graft.ReleaseScaleSmoke [sfDir] [replicas]
  */
object ReleaseScaleSmoke {

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  import SmokeFiles.{duBytes, fileListing, rmrf}

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(20)
    val contextTokens = 256
    val nShards = 4
    val spark = Sessions.get()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull && col("lang").isNotNull)
    val baseReg = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("int").as("n_tokens"))
    val stride = baseReg.agg(max("doc_id")).head().getLong(0) + 1L
    val langs = baseReg.select("lang").distinct().collect().map(_.getString(0)).sorted
    val weights = langs.map(_ -> 1.0 / langs.length).toMap
    // churn the largest-token stratum: non-binding under equal
    // weights, so every OTHER stratum's budget cut is unchanged
    val churnLang = baseReg.groupBy("lang").agg(sum("n_tokens").as("tok"))
      .orderBy(col("tok").desc).head().getString(0)
    println(s"[release-scale] base: ${baseReg.count()} docs, strata ${langs.mkString(",")}; " +
      s"churning '$churnLang' (largest) at x1 and x$replicas")

    val failures = scala.collection.mutable.ArrayBuffer.empty[String]

    def registryOf(n: Int): DataFrame = {
      val reg = (0 until n).map { r =>
        if (r == 0) baseReg
        else baseReg.select((col("doc_id") + lit(r.toLong * stride)).as("doc_id"),
          col("lang"), col("n_tokens"))
      }.reduce(_ unionByName _)
      val path = s"/tmp/graft_release_scale_reg_${n}x"
      rmrf(path)
      reg.write.parquet(path)
      spark.read.parquet(path)
    }

    def mOf(reg: DataFrame): DataFrame =
      Curation.releaseRegistryManifest(reg, "doc_id", "n_tokens", "lang",
        weights, contextTokens, nShards)

    for (n <- Seq(1, replicas)) {
      val reg = registryOf(n)
      // churn rule, one stratum only: retire every 9th churn-lang doc
      val churned = reg.where(col("lang") =!= churnLang || col("doc_id") % 9 =!= 0)
      val root = s"/tmp/graft_release_scale_${n}x"
      rmrf(root)
      val (_, pubSec) = time { Curation.publishRelease(mOf(reg), "lang", root) }
      val before = fileListing(root)
      val totalBytes = duBytes(root)

      val (report, roundSec) = time {
        Curation.maintainRelease(spark, root, churned, "doc_id", "n_tokens",
          "lang", weights, contextTokens, nShards, maxPsi = 0.5).collect()
      }
      if (!report.forall(_.getBoolean(2)))
        failures += s"x$n: the one-stratum churn tripped the drift gate: ${report.mkString}"

      val after = fileListing(root)
      // locality: every created/changed file is the churned stratum's,
      // the removed record, or the commit marker — and staging cleaned up
      val touched = after.keySet.filter(k => before.get(k) != after.get(k))
      val escaped = touched.filterNot(k =>
        k.startsWith(s"lang=$churnLang/") || k.startsWith("_removed/") ||
          k.startsWith("_commit/") || k == "_SUCCESS" || k.startsWith("._SUCCESS"))
      if (escaped.nonEmpty)
        failures += s"x$n: the one-stratum round touched files outside lang=$churnLang: ${escaped.take(5)}"
      if (after.keySet.exists(_.startsWith("_staged/")))
        failures += s"x$n: staged delta residue survived a clean round"
      // byte-identity of every untouched stratum, name+length+mtime
      val untouchedBefore = before.filter { case (k, _) =>
        !k.startsWith(s"lang=$churnLang/") && !k.startsWith("_removed/") &&
          !k.startsWith("_commit/") && k != "_SUCCESS" && !k.startsWith("._SUCCESS") }
      val untouchedAfter = after.filter { case (k, _) => untouchedBefore.contains(k) }
      if (untouchedBefore != untouchedAfter)
        failures += s"x$n: untouched strata files changed on disk"
      val shipped = touched.toSeq.map(k => after(k)._1).sum
      // the delta law at scale: maintained tree == from-scratch release
      val fresh = mOf(churned)
      val served = Curation.readRelease(spark, root)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
          col("offset_in_bin"), col("len_in_bin"), col("shard_id").cast("int").as("shard_id"))
      val freshSel = fresh.select(col("doc_id"), col("lang"), col("n_tokens"),
        col("bin_id"), col("offset_in_bin"), col("len_in_bin"), col("shard_id"))
      if (served.exceptAll(freshSel).count() != 0 || freshSel.exceptAll(served).count() != 0)
        failures += s"x$n: maintained tree diverged from the from-scratch release"
      // _removed exact — row-count-sensitive, not a set compare
      val expectTs = mOf(reg).select("doc_id").distinct()
        .join(fresh.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
        .collect().map(_.getLong(0)).sorted.toSeq
      val gotTs = Curation.readRemoved(spark, root, "doc_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      if (gotTs != expectTs)
        failures += s"x$n: removed-doc record ${gotTs.length} ids != expected ${expectTs.length}"
      println(f"[release-scale] x$n%-4d publish $pubSec%6.2f s ($totalBytes%10d B), " +
        f"round $roundSec%6.2f s shipped $shipped%9d B to ${touched.count(_.startsWith(s"lang=$churnLang/"))}%3d " +
        f"churned-stratum files (${100.0 * shipped / math.max(totalBytes, 1)}%5.1f%% of tree), " +
        f"${gotTs.length}%5d tombstones")
    }

    failures.foreach(f => System.err.println(s"[release-scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}
