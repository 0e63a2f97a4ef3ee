package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Cross-tier index consistency audit — the operational QA check a
  * multi-index deployment runs after every maintenance window: the
  * corpus registry (the release tier's id roster, the source of truth
  * for what SHOULD be served) reconciled against what each published
  * index family BELIEVES is live ([[Retrieval.liveDocIds]], the
  * IVF-PQ tier's masked vector ids, [[SideIndex.read]] ids). A doc
  * that slipped a maintenance round on one tier serves inconsistently
  * — found in lexical search but not by the admission gate — and
  * nothing in any single tier's own info surface can see it; only the
  * cross-tier reconciliation can.
  *
  * Scale shape: every relation in the plan is a one-column id set
  * (registry roster, doclen ids, side-table keys — never postings,
  * vectors, or text), so at 100 TB corpus scale the audit is a few
  * narrow shuffled joins over billions of 8-byte keys, embarrassingly
  * partitionable and orders of magnitude cheaper than any reindex it
  * would trigger. Output is one row per tier — poll it nightly, alert
  * on `in_sync = 0`.
  *
  * Reference counterpart: ironbeam validates single-run relations via
  * its Validate trait (validate.rs); a durable multi-index deployment
  * needs this cross-artifact form — an original addition, like the
  * index tiers themselves.
  */
object IndexAudit {

  /** One audit row per tier: `tier`, `n_live` (distinct ids the tier
    * serves), `n_missing` (registry ids the tier does NOT serve),
    * `n_orphaned` (served ids the registry no longer lists — retention
    * hazards), `n_dup_pairs` (joined rows beyond one per id — nonzero
    * when a tier serves two live rows for one key, the classic lost-
    * tombstone double-serve, or when the registry itself carries a
    * duplicate id), `in_sync` (1 iff all three discrepancy counts are
    * zero). The set counts are DISTINCT-id counts, so they stay exact
    * even while duplication is being reported rather than assumed away.
    *
    * Each tier relation is the tier's live-id column under any name —
    * it is realigned to `idCol` positionally. Tiers audit
    * independently: one full-outer join each, no cross-tier shuffle.
    */
  def audit(
      registry: DataFrame,
      idCol: String,
      tiers: Seq[(String, DataFrame)]): DataFrame = {
    require(tiers.nonEmpty, "IndexAudit.audit: no tiers to audit")
    require(registry.columns.contains(idCol), s"IndexAudit.audit: registry has no '$idCol'")
    val reg = registry.select(col(idCol)).where(col(idCol).isNotNull)
      .withColumn("__reg", lit(1))
    tiers.map { case (name, liveIds) =>
      require(liveIds.columns.length == 1,
        s"IndexAudit.audit: tier '$name' must be a one-column id relation, " +
          s"got ${liveIds.columns.mkString(", ")}")
      val idx = liveIds.toDF(idCol).where(col(idCol).isNotNull)
        .withColumn("__idx", lit(1))
      tierRow(reg.join(idx, Seq(idCol), "full_outer"), idCol, name, stale = None)
    }.reduce(_.unionByName(_))
  }

  /** [[audit]] extended with a CONTENT check — the stale-payload class
    * the id-set audit cannot see: a document deleted and re-added on
    * one tier whose payload (fingerprint, vector, side row) was never
    * refreshed carries the right id and the wrong bytes, and serves
    * `in_sync = 1` under the set audit forever. Here the registry
    * carries a content hash (`hashCol` — any comparable type: an
    * xxhash64 of the canonical payload, a version counter, the payload
    * itself when narrow) and each tier relation is TWO columns
    * (id, content_hash); `n_stale` counts ids present on BOTH sides
    * whose hashes are non-null and DISAGREE, and `in_sync` requires it
    * zero alongside the set counts.
    *
    * NULL-hash semantics (pinned by spec): a null hash on EITHER side
    * is "content unknown", never stale — a tier that cannot hash a row
    * (or a registry entry without a recorded version) must not fail
    * the audit on absence of evidence; the set counts still cover it.
    * Same scale shape as [[audit]]: narrow (id, hash) relations, one
    * full-outer join per tier, nothing touches payloads beyond the
    * hash column the caller already maintains.
    */
  def auditContent(
      registry: DataFrame,
      idCol: String,
      hashCol: String,
      tiers: Seq[(String, DataFrame)]): DataFrame = {
    require(tiers.nonEmpty, "IndexAudit.auditContent: no tiers to audit")
    require(registry.columns.contains(idCol),
      s"IndexAudit.auditContent: registry has no '$idCol'")
    require(registry.columns.contains(hashCol),
      s"IndexAudit.auditContent: registry has no '$hashCol'")
    val reg = registry.select(col(idCol), col(hashCol).as("__reg_h"))
      .where(col(idCol).isNotNull)
      .withColumn("__reg", lit(1))
    tiers.map { case (name, liveRows) =>
      require(liveRows.columns.length == 2,
        s"IndexAudit.auditContent: tier '$name' must be an (id, content_hash) relation, " +
          s"got ${liveRows.columns.mkString(", ")}")
      val idx = liveRows.toDF(idCol, "__idx_h").where(col(idCol).isNotNull)
        .withColumn("__idx", lit(1))
      val stale = col("__reg").isNotNull && col("__idx").isNotNull &&
        col("__reg_h").isNotNull && col("__idx_h").isNotNull &&
        col("__reg_h") =!= col("__idx_h")
      tierRow(reg.join(idx, Seq(idCol), "full_outer"), idCol, name, Some(stale))
    }.reduce(_.unionByName(_))
  }

  /** The shared per-tier aggregate over the full-outer id join: set
    * counts (+ the optional stale predicate), then the verdict column.
    */
  private def tierRow(
      joined: DataFrame, idCol: String, name: String, stale: Option[Column]): DataFrame = {
    def distinctIds(pred: Column): Column =
      coalesce(countDistinct(when(pred, col(idCol))), lit(0L))
    val aggs = Seq(
      distinctIds(col("__idx").isNotNull).as("n_live"),
      distinctIds(col("__idx").isNull).as("n_missing"),
      distinctIds(col("__reg").isNull).as("n_orphaned"),
      (count(lit(1)) - countDistinct(col(idCol))).as("n_dup_pairs")) ++
      stale.map(s => distinctIds(s).as("n_stale"))
    val discrepancies =
      col("n_missing") === 0L && col("n_orphaned") === 0L && col("n_dup_pairs") === 0L
    val verdict = stale.fold(discrepancies)(_ => discrepancies && col("n_stale") === 0L)
    val out = Seq(lit(name).as("tier"), col("n_live"), col("n_missing"),
      col("n_orphaned"), col("n_dup_pairs")) ++
      stale.map(_ => col("n_stale")) :+ verdict.cast("bigint").as("in_sync")
    joined.agg(aggs.head, aggs.tail: _*).select(out: _*)
  }
}
