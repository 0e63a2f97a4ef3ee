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
    def distinctIds(pred: Column): Column =
      coalesce(countDistinct(when(pred, col(idCol))), lit(0L))
    tiers.map { case (name, liveIds) =>
      require(liveIds.columns.length == 1,
        s"IndexAudit.audit: tier '$name' must be a one-column id relation, " +
          s"got ${liveIds.columns.mkString(", ")}")
      val idx = liveIds.toDF(idCol).where(col(idCol).isNotNull)
        .withColumn("__idx", lit(1))
      reg.join(idx, Seq(idCol), "full_outer")
        .agg(
          distinctIds(col("__idx").isNotNull).as("n_live"),
          distinctIds(col("__idx").isNull).as("n_missing"),
          distinctIds(col("__reg").isNull).as("n_orphaned"),
          (count(lit(1)) - countDistinct(col(idCol))).as("n_dup_pairs"))
        .select(
          lit(name).as("tier"),
          col("n_live"),
          col("n_missing"),
          col("n_orphaned"),
          col("n_dup_pairs"),
          (col("n_missing") === 0L && col("n_orphaned") === 0L &&
            col("n_dup_pairs") === 0L).cast("bigint").as("in_sync"))
    }.reduce(_.unionByName(_))
  }
}
