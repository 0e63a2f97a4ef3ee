package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Value semantics of the cross-tier audit on hand-built id sets,
  * plus the end-to-end shape over real published indexes (the oracles
  * `index_audit` / `index_audit_ann` grade that path at corpus scale).
  */
class IndexAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet

  test("audit counts missing and orphaned ids per tier independently") {
    val registry = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val full = Seq(1L, 2L, 3L, 4L).toDF("id")          // in sync, any column name
    val missing = Seq(1L, 2L).toDF("doc_id")           // 3,4 missing
    val orphaned = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id") // 9 orphaned
    val audit = rows(IndexAudit.audit(registry, "doc_id", Seq(
      "full" -> full, "missing" -> missing, "orphaned" -> orphaned)))
    assert(audit == Set(
      ("full", 4L, 0L, 0L, 0L, 1L),
      ("missing", 2L, 2L, 0L, 0L, 0L),
      ("orphaned", 5L, 0L, 1L, 0L, 0L)), audit.toString)
  }

  test("double-serving and duplicate-registry ids trip in_sync, not inflate counts") {
    val registry = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    // the lost-tombstone failure: one id serves two live rows — the
    // distinct-set counts stay exact, n_dup_pairs reports the excess
    val doubled = Seq(1L, 1L, 2L, 3L, 4L).toDF("doc_id")
    val a1 = rows(IndexAudit.audit(registry, "doc_id", Seq("t" -> doubled)))
    assert(a1 == Set(("t", 4L, 0L, 0L, 1L, 0L)), a1.toString)
    // a registry that violates its uniqueness contract trips the same flag
    val dupReg = Seq(1L, 1L, 2L).toDF("doc_id")
    val a2 = rows(IndexAudit.audit(dupReg, "doc_id",
      Seq("t" -> Seq(1L, 2L).toDF("doc_id"))))
    assert(a2 == Set(("t", 2L, 0L, 0L, 1L, 0L)), a2.toString)
  }

  test("audit ignores null ids and refuses a multi-column tier") {
    val registry = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val tier = Seq(Some(1L), None).toDF("k")
    val r = IndexAudit.audit(registry, "doc_id", Seq("t" -> tier)).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) == ((1L, 1L, 0L, 0L)),
      r.toString)
    val e = intercept[IllegalArgumentException] {
      IndexAudit.audit(registry, "doc_id",
        Seq("bad" -> Seq((1L, 2L)).toDF("a", "b")))
    }
    assert(e.getMessage.contains("one-column"), e.getMessage)
  }

  test("auditContent counts stale payloads; a null hash on either side is unknown, never stale") {
    val registry = Seq((1L, "h1"), (2L, "h2"), (3L, "h3"), (4L, null: String),
      (5L, "h5")).toDF("doc_id", "content_hash")
    // tier: 1 agrees, 2 STALE (right id, wrong bytes — the class the
    // id-set audit passes), 3 hash-unknown on the tier side, 4
    // hash-unknown on the registry side, 5 missing
    val tier = Seq((1L, "h1"), (2L, "OLD"), (3L, null: String), (4L, "hx"))
      .toDF("doc_id", "content_hash")
    val r = IndexAudit.auditContent(registry, "doc_id", "content_hash", Seq("t" -> tier))
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6)) == ((4L, 1L, 0L, 0L, 1L, 0L)), r.toString)
    // a hash-clean, set-clean tier is in_sync — and the stale count
    // alone trips the verdict when everything else agrees
    val clean = Seq((1L, "h1"), (2L, "h2"), (3L, "h3"), (4L, "anything"), (5L, "h5"))
      .toDF("doc_id", "content_hash")
    val rc = IndexAudit.auditContent(registry, "doc_id", "content_hash", Seq("t" -> clean))
      .head()
    assert((rc.getLong(5), rc.getLong(6)) == ((0L, 1L)),
      s"null registry hash must not count stale: $rc")
    val oneStale = Seq((1L, "h1"), (2L, "h2"), (3L, "WRONG"), (4L, "x"), (5L, "h5"))
      .toDF("doc_id", "content_hash")
    val rs = IndexAudit.auditContent(registry, "doc_id", "content_hash", Seq("t" -> oneStale))
      .head()
    assert((rs.getLong(2), rs.getLong(5), rs.getLong(6)) == ((0L, 1L, 0L)),
      s"one stale payload must trip in_sync on its own: $rs")
    // shape guard: a tier without its hash column refuses
    val e = intercept[IllegalArgumentException] {
      IndexAudit.auditContent(registry, "doc_id", "content_hash",
        Seq("bad" -> Seq(1L).toDF("doc_id")))
    }
    assert(e.getMessage.contains("(id, content_hash)"), e.getMessage)
  }

  test("a re-added doc with an unrefreshed payload passes the id audit and fails the content audit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-audit-stale").toString
    val idx = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("doc_id", "n_chars")
    SideIndex.build(idx, "doc_id", "chars", s"$tmp/g0")
    // doc 2's content changed upstream (20 -> 25), but the re-add
    // republished the OLD payload — the operational bug this audit exists for
    SideIndex.delete(spark, s"$tmp/g0", Seq(2L).toDF("doc_id"), "doc_id", s"$tmp/g1")
    SideIndex.update(spark, s"$tmp/g1", Seq((2L, 20)).toDF("doc_id", "n_chars"),
      "doc_id", s"$tmp/g2")
    val live = SideIndex.read(spark, s"$tmp/g2", "doc_id", "chars")
    val registry = Seq((1L, 10), (2L, 25), (3L, 30)).toDF("doc_id", "n_chars")
    val setAudit = IndexAudit.audit(registry.select(col("doc_id")), "doc_id",
      Seq("side" -> live.select(col("doc_id")))).head()
    assert(setAudit.getLong(5) == 1L, s"the id-set audit cannot see staleness: $setAudit")
    val contentAudit = IndexAudit.auditContent(registry, "doc_id", "n_chars",
      Seq("side" -> live.select(col("doc_id"), col("n_chars")))).head()
    assert((contentAudit.getLong(5), contentAudit.getLong(6)) == ((1L, 0L)),
      s"the content audit must flag the unrefreshed payload: $contentAudit")
  }

  test("a doc dropped from one real tier surfaces as that tier's missing row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val idx = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("doc_id", "n_chars")
    SideIndex.build(idx, "doc_id", "chars", s"$tmp/a")
    SideIndex.build(idx, "doc_id", "chars", s"$tmp/b0")
    SideIndex.delete(spark, s"$tmp/b0", Seq(2L).toDF("doc_id"), "doc_id", s"$tmp/b")
    val registry = Seq(1L, 2L, 3L).toDF("doc_id")
    val audit = IndexAudit.audit(registry, "doc_id", Seq(
        "a" -> SideIndex.read(spark, s"$tmp/a", "doc_id", "chars").select(col("doc_id")),
        "b" -> SideIndex.read(spark, s"$tmp/b", "doc_id", "chars").select(col("doc_id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(5))).toMap
    assert(audit("a") == ((0L, 1L)) && audit("b") == ((1L, 0L)), audit.toString)
  }
}
