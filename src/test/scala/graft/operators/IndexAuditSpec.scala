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
