package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** Value semantics of the cross-tier audit on hand-built id sets,
  * plus the end-to-end shape over real published indexes (the oracle
  * `index_audit` grades that path at corpus scale).
  */
class IndexAuditSpec extends SparkTestBase {
  import spark.implicits._

  test("audit counts missing and orphaned ids per tier independently") {
    val registry = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val full = Seq(1L, 2L, 3L, 4L).toDF("id")          // in sync, any column name
    val missing = Seq(1L, 2L).toDF("doc_id")           // 3,4 missing
    val orphaned = Seq(1L, 2L, 3L, 4L, 9L).toDF("doc_id") // 9 orphaned
    val rows = IndexAudit.audit(registry, "doc_id", Seq(
        "full" -> full, "missing" -> missing, "orphaned" -> orphaned))
      .collect().map(r => (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(rows == Set(
      ("full", 4L, 0L, 0L, 1L),
      ("missing", 2L, 2L, 0L, 0L),
      ("orphaned", 5L, 0L, 1L, 0L)), rows.toString)
  }

  test("audit ignores null ids and refuses a multi-column tier") {
    val registry = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    val tier = Seq(Some(1L), None).toDF("k")
    val r = IndexAudit.audit(registry, "doc_id", Seq("t" -> tier)).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 0L)), r.toString)
    val e = intercept[IllegalArgumentException] {
      IndexAudit.audit(registry, "doc_id",
        Seq("bad" -> Seq((1L, 2L)).toDF("a", "b")))
    }
    assert(e.getMessage.contains("one-column"), e.getMessage)
  }

  test("a doc dropped from one real tier surfaces as that tier's missing row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val rows = Seq((1L, 10), (2L, 20), (3L, 30)).toDF("doc_id", "n_chars")
    SideIndex.build(rows, "doc_id", "chars", s"$tmp/a")
    SideIndex.build(rows, "doc_id", "chars", s"$tmp/b0")
    SideIndex.delete(spark, s"$tmp/b0", Seq(2L).toDF("doc_id"), "doc_id", s"$tmp/b")
    val registry = Seq(1L, 2L, 3L).toDF("doc_id")
    val audit = IndexAudit.audit(registry, "doc_id", Seq(
        "a" -> SideIndex.read(spark, s"$tmp/a", "doc_id", "chars").select(col("doc_id")),
        "b" -> SideIndex.read(spark, s"$tmp/b", "doc_id", "chars").select(col("doc_id"))))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    assert(audit("a") == ((0L, 1L)) && audit("b") == ((1L, 0L)), audit.toString)
  }
}
