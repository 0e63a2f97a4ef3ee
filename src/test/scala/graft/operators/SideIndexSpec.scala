package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

/** The side-table index family's loud-refusal contracts — the value
  * path (build / delete / re-add / masked read) is oracle-graded by
  * `side_index_live` and exercised end-to-end by the StreamingSpec
  * differentials; this spec pins the guards that keep a bad write
  * from publishing a "valid" index that fails at serve time.
  */
class SideIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("update refuses a schema-drifted increment at WRITE time, not serve time") {
    val root = tmp("side-schema")
    SideIndex.build(Seq((1L, 10), (2L, 20)).toDF("doc_id", "n_chars"),
      "doc_id", "chars", s"$root/base")
    // wrong column name
    val e1 = intercept[IllegalArgumentException] {
      SideIndex.update(spark, s"$root/base",
        Seq((3L, 30)).toDF("doc_id", "chars"), "doc_id", s"$root/u1")
    }
    assert(e1.getMessage.contains("does not match"), e1.getMessage)
    // wrong column type
    val e2 = intercept[IllegalArgumentException] {
      SideIndex.update(spark, s"$root/base",
        Seq((3L, "30")).toDF("doc_id", "n_chars"), "doc_id", s"$root/u2")
    }
    assert(e2.getMessage.contains("does not match"), e2.getMessage)
    // matching schema still publishes
    SideIndex.update(spark, s"$root/base",
      Seq((3L, 30)).toDF("doc_id", "n_chars"), "doc_id", s"$root/u3")
    assert(SideIndex.read(spark, s"$root/u3", "doc_id", "chars").count() == 3)
  }

  test("update refuses duplicate ids WITHIN the increment") {
    val root = tmp("side-dup")
    SideIndex.build(Seq((1L, 10)).toDF("doc_id", "n_chars"),
      "doc_id", "chars", s"$root/base")
    val e = intercept[IllegalArgumentException] {
      SideIndex.update(spark, s"$root/base",
        Seq((2L, 20), (2L, 21)).toDF("doc_id", "n_chars"), "doc_id", s"$root/u1")
    }
    assert(e.getMessage.contains("duplicate ids"), e.getMessage)
  }

  test("build, update and delete refuse null and duplicate ids loudly, never silently") {
    val root = tmp("side-keyguard")
    // a duplicate-id base would double-serve one key and corrupt
    // info's live arithmetic after a delete — refused at the door
    val eDup = intercept[IllegalArgumentException] {
      SideIndex.build(Seq((7L, 10), (7L, 11), (8L, 20)).toDF("doc_id", "n_chars"),
        "doc_id", "chars", s"$root/dup")
    }
    assert(eDup.getMessage.contains("duplicate ids"), eDup.getMessage)
    // null-keyed rows would just vanish from the write
    val eNull = intercept[IllegalArgumentException] {
      SideIndex.build(Seq((Some(1L), 10), (None, 20)).toDF("doc_id", "n_chars"),
        "doc_id", "chars", s"$root/nul")
    }
    assert(eNull.getMessage.contains("null"), eNull.getMessage)
    SideIndex.build(Seq((1L, 10), (2L, 20)).toDF("doc_id", "n_chars"),
      "doc_id", "chars", s"$root/base")
    val eUpd = intercept[IllegalArgumentException] {
      SideIndex.update(spark, s"$root/base",
        Seq((Some(3L), 30), (None, 40)).toDF("doc_id", "n_chars"),
        "doc_id", s"$root/u1")
    }
    assert(eUpd.getMessage.contains("null"), eUpd.getMessage)
    val eDel = intercept[IllegalArgumentException] {
      SideIndex.delete(spark, s"$root/base",
        Seq(Some(1L), None).toDF("doc_id"), "doc_id", s"$root/d1")
    }
    assert(eDel.getMessage.contains("null"), eDel.getMessage)
  }

  test("read refuses the wrong flavor; compact re-homes live rows and clears tombstones") {
    val root = tmp("side-compact")
    SideIndex.build(Seq((1L, 10), (2L, 20), (3L, 30)).toDF("doc_id", "n_chars"),
      "doc_id", "chars", s"$root/base")
    val e = intercept[IllegalArgumentException] {
      SideIndex.read(spark, s"$root/base", "doc_id", "other")
    }
    assert(e.getMessage.contains("'chars'"), e.getMessage)
    SideIndex.delete(spark, s"$root/base",
      Seq(2L).toDF("doc_id"), "doc_id", s"$root/del")
    SideIndex.compact(spark, s"$root/del", s"$root/compacted")
    val live = SideIndex.read(spark, s"$root/compacted", "doc_id", "chars")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(live == Set((1L, 10), (3L, 30)), s"compacted live set wrong: $live")
    val inf = SideIndex.info(spark, s"$root/compacted", "chars").head()
    assert(inf.getInt(0) == 1 && inf.getInt(1) == 0 && inf.getLong(4) == 2L,
      s"compacted info wrong: $inf")
  }

  test("maintain runs delete + update + policy-gated compaction as one round") {
    val root = tmp("side-maintain")
    SideIndex.build(
      Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40)).toDF("doc_id", "n_chars"),
      "doc_id", "chars", s"$root/base")
    // a quiet-policy round: delete 2, re-add it re-keyed — two new
    // generations, no compaction (maxSegments left high)
    val served = SideIndex.maintain(spark, s"$root/base",
      deletes = Some(Seq(2L).toDF("doc_id")),
      increment = Some(Seq((2L, 21)).toDF("doc_id", "n_chars")),
      "doc_id", "chars", s"$root/r1")
    assert(served == s"$root/r1/updated", served)
    val inf1 = SideIndex.info(spark, served, "chars").head()
    assert(inf1.getInt(0) == 2 && inf1.getInt(1) == 1, s"round-1 info wrong: $inf1")
    val live1 = SideIndex.read(spark, served, "doc_id", "chars")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(live1 == Set((1L, 10), (2L, 21), (3L, 30), (4L, 40)), live1.toString)
    // a tripped-policy round: maxSegments = 1 forces the re-home;
    // served root is one segment, zero tombstone generations, same
    // live relation
    val served2 = SideIndex.maintain(spark, served,
      deletes = Some(Seq(3L).toDF("doc_id")), increment = None,
      "doc_id", "chars", s"$root/r2", maxSegments = 1)
    assert(served2 == s"$root/r2/compacted", served2)
    val inf2 = SideIndex.info(spark, served2, "chars").head()
    assert(inf2.getInt(0) == 1 && inf2.getInt(1) == 0 && inf2.getLong(4) == 3L,
      s"round-2 info wrong: $inf2")
    // a no-op round returns the input path unchanged
    assert(SideIndex.maintain(spark, served2, None, None,
      "doc_id", "chars", s"$root/r3") == served2)
    // a reused outRoot refuses loudly — the carried-root overwrite hazard
    val e = intercept[IllegalArgumentException] {
      SideIndex.maintain(spark, served2, Some(Seq(1L).toDF("doc_id")), None,
        "doc_id", "chars", s"$root/r2")
    }
    assert(e.getMessage.contains("not fresh"), e.getMessage)
  }

  test("ingestBatch chains increments behind the pointer; replay heals; empty batch is a no-op") {
    val root = tmp("side-ingest")
    val ptr = s"$root/CURRENT"
    SideIndex.build(Seq((1L, 10), (2L, 20)).toDF("doc_id", "n_chars"),
      "doc_id", "chars", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "side(chars)")
    SideIndex.ingestBatch(spark, Seq((3L, 30), (4L, 40)).toDF("doc_id", "n_chars"),
      0L, ptr, s"$root/gen", "doc_id", "chars")
    SideIndex.ingestBatch(spark, Seq((5L, 50)).toDF("doc_id", "n_chars"),
      1L, ptr, s"$root/gen", "doc_id", "chars")
    val served = ServePointer.read(spark, ptr)
    assert(served.contains("/gen/batch-1/"), served)
    def live = SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "chars")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    val want = Seq((1L, 10), (2L, 20), (3L, 30), (4L, 40), (5L, 50))
    assert(live == want, live.mkString(", "))
    // a replayed committed batch heals the pointer, never re-submits
    // (the live-resubmission guard would refuse loudly otherwise)
    SideIndex.ingestBatch(spark, Seq((5L, 50)).toDF("doc_id", "n_chars"),
      1L, ptr, s"$root/gen", "doc_id", "chars")
    assert(ServePointer.read(spark, ptr) == served && live == want)
    // an empty batch publishes nothing
    SideIndex.ingestBatch(spark, Seq.empty[(Long, Int)].toDF("doc_id", "n_chars"),
      2L, ptr, s"$root/gen", "doc_id", "chars")
    assert(ServePointer.read(spark, ptr) == served)
    assert(!new java.io.File(s"$root/gen/batch-2").exists)
  }
}
