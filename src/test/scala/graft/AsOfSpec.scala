package graft

import graft.operators.AsOf

/** As-of (point-in-time) join semantics, including the tie rules. */
class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  private val left = Seq(
    // (id, key, ts)
    (10L, "a", 100L),
    (11L, "a", 200L),
    (12L, "a", 50L),   // before any marker -> null
    (13L, "b", 100L),  // other key -> only b markers visible
    (14L, "a", 150L)   // tie with marker id 15 at ts 150? no: marker ts 150 has id 15 > 14 -> excluded
  ).toDF("id", "key", "ts")

  private val right = Seq(
    (1L, "a", 100L, "m1"),   // matches left id 10 (ts tie, 1 <= 10) and later
    (15L, "a", 150L, "m15"), // ts tie with left 14 but 15 > 14 -> NOT visible to 14
    (2L, "b", 90L, "mb")
  ).toDF("id", "key", "ts", "tag")

  test("asofJoin attaches the latest at-or-before right row per key") {
    val out = AsOf.asofJoin(left, right, "key", "ts", "id", Seq("tag"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(10L) == "m1", "equal ts with smaller right id matches")
    assert(out(11L) == "m15", "latest prior marker wins")
    assert(out(12L) == null, "no prior marker -> null")
    assert(out(13L) == "mb", "keys do not leak across")
    assert(out(14L) == "m1", "equal-ts marker with larger id is not yet visible")
  }

  test("asofJoin takes every value column from the SAME latest right row, nulls included") {
    // the latest marker has tag=NULL, aux set: latest-row-or-NULL
    // semantics require asof_tag to be NULL, not the tag of an OLDER
    // row (which per-column ignoreNulls carry would smuggle in)
    val markers = Seq(
      (1L, "a", 100L, Option("old"), Option.empty[String]),
      (2L, "a", 150L, Option.empty[String], Option("fresh"))
    ).toDF("id", "key", "ts", "tag", "aux")
    val probes = Seq((10L, "a", 200L)).toDF("id", "key", "ts")
    val row = AsOf.asofJoin(probes, markers, "key", "ts", "id", Seq("tag", "aux"))
      .collect().head
    assert(row.getString(3) == null, s"asof_tag mixed in from an older right row: $row")
    assert(row.getString(4) == "fresh")
  }

  test("asofJoin carries multiple value columns and keeps left row count") {
    val out = AsOf.asofJoin(left, right, "key", "ts", "id", Seq("tag", "id"))
    assert(out.count() == left.count())
    assert(out.columns.toSeq == Seq("id", "key", "ts", "asof_tag", "asof_id"))
    val row11 = out.where($"id" === 11L).collect().head
    assert(row11.getString(3) == "m15" && row11.getLong(4) == 15L)
  }
}
