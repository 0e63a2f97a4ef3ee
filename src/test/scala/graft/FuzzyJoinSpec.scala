package graft

import graft.operators.FuzzyJoin

/** Deletion-neighborhood fuzzy matching vs a brute-force replica. */
class FuzzyJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0 }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("blocked pairs equal the brute-force distance-1 pairs, duplicates collapsed") {
    val names = Seq("cat", "cats", "bat", "at", "dog", "cat", "a", "", "frog", "frogs")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "nm")
    val got = FuzzyJoin.nearNamePairs(df, "nm")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val distinct = names.distinct
    val want = (for {
      a <- distinct; b <- distinct if a < b
      d = lev(a, b) if d <= 1
    } yield (a, b, d)).toSet
    assert(got == want, s"got $got\nwant $want")
    // the trap cases the naive prefix blocking misses are all present:
    // position-0 substitution, leading deletion, empty-vs-one-char
    assert(want.contains(("bat", "cat", 1)) && want.contains(("at", "cat", 1))
      && want.contains(("", "a", 1)), s"fixture lost its trap cases: $want")
  }

  test("depth-2 blocking equals brute-force distance-2 pairs, transpositions included") {
    // 'form'/'from' is the classic transposition (distance 2 in plain
    // Levenshtein); 'cat'/'c' is a double deletion; 'cat'/'bad' a
    // double substitution; 'dog' stays isolated
    val names = Seq("form", "from", "cat", "c", "bad", "dog", "cart", "ct")
    val df = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }.toDF("id", "nm")
    val got = FuzzyJoin.nearNamePairs(df, "nm", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val distinct = names.distinct
    val want = (for {
      a <- distinct; b <- distinct if a < b
      d = lev(a, b) if d <= 2
    } yield (a, b, d)).toSet
    assert(got == want, s"got $got\nwant $want")
    assert(want.contains(("form", "from", 2)) && want.contains(("c", "cat", 2))
      && want.contains(("bad", "cat", 2)), s"fixture lost its trap cases: $want")
  }

  test("null names are ignored; no self or reversed pairs") {
    val df = Seq(Some("abc"), None, Some("abd"), Some("abc")).zipWithIndex
      .map { case (n, i) => (i.toLong, n.orNull) }.toDF("id", "nm")
    val got = FuzzyJoin.nearNamePairs(df, "nm")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("abc", "abd")), s"got $got")
  }

  test("resolveEntities canonicalizes transitive families and keeps unmatched rows") {
    // cat ~ cut ~ cute chain transitively (cat-cute is distance 2, only
    // reachable THROUGH cut) -> one family, canonical 'cat'; dog is
    // isolated and canonicalizes to itself; repeated values and null
    // rows behave like nearNamePairs (nulls dropped, values collapsed)
    val df = Seq((1L, "cat"), (2L, "cut"), (3L, "cute"), (4L, "dog"),
      (5L, "cat"), (6L, null)).toDF("id", "nm")
    val got = FuzzyJoin.resolveEntities(df, "id", "nm")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "cat", "cat"), (2L, "cut", "cat"), (3L, "cute", "cat"),
      (4L, "dog", "dog"), (5L, "cat", "cat")), s"got $got")
  }

  test("cross-dataset linkage equals brute force, distance-0 links included") {
    val a = Seq("cat", "dog", "fish", "bird").zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "nm")
    val b = Seq("cot", "dog", "fisk", "zzz").zipWithIndex
      .map { case (n, i) => (i.toLong, n) }.toDF("id", "nm")
    val got = FuzzyJoin.linkNamePairs(a, "nm", b, "nm")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val want = (for {
      x <- Seq("cat", "dog", "fish", "bird"); y <- Seq("cot", "dog", "fisk", "zzz")
      d = lev(x, y) if d <= 1
    } yield (x, y, d)).toSet
    assert(got == want, s"got $got\nwant $want")
    // the exact cross-catalog match links at distance 0
    assert(got.contains(("dog", "dog", 0)), s"got $got")
  }

  test("goldenRecords merges fields completeness-first, lowest id wins ties") {
    // family {cat,cut,cute}: row 1 has no brand (null), row 2 carries
    // 'B2', row 3 'B3' -> brand survives from row 2 (lowest non-null
    // id); size survives from row 1 (it has one). dog is a singleton.
    val df = Seq(
      (1L, "cat", null, Some(10)), (2L, "cut", "B2", None),
      (3L, "cute", "B3", Some(30)), (4L, "dog", "BD", Some(40)))
      .map { case (i, n, b, sz) => (i, n, b, sz.map(Integer.valueOf).orNull) }
      .toDF("id", "nm", "brand", "size")
    val got = FuzzyJoin.goldenRecords(df, "id", "nm", Seq("brand", "size"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2), r.get(3))).toMap
    assert(got == Map(
      "cat" -> ((3L, "B2", 10)),
      "dog" -> ((1L, "BD", 40))), s"got $got")
  }

  test("goldenRecords with priorities: the preferred source wins, id breaks tier ties") {
    // family {cat,cut,cute}: row 3 (tier 0) beats rows 1 and 2 (tier 1)
    // for brand even though its id is highest; row 1's null brand can't
    // win regardless of tier. Size: rows 1 and 3 carry one; tier 0 (row
    // 3) wins. Within a tier the lower id survives: rows 5/6 share tier
    // 0 in the {dog,dot} family, so row 5's brand wins.
    val df = Seq(
      (1L, "cat", null, Some(10), 1L), (2L, "cut", "B2", None, 1L),
      (3L, "cute", "B3", Some(30), 0L),
      (5L, "dog", "BD5", Some(50), 0L), (6L, "dot", "BD6", Some(60), 0L))
      .map { case (i, n, b, sz, p) => (i, n, b, sz.map(Integer.valueOf).orNull, p) }
      .toDF("id", "nm", "brand", "size", "tier")
    val got = FuzzyJoin.goldenRecords(df, "id", "nm", Seq("brand", "size"),
      priorityCol = Some("tier"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2), r.get(3))).toMap
    assert(got == Map(
      "cat" -> ((3L, "B3", 30)),
      "dog" -> ((2L, "BD5", 50))), s"got $got")
  }

  test("goldenRecords: a NULL priority never wins a field (arg_min null-key semantics)") {
    // row 1 carries a brand but no tier: Spark's struct ordering would
    // sort (null, 1) before (0, 2) and silently hand it the win — the
    // ordering key must null out instead, so the ranked row 2 survives
    val df = Seq(
      (1L, "cat", "B-unranked", Option.empty[Long]),
      (2L, "cut", "B-ranked", Some(0L)))
      .map { case (i, n, b, p) => (i, n, b, p.map(java.lang.Long.valueOf).orNull) }
      .toDF("id", "nm", "brand", "tier")
    val got = FuzzyJoin.goldenRecords(df, "id", "nm", Seq("brand"),
      priorityCol = Some("tier"))
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got == Map("cat" -> "B-ranked"), s"got $got")
  }
}
