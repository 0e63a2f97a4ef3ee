package graft

import graft.operators.Centrality

/** Fixed-iteration PageRank against a pure-Scala replica of the same
  * recursion on crafted graphs.
  */
class CentralitySpec extends SparkTestBase {
  import spark.implicits._

  /** The same recursion in plain Scala: undirected pairs, fixed
    * iterations, round-6 at the end.
    */
  private def refPageRank(
      pairs: Seq[(Long, Long)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = deg.size
    var r = deg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = in.map { case (id, s) => id -> ((1.0 - d) / n + d * s) }
    }
    r.map { case (id, v) =>
      id -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
  }

  test("pageRank matches the hand recursion on a path graph") {
    val pairs = Seq((1L, 2L), (2L, 3L))
    val got = Centrality.pageRank(pairs.toDF("a", "b"), "a", "b", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(pairs, 5)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"node $id: got ${got(id)}, want $w") }
    // structure: the middle of a path out-ranks the symmetric endpoints
    assert(got(2L) > got(1L) && got(1L) == got(3L), s"got $got")
  }

  test("pageRank conserves total mass and favors the hub of a star") {
    val pairs = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L), (1L, 2L))
    val got = Centrality.pageRank(pairs.toDF("a", "b"), "a", "b", iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(pairs, 8)
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"node $id: got ${got(id)}, want $w") }
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"mass not conserved: ${got.values.sum}")
    assert(got(10L) == got.values.max, s"hub must rank highest: $got")
  }

  /** The personalized recursion in plain Scala: teleport only to seeds. */
  private def refPpr(
      pairs: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
      d: Double = 0.85): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nS = seeds.size
    var r: Map[Long, Double] = seeds.map(_ -> 1.0 / nS).toMap
    for (_ <- 1 to iters) {
      val in = edges.filter { case (src, _) => r.contains(src) }
        .groupBy(_._2).map { case (dst, es) =>
          dst -> d * es.map { case (src, _) => r(src) / deg(src) }.sum
        }
      r = (in.keySet ++ seeds).map { v =>
        v -> (in.getOrElse(v, 0.0) + (if (seeds(v)) (1.0 - d) / nS else 0.0))
      }.toMap
    }
    r.map { case (id, v) =>
      id -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
  }

  test("personalized PageRank spreads rank outward from the seed only") {
    // path 1-2-3-4-5 with seed {1}: after 2 iterations only nodes
    // within 2 hops carry rank; node 5 stays absent
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val seeds = Seq(1L)
    val got = Centrality.pageRankPersonalized(
      pairs.toDF("a", "b"), "a", "b", seeds.toDF("id"), "id", iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPpr(pairs, seeds.toSet, 2)
    assert(got.keySet == want.keySet, s"got ${got.keySet}, want ${want.keySet}")
    assert(!got.contains(5L), "rank must not reach beyond the iteration horizon")
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"node $id: got ${got(id)}, want $w") }
    assert(got(1L) == got.values.max, s"the seed must hold the most rank: $got")
  }

  test("isolated seeds keep their teleport share; multi-seed mass splits") {
    val pairs = Seq((1L, 2L))
    val seeds = Seq(1L, 99L) // 99 is not a graph node
    val got = Centrality.pageRankPersonalized(
      pairs.toDF("a", "b"), "a", "b", seeds.toDF("id"), "id", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPpr(pairs, seeds.toSet, 3)
    assert(got.keySet == want.keySet, s"got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"node $id: got ${got(id)}, want $w") }
  }

  /** The weighted recursion in plain Scala. */
  private def refWeighted(
      pairs: Seq[(Long, Long, Double)], iters: Int, d: Double = 0.85): Map[Long, Double] = {
    val edges = pairs.flatMap { case (a, b, w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = edges.groupBy(_._1).map { case (k, es) => k -> es.map(_._3).sum }
    val n = wdeg.size
    var r = wdeg.keys.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _, w) => r(src) * w / wdeg(src) }.sum
      }
      r = in.map { case (id, s) => id -> ((1.0 - d) / n + d * s) }
    }
    r.map { case (id, v) =>
      id -> BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble }
  }

  test("weighted PageRank splits contributions by weight, not degree") {
    // node 1 connects strongly (0.9) to 2 and weakly (0.1) to 3: rank
    // must flow to 2, where the unweighted loop would split evenly
    val pairs = Seq((1L, 2L, 0.9), (1L, 3L, 0.1), (2L, 3L, 0.2))
    val got = Centrality.pageRankWeighted(
      pairs.toDF("a", "b", "w"), "a", "b", "w", iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refWeighted(pairs, 5)
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"node $id: got ${got(id)}, want $w") }
    assert(got(2L) > got(3L), s"the strong edge must out-rank the weak one: $got")
    assert(math.abs(got.values.sum - 1.0) < 1e-4, s"mass not conserved: ${got.values.sum}")
  }

  test("uniform weights reduce weighted PageRank to the unweighted recursion") {
    val flat = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val got = Centrality.pageRankWeighted(
      flat.map { case (a, b) => (a, b, 1.0) }.toDF("a", "b", "w"),
      "a", "b", "w", iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(flat, 4)
    want.foreach { case (id, w) =>
      assert(math.abs(got(id) - w) <= 1e-6, s"node $id: got ${got(id)}, want $w") }
  }

  test("isolated docs are not nodes; single-pair graph is uniform") {
    val got = Centrality.pageRank(Seq((7L, 8L)).toDF("a", "b"), "a", "b", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(7L, 8L))
    assert(got(7L) == 0.5 && got(8L) == 0.5, s"two symmetric nodes split evenly: $got")
  }

  test("an aborted personalized run releases every cached relation") {
    // the empty-seed require fires AFTER the edge and seed relations
    // persist — the finally must still release both, or a failed call
    // leaks executor storage for the rest of the session
    val before = spark.sparkContext.getPersistentRDDs.keySet
    intercept[IllegalArgumentException] {
      Centrality.pageRankPersonalized(
        Seq((1L, 2L)).toDF("a", "b"), "a", "b",
        Seq.empty[Long].toDF("id"), "id", iterations = 2)
    }
    // suites share one SparkContext and run in parallel: other tests'
    // transient persists can appear in the global registry during this
    // window. A relation THIS call leaked would never drain; foreign
    // transients do — poll instead of snapshotting a racy count.
    def leaked() = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.currentTimeMillis + 60000
    while (leaked().nonEmpty && System.currentTimeMillis < deadline) Thread.sleep(200)
    assert(leaked().isEmpty, s"leaked cached relation(s): ids ${leaked()}")
  }
}
