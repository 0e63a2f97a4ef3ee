package graft

import KeyedPCollection._

/** Keyed surface (reference: src/helpers/keyed.rs, values.rs, basic.rs,
  * count.rs, collect_values.rs, joins.rs, co_gbk.rs).
  */
class KeyedSpec extends SparkTestBase {
  import spark.implicits._

  private def kv(xs: (String, Int)*): PCollection[(String, Int)] =
    PCollection.fromSeq(spark, xs)

  private val sample = Seq("a" -> 1, "a" -> 2, "b" -> 3, "b" -> 4, "c" -> 5)

  test("keys / values / kvSwap / mapValues / filterValues") {
    val pc = kv(sample: _*)
    assert(pc.keys.collectSorted() == Seq("a", "a", "b", "b", "c"))
    assert(pc.values.collectSorted() == Seq(1, 2, 3, 4, 5))
    assert(pc.kvSwap.collectSorted() == sample.map(_.swap).sorted)
    assert(pc.mapValues(_ * 10).collectSorted() == sample.map { case (k, v) => (k, v * 10) }.sorted)
    assert(pc.filterValues(_ % 2 == 0).collectSorted() == Seq("a" -> 2, "b" -> 4))
  }

  test("keyBy / withConstantKey") {
    val pc = PCollection.fromSeq(spark, Seq(10, 21, 32))
    assert(pc.keyBy(_ % 10).collectSorted() == Seq(0 -> 10, 1 -> 21, 2 -> 32))
    assert(pc.withConstantKey("k").collect().forall(_._1 == "k"))
  }

  test("groupByKey collects per-key value lists") {
    val grouped = kv(sample: _*).groupByKey.collect().map { case (k, vs) => (k, vs.sorted) }.sortBy(_._1)
    assert(grouped == Seq("a" -> Seq(1, 2), "b" -> Seq(3, 4), "c" -> Seq(5)))
  }

  test("groupIntoBatches bounds per-key batch size") {
    val batches = kv(("a" -> 1) +: sample: _*).groupIntoBatches(2).collect()
    assert(batches.forall(_._2.size <= 2))
    assert(batches.flatMap(_._2).sorted == Seq(1, 1, 2, 3, 4, 5))
  }

  test("combineValues runs a user CombineFn as partial aggregation") {
    val sumFn = new CombineFn[Int, Long, Long] {
      def create(): Long = 0L
      def addInput(acc: Long, v: Int): Long = acc + v
      def mergeAccumulators(a: Long, b: Long): Long = a + b
      def extractOutput(acc: Long): Long = acc
    }
    val out = kv(sample: _*).combineValues(sumFn).collectSorted()
    assert(out == Seq("a" -> 3L, "b" -> 7L, "c" -> 5L))
  }

  test("sum/min/max/average/count per key match scala reference") {
    val pc = kv(sample: _*)
    assert(pc.sumPerKey.collectSorted() == Seq("a" -> 3, "b" -> 7, "c" -> 5))
    assert(pc.minPerKey.collectSorted() == Seq("a" -> 1, "b" -> 3, "c" -> 5))
    assert(pc.maxPerKey.collectSorted() == Seq("a" -> 2, "b" -> 4, "c" -> 5))
    assert(pc.countPerKey.collectSorted() == Seq("a" -> 2L, "b" -> 2L, "c" -> 1L))
    val avg = pc.averagePerKey.collect().toMap
    assert(avg("a") == 1.5 && avg("b") == 3.5 && avg("c") == 5.0)
  }

  test("toSetPerKey dedups, toDict materializes") {
    val pc = kv("a" -> 1, "a" -> 1, "b" -> 2)
    assert(pc.toSetPerKey.collect().map { case (k, vs) => (k, vs.sorted) }.sortBy(_._1) ==
      Seq("a" -> Seq(1), "b" -> Seq(2)))
    assert(kv("a" -> 1, "b" -> 2).toDict == Map("a" -> 1, "b" -> 2))
    // the driver-side boundedness contract is enforceable: a relation
    // past the entry bound refuses instead of swelling the driver
    val e = intercept[IllegalArgumentException] {
      kv("a" -> 1, "b" -> 2, "c" -> 3).toDict(maxRows = 2L)
    }
    assert(e.getMessage.contains("bounded"), e.getMessage)
    assert(kv("a" -> 1, "b" -> 2).toDict(maxRows = 2L) == Map("a" -> 1, "b" -> 2))
  }

  test("distinctPerKey / distinctCountPerKey") {
    val pc = kv("a" -> 1, "a" -> 1, "a" -> 2, "b" -> 9)
    assert(pc.distinctPerKey.collectSorted() == Seq("a" -> 1, "a" -> 2, "b" -> 9))
    assert(pc.distinctCountPerKey.collectSorted() == Seq("a" -> 2L, "b" -> 1L))
  }

  test("joins produce per-key cross products with Option misses") {
    val l = kv("a" -> 1, "a" -> 2, "b" -> 3)
    val r = PCollection.fromSeq(spark, Seq("a" -> "x", "c" -> "y"))

    assert(l.joinInner(r).collectSorted() == Seq("a" -> (1, "x"), "a" -> (2, "x")))

    val left = l.joinLeft(r).collect().sortBy(t => (t._1, t._2._1))
    assert(left == Seq("a" -> (1, Some("x")), "a" -> (2, Some("x")), "b" -> (3, None)))

    val right = l.joinRight(r).collect().sortBy(t => (t._1, t._2._1.getOrElse(-1)))
    assert(right == Seq("a" -> (Some(1), "x"), "a" -> (Some(2), "x"), "c" -> (None, "y")))

    val full = l.joinFull(r).collect().sortBy(t => (t._1, t._2._1.getOrElse(-1)))
    assert(full.size == 4)
    assert(full.contains("b" -> (Some(3), None)) && full.contains("c" -> (None, Some("y"))))
  }

  test("self-joins and same-lineage joins resolve (aliased join condition)") {
    // raw ds("_1") === other.ds("_1") conditions trip Spark's
    // ambiguous-self-join detection when both sides share lineage
    val kv = PCollection.fromSeq(spark, Seq((1, "a"), (2, "b"), (3, "c")))
    val selfJoined = kv.joinInner(kv).collect().toSet
    assert(selfJoined == Set((1, ("a", "a")), (2, ("b", "b")), (3, ("c", "c"))))
    val derived = kv.filterValues(_ != "b")
    assert(kv.joinLeft(derived).collect().toSet == Set(
      (1, ("a", Some("a"))), (2, ("b", None)), (3, ("c", Some("c")))))
  }

  test("duplicate keys emit the full V x W cross product (reference join semantics)") {
    val l = kv("k" -> 1, "k" -> 2)
    val r = PCollection.fromSeq(spark, Seq("k" -> "x", "k" -> "y"))
    assert(l.joinInner(r).collect().size == 4)
  }

  test("coGroupByKey is a full-outer N-list grouping") {
    val l = kv("a" -> 1, "a" -> 2, "b" -> 3)
    val r = PCollection.fromSeq(spark, Seq("a" -> "x", "c" -> "y"))
    val cg = l.coGroupByKey(r).collect()
      .map { case (k, (ls, rs)) => (k, (ls.sorted, rs.sorted)) }.sortBy(_._1)
    assert(cg == Seq(
      "a" -> (Seq(1, 2), Seq("x")),
      "b" -> (Seq(3), Seq()),
      "c" -> (Seq(), Seq("y"))
    ))
  }

  test("coGroupByKey4 is a full-outer 4-list grouping in one shuffle") {
    val a = kv("k1" -> 1, "k2" -> 2)
    val b = PCollection.fromSeq(spark, Seq("k1" -> "w"))
    val c = PCollection.fromSeq(spark, Seq("k2" -> 2.5, "k3" -> 3.5))
    val d = PCollection.fromSeq(spark, Seq("k1" -> true, "k1" -> false))
    val cg = a.coGroupByKey4(b, c, d).collect()
      .map { case (k, (vs, ws, xs, ys)) => (k, (vs.sorted, ws.sorted, xs.sorted, ys.sorted)) }
      .sortBy(_._1)
    assert(cg == Seq(
      "k1" -> (Seq(1), Seq("w"), Seq(), Seq(false, true)),
      "k2" -> (Seq(2), Seq(), Seq(2.5), Seq()),
      "k3" -> (Seq(), Seq(), Seq(3.5), Seq())
    ))
  }

  // numbered slices for the high-arity cogroups: input n holds
  // ("k<i>", "v<n>") for every i in 1..n, so key k1 collects one value
  // from every input and key k<n> only from inputs >= n
  private def slice(n: Int): PCollection[(String, String)] =
    PCollection.fromSeq(spark, (1 to n).map(i => s"k$i" -> s"v$n"))

  test("coGroupByKey5 through coGroupByKey10 are full-outer groupings in one shuffle") {
    val in = (1 to 10).map(slice)

    val cg5 = in(0).coGroupByKey5(in(1), in(2), in(3), in(4)).collect()
      .map { case (k, (a, b, c, d, e)) => k -> Seq(a, b, c, d, e).map(_.sorted) }.toMap
    assert(cg5("k1") == (1 to 5).map(n => Seq(s"v$n")))
    assert(cg5("k5") == Seq(Seq(), Seq(), Seq(), Seq(), Seq("v5")))
    assert(cg5.size == 5)

    val cg6 = in(0).coGroupByKey6(in(1), in(2), in(3), in(4), in(5)).collect()
      .map { case (k, (a, b, c, d, e, f)) => k -> Seq(a, b, c, d, e, f).map(_.sorted) }.toMap
    assert(cg6("k1") == (1 to 6).map(n => Seq(s"v$n")))
    assert(cg6("k6") == Seq(Seq(), Seq(), Seq(), Seq(), Seq(), Seq("v6")))

    val cg7 = in(0).coGroupByKey7(in(1), in(2), in(3), in(4), in(5), in(6)).collect()
      .map { case (k, t) => k -> t.productIterator.map(_.asInstanceOf[Seq[String]].sorted).toSeq }.toMap
    assert(cg7("k1") == (1 to 7).map(n => Seq(s"v$n")))
    assert(cg7("k7").flatten == Seq("v7"))

    val cg8 = in(0).coGroupByKey8(in(1), in(2), in(3), in(4), in(5), in(6), in(7)).collect()
      .map { case (k, t) => k -> t.productIterator.map(_.asInstanceOf[Seq[String]].sorted).toSeq }.toMap
    assert(cg8("k1") == (1 to 8).map(n => Seq(s"v$n")))
    assert(cg8("k8").flatten == Seq("v8"))

    val cg9 = in(0).coGroupByKey9(in(1), in(2), in(3), in(4), in(5), in(6), in(7), in(8)).collect()
      .map { case (k, t) => k -> t.productIterator.map(_.asInstanceOf[Seq[String]].sorted).toSeq }.toMap
    assert(cg9("k1") == (1 to 9).map(n => Seq(s"v$n")))
    assert(cg9("k9").flatten == Seq("v9"))

    val cg10 = in(0).coGroupByKey10(in(1), in(2), in(3), in(4), in(5), in(6), in(7), in(8), in(9)).collect()
      .map { case (k, t) => k -> t.productIterator.map(_.asInstanceOf[Seq[String]].sorted).toSeq }.toMap
    assert(cg10("k1") == (1 to 10).map(n => Seq(s"v$n")))
    assert(cg10("k10").flatten == Seq("v10"))
    assert(cg10.size == 10)
  }

  test("coGroupByKey10 duplicates survive per-slot (bag semantics)") {
    val dup = PCollection.fromSeq(spark, Seq("k" -> "d", "k" -> "d"))
    val empty = PCollection.fromSeq(spark, Seq.empty[(String, String)])
    val cg = dup.coGroupByKey10(empty, empty, empty, empty, empty, empty, empty, empty, dup)
      .collect().map { case (k, t) => k -> t.productIterator.map(_.asInstanceOf[Seq[String]]).toSeq }.toMap
    assert(cg("k").head == Seq("d", "d"))
    assert(cg("k").last == Seq("d", "d"))
    assert(cg("k").slice(1, 9).forall(_.isEmpty))
  }
}
