package graft

import KeyedPCollection._
import graft.Filters._
import graft.Sketches._
import graft.SideInputs._
import graft.testing.Assertions

/** Kitchen-sink pipeline exercising the major surfaces together in one
  * flow (the analog of the reference's tests/mega_integration.rs:1-18
  * "EVERY Ironbeam feature" pipeline): source -> flatMap -> filters ->
  * keyBy -> combine -> join -> cogroup-3 -> side input -> global
  * sketch -> assertions.
  */
class MegaIntegrationSpec extends SparkTestBase {
  import spark.implicits._

  test("mega pipeline: all surfaces compose") {
    val lines = PCollection.fromSeq(spark, Seq(
      "alpha beta gamma", "beta gamma delta", "gamma delta epsilon", "alpha gamma"
    ))

    // tokenize -> filter -> count per word (map/flatMap/filter/combine)
    val counts = lines
      .flatMap(_.split(" "))
      .filterBy(identity[String])(_.length > 4)
      .map(w => (w, 1L))
      .sumPerKey

    Assertions.that(counts).containsInAnyOrder(Seq(
      ("alpha", 2L), ("gamma", 4L), ("delta", 2L), ("epsilon", 1L)
    ))

    // join against a dimension + side-input filter
    val dim = PCollection.fromSeq(spark, Seq(("alpha", "vowel"), ("gamma", "consonant"), ("delta", "consonant")))
    val joined = counts.joinInner(dim)
    assert(joined.collect().size == 3)

    val allowed = joined.filterWithSide(Seq("consonant"))((t, s) => s.contains(t._2._2))
    assert(allowed.keys.collectSorted() == Seq("delta", "gamma"))

    // 3-way cogroup over the same key space
    val extra = PCollection.fromSeq(spark, Seq(("alpha", 10.0), ("zeta", 1.0)))
    val cg = counts.coGroupByKey3(dim, extra).collect().map { case (k, (a, b, c)) =>
      (k, a.size, b.size, c.size)
    }.sortBy(_._1)
    assert(cg.map(_._1) == Seq("alpha", "delta", "epsilon", "gamma", "zeta"))
    assert(cg.find(_._1 == "zeta").get == ("zeta", 0, 0, 1))
    assert(cg.find(_._1 == "alpha").get == ("alpha", 1, 1, 1))

    // batched value transform preserves arity
    val batched = counts.mapValuesBatches(2)(vs => vs.map(_ * 10)).collect().toMap
    assert(batched("gamma") == 40L)

    // global sketch + fan-out
    val Seq(t1, t2, t3) = counts.values.teeN(3)
    assert(t1.sumGlobally.collect() == Seq(9L))
    assert(t2.maxGlobally.collect() == Seq(4L))
    assert(t3.countGlobally.collect() == Seq(4L))
  }
}
