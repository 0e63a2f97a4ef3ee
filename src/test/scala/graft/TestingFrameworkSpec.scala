package graft

import graft.testing.{Assertions, Builders, Debug, Fixtures}
import KeyedPCollection._

/** The ported testing framework, exercised on the reference's own
  * canonical example — word count (reference: src/lib.rs:31-50 quick
  * start) — plus builders/fixtures determinism.
  */
class TestingFrameworkSpec extends SparkTestBase {
  import spark.implicits._

  test("word count end-to-end with PAssert") {
    val counts = PCollection.fromSeq(spark, Fixtures.wordCountData())
      .flatMap(_.split(" "))
      .map(w => (w, 1L))
      .sumPerKey

    Assertions.that(counts)
      .hasCount(9)
      .allMatch(_._2 >= 1)
    Assertions.assertContains(counts, ("the", 3L))
    Assertions.assertKvCollectionsEqual(
      counts.filterValues(_ >= 2),
      Seq(("the", 3L), ("dog", 2L))
    )
  }

  test("assertion helpers: ordered, unordered, grouped, all/any/none") {
    val pc = PCollection.fromSeq(spark, Seq(1, 2, 3)).reshuffle(1)
    Assertions.assertCollectionsUnorderedEqual(pc, Seq(3, 1, 2))
    Assertions.assertAll(pc)(_ > 0)
    Assertions.assertAny(pc)(_ == 2)
    Assertions.assertNone(pc)(_ > 10)
    intercept[IllegalArgumentException] {
      Assertions.assertCollectionsUnorderedEqual(pc, Seq(1, 2))
    }

    val grouped = PCollection.fromSeq(spark, Seq("a" -> 1, "a" -> 2, "b" -> 3)).groupByKey
    Assertions.assertGroupedKvEqual(grouped, Map("a" -> Seq(2, 1), "b" -> Seq(3)))
  }

  test("builders are deterministic") {
    assert(Builders.sequentialData(5, 10) == Seq(10L, 11L, 12L, 13L, 14L))
    val skewed = Builders.skewedKvs(100, 10, 0.5)
    assert(skewed.count(_._1 == 0) == 50)
    assert(Builders.pseudoRandomData(10, 42) == Builders.pseudoRandomData(10, 42))
    assert(Builders.pseudoRandomData(10, 42) != Builders.pseudoRandomData(10, 43))
    val pc = Builders.testData[Int].add(1).addAll(Seq(2, 3)).build(spark)
    assert(pc.collectSorted() == Seq(1, 2, 3))
  }

  test("fixtures load into pipelines; debug taps pass through") {
    val logs = PCollection.fromSeq(spark, Fixtures.sampleLogEntries())
    val errors = Debug.count(logs.filter(_.level == "ERROR"), " errors")
    assert(errors.collect().size == 2)
    val inspected = Debug.sample(logs, 2).collect()
    assert(inspected.size == Fixtures.sampleLogEntries().size)
    assert(Fixtures.userProductInteractions().count(_._3 == "buy") == 2)
    assert(Fixtures.timeSeriesData(3).map(_._1) == Seq(0L, 1000L, 2000L))
  }
}
