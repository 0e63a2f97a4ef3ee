package graft.testing

import org.apache.spark.sql.Encoder
import graft.PCollection

/** Port of the reference's first-class testing framework
  * (reference: src/testing/ — assertions.rs, builders.rs, fixtures.rs,
  * debug.rs). PAssert-style fluent checks + deterministic data
  * builders, so user pipelines built on graft can be tested the same
  * way reference pipelines are.
  */
object Assertions {

  /** reference: assert_collections_equal, assertions.rs:231 (ordered). */
  def assertCollectionsEqual[T](actual: PCollection[T], expected: Seq[T]): Unit = {
    val got = actual.collect()
    require(got == expected, s"collections differ:\n  got      $got\n  expected $expected")
  }

  /** reference: assert_collections_unordered_equal, assertions.rs:266. */
  def assertCollectionsUnorderedEqual[T](actual: PCollection[T], expected: Seq[T]): Unit = {
    val got = actual.collect().groupBy(identity).view.mapValues(_.size).toMap
    val want = expected.groupBy(identity).view.mapValues(_.size).toMap
    require(got == want, s"collections differ (unordered):\n  got      $got\n  expected $want")
  }

  /** reference: assert_kv_collections_equal, assertions.rs:306. */
  def assertKvCollectionsEqual[K, V](actual: PCollection[(K, V)], expected: Seq[(K, V)]): Unit =
    assertCollectionsUnorderedEqual(actual, expected)

  /** reference: assert_grouped_kv_equal, assertions.rs:349 — value
    * order within a group is not significant.
    */
  def assertGroupedKvEqual[K, V](actual: PCollection[(K, Seq[V])], expected: Map[K, Seq[V]]): Unit = {
    val rows = actual.collect()
    // duplicate keys are themselves a grouping bug: .toMap would keep
    // only the last row and could false-pass the comparison
    val dupKeys = rows.groupBy(_._1).collect { case (k, g) if g.size > 1 => k }
    require(dupKeys.isEmpty, s"grouped collection emits duplicate keys: $dupKeys")
    val got = rows.map { case (k, vs) => (k, vs.groupBy(identity).view.mapValues(_.size).toMap) }.toMap
    val want = expected.map { case (k, vs) => (k, vs.groupBy(identity).view.mapValues(_.size).toMap) }
    require(got == want, s"grouped collections differ:\n  got      $got\n  expected $want")
  }

  def assertAll[T](pc: PCollection[T])(pred: T => Boolean): Unit = {
    val bad = pc.filter(t => !pred(t)).take(5).collect()
    require(bad.isEmpty, s"assert_all failed for: $bad")
  }

  def assertAny[T](pc: PCollection[T])(pred: T => Boolean): Unit =
    require(pc.filter(pred).take(1).collect().nonEmpty, "assert_any: no element matched")

  def assertNone[T](pc: PCollection[T])(pred: T => Boolean): Unit = {
    val bad = pc.filter(pred).take(5).collect()
    require(bad.isEmpty, s"assert_none failed; matching elements: $bad")
  }

  def assertContains[T](pc: PCollection[T], expected: T): Unit =
    assertAny(pc)(_ == expected)

  def assertMapsEqual[K, V](actual: Map[K, V], expected: Map[K, V]): Unit =
    require(actual == expected, s"maps differ:\n  got      $actual\n  expected $expected")

  /** Fluent PAssert (reference: assertions.rs:71-229). */
  final class PAssert[T](pc: PCollection[T]) {
    def isEmpty(): PAssert[T] = { require(pc.take(1).collect().isEmpty, "expected empty"); this }
    def hasCount(n: Long): PAssert[T] = {
      val c = pc.count(); require(c == n, s"expected $n elements, got $c"); this
    }
    def allMatch(pred: T => Boolean): PAssert[T] = { assertAll(pc)(pred); this }
    def containsInAnyOrder(expected: Seq[T]): PAssert[T] = {
      assertCollectionsUnorderedEqual(pc, expected); this
    }
  }

  def that[T](pc: PCollection[T]): PAssert[T] = new PAssert(pc)
}

/** Deterministic test-data builders (reference: src/testing/builders.rs). */
object Builders {

  /** reference: TestDataBuilder, builders.rs:37 */
  final class TestDataBuilder[T](private val items: Vector[T]) {
    def add(t: T): TestDataBuilder[T] = new TestDataBuilder(items :+ t)
    def addAll(ts: Seq[T]): TestDataBuilder[T] = new TestDataBuilder(items ++ ts)
    def build(spark: org.apache.spark.sql.SparkSession)(implicit e: Encoder[T]): PCollection[T] =
      PCollection.fromSeq(spark, items)
    def toSeq: Seq[T] = items
  }
  def testData[T]: TestDataBuilder[T] = new TestDataBuilder(Vector.empty)

  /** reference: sequential_data, builders.rs:217 */
  def sequentialData(n: Int, start: Long = 0L): Seq[Long] = (0 until n).map(start + _)

  /** reference: skewed_kvs, builders.rs:259 — `hotFraction` of rows on
    * one hot key, the rest uniform over `keys` (the salting test case).
    */
  def skewedKvs(n: Int, keys: Int, hotFraction: Double): Seq[(Int, Long)] = {
    val hotCount = (n * hotFraction).toInt
    val hot = (0 until hotCount).map(i => (0, i.toLong))
    // keys == 1 degenerates to everything on the single key 0 — cold
    // rows must stay inside [0, keys)
    val cold = (hotCount until n).map { i =>
      val k = if (keys <= 1) 0 else 1 + (i % (keys - 1))
      (k, i.toLong)
    }
    hot ++ cold
  }

  /** reference: pseudo_random_data, builders.rs:297 — SplitMix64-style
    * deterministic stream (same construction as the sketch hashing).
    */
  def pseudoRandomData(n: Int, seed: Long): Seq[Long] =
    (0 until n).map(i => graft.combiners.Hashing.hashLong(i.toLong, seed))
}

/** Canonical fixtures (reference: src/testing/fixtures.rs). */
object Fixtures {

  /** reference: SampleLogEntry, fixtures.rs:9 */
  case class SampleLogEntry(ts: Long, level: String, message: String, userId: Long)

  /** reference: sample_log_entries, fixtures.rs:23 */
  def sampleLogEntries(): Seq[SampleLogEntry] = Seq(
    SampleLogEntry(1000L, "INFO", "service started", 0L),
    SampleLogEntry(2000L, "DEBUG", "cache warm", 1L),
    SampleLogEntry(3000L, "WARN", "slow request", 2L),
    SampleLogEntry(4000L, "ERROR", "request failed", 2L),
    SampleLogEntry(5000L, "INFO", "request ok", 1L),
    SampleLogEntry(6000L, "ERROR", "disk full", 3L)
  )

  /** reference: word_count_data, fixtures.rs:89 */
  def wordCountData(): Seq[String] = Seq(
    "the quick brown fox",
    "jumps over the lazy dog",
    "the dog barks"
  )

  /** reference: time_series_data */
  def timeSeriesData(n: Int, stepMs: Long = 1000L): Seq[(Long, Double)] =
    (0 until n).map(i => (i * stepMs, math.sin(i * 0.1) * 100))

  /** reference: user_product_interactions */
  def userProductInteractions(): Seq[(Long, Long, String)] = Seq(
    (1L, 10L, "view"), (1L, 10L, "buy"), (1L, 11L, "view"),
    (2L, 10L, "view"), (2L, 12L, "view"), (2L, 12L, "buy"),
    (3L, 11L, "view")
  )
}

/** Debug taps (reference: src/testing/debug.rs) — dev-only pass-throughs. */
object Debug {

  /** reference: debug_inspect */
  def inspect[T](pc: PCollection[T], label: String = "")(implicit e: Encoder[T]): PCollection[T] =
    new PCollection(pc.ds.map { t => System.err.println(s"[inspect]$label $t"); t })

  /** reference: debug_count — prints the count without consuming. The
    * counting job runs when the returned collection first evaluates
    * (the lazy-pipeline contract), not at tap-insertion time.
    */
  def count[T](pc: PCollection[T], label: String = ""): PCollection[T] =
    new PCollection({
      val ds = pc.ds
      System.err.println(s"[count]$label ${ds.count()}")
      ds
    })

  /** reference: debug_sample — prints up to n sample elements, lazily
    * like [[count]].
    */
  def sample[T](pc: PCollection[T], n: Int = 5, label: String = ""): PCollection[T] =
    new PCollection({
      val ds = pc.ds
      System.err.println(s"[sample]$label ${ds.head(n).mkString(", ")}")
      ds
    })
}
