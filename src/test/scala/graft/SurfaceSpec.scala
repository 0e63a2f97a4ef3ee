package graft

import graft.Filters._
import graft.Validation._
import graft.SideInputs._
import graft.Partitioned._
import graft.EventTime._
import graft.Sketches._

/** The remaining reference surface: enhanced filters, regex ops,
  * validation, side inputs, multi-output partition, typed event-time,
  * global combines and sketches on the facade.
  */
case class Rec(name: String, age: Int)

class SurfaceSpec extends SparkTestBase {
  import spark.implicits._

  private def pc[T: org.apache.spark.sql.Encoder](xs: T*): PCollection[T] =
    PCollection.fromSeq(spark, xs)

  test("enhanced filters (eq/ne/lt/le/gt/ge/range/by)") {
    val p = pc(1, 2, 3, 4, 5)
    assert(p.filterEq(identity[Int], 3).collectSorted() == Seq(3))
    assert(p.filterNe(identity[Int], 3).collectSorted() == Seq(1, 2, 4, 5))
    assert(p.filterLt(identity[Int], 3).collectSorted() == Seq(1, 2))
    assert(p.filterLe(identity[Int], 3).collectSorted() == Seq(1, 2, 3))
    assert(p.filterGt(identity[Int], 3).collectSorted() == Seq(4, 5))
    assert(p.filterGe(identity[Int], 3).collectSorted() == Seq(3, 4, 5))
    assert(p.filterRange(identity[Int], 2, 4).collectSorted() == Seq(2, 3)) // exclusive max
    assert(p.filterRangeInclusive(identity[Int], 2, 4).collectSorted() == Seq(2, 3, 4))
    assert(p.filterBy((x: Int) => x * 2)(_ > 6).collectSorted() == Seq(4, 5))
  }

  test("regex ops on string collections") {
    val p = pc("user=alice id=1", "garbage", "user=bob id=2")
    assert(p.regexMatches("user=\\w+").collect().size == 2)
    assert(p.regexExtract("user=(\\w+)", 1).collectSorted() == Seq("alice", "bob"))
    assert(p.regexExtractKv("user=(\\w+) id=(\\d+)").collectSorted() ==
      Seq("alice" -> "1", "bob" -> "2"))
    assert(p.regexFind("id=\\d+").collectSorted() == Seq("id=1", "id=2"))
    assert(pc("a-b-c").regexReplaceAll("-", "_").collect() == Seq("a_b_c"))
    assert(pc("a b  c").regexSplit("\\s+").collect().head == Seq("a", "b", "c"))
  }

  test("validation modes: skip, partition, validators") {
    val v = (r: Rec) =>
      Validators.notEmpty("name")(r.name) ++ Validators.inRange("age", 0, 120)(r.age)
    val data = pc(Rec("ok", 30), Rec("", 40), Rec("old", 200))

    assert(data.validateSkipInvalid(v).collect().map(_.name).toSeq == Seq("ok"))

    val (good, bad) = data.validatePartition(v)
    assert(good.collect().map(_.name).toSeq == Seq("ok"))
    val errs = bad.collect()
    assert(errs.size == 2)
    assert(errs.find(_._1.name == "").get._2.exists(_.contains("name")))

    assert(Validators.isEmail("e")("a@b.com").isEmpty)
    assert(Validators.isEmail("e")("nope").nonEmpty)
    assert(Validators.minLength("s", 3)("ab").nonEmpty)
    assert(Validators.maxLength("s", 3)("abcd").nonEmpty)
    assert(Validators.contains("s", "x")("axb").isEmpty)
  }

  test("side inputs broadcast maps and filter against them") {
    val lookup = Map(1 -> "one", 2 -> "two")
    val out = pc(1, 2, 3).mapWithSideMap(lookup)((x, m) => m.getOrElse(x, "?")).collectSorted()
    assert(out == Seq("?", "one", "two"))
    val kept = pc(1, 2, 3).filterWithSide(Seq(2, 3))((x, allow) => allow.contains(x)).collectSorted()
    assert(kept == Seq(2, 3))
  }

  test("partitionBy splits into disjoint covering streams") {
    val parts = pc(1 to 10: _*).partitionBy(3)(_ % 3)
    val sizes = parts.map(_.collect().size)
    assert(sizes.sum == 10)
    assert(parts(0).collect().forall(_ % 3 == 0))
    val (evens, odds) = pc(1 to 10: _*).partition2(_ % 2 == 0)
    assert(evens.collect().size == 5 && odds.collect().size == 5)
  }

  test("typed event-time: attach, window-key, group, latest") {
    val p = pc(("a", 1000L), ("b", 61000L), ("c", 62000L))
      .attachTimestamps(_._2)

    val windowed = p.keyByWindow(60000L).collect()
    assert(windowed.map(_._1).toSet ==
      Set(TimeWindow(0L, 60000L), TimeWindow(60000L, 120000L)))

    val grouped = p.groupByWindow(60000L).collect().map { case (w, vs) => (w.start, vs.size) }.toMap
    assert(grouped == Map(0L -> 1, 60000L -> 2))

    assert(p.latestGlobally.collect().head.value._1 == "c")

    val keyed = PCollection.fromSeq(spark, Seq(
      ("k1", Timestamped("early", 10L)), ("k1", Timestamped("late", 20L)), ("k2", Timestamped("only", 5L))
    ))
    assert(keyed.latestPerKey.collect().map { case (k, t) => (k, t.value) }.toMap ==
      Map("k1" -> "late", "k2" -> "only"))

    // empty input -> empty result, not an UnsupportedOperationException
    // from Dataset.reduce; and equal timestamps break deterministically
    assert(PCollection.fromSeq(spark, Seq.empty[(String, Long)])
      .attachTimestamps(_._2).latestGlobally.collect().isEmpty)
    val tied = PCollection.fromSeq(spark, Seq(("x", 7L), ("y", 7L), ("w", 7L)))
      .attachTimestamps(_._2)
    (1 to 3).foreach { _ =>
      assert(tied.latestGlobally.collect().head.value._1 == "y",
        "equal-ts winner must be deterministic (max rendered value)")
    }

    assert(TimeWindow.tumble(125, 60, 10) == TimeWindow(70, 130)) // [70,130) contains 125
  }

  test("global combines and sketches on the facade") {
    assert(pc(1, 2, 3, 4).sumGlobally.collect() == Seq(10))
    assert(pc(1, 2, 3, 4).minGlobally.collect() == Seq(1))
    assert(pc(1, 2, 3, 4).maxGlobally.collect() == Seq(4))
    assert(pc(1, 2, 3, 4).averageGlobally.collect() == Seq(2.5))
    assert(pc(1, 2, 3).countGlobally.collect() == Seq(3L))

    val est = pc((1 to 50).map(i => s"v$i"): _*).approxDistinctCountKmv(64).collect().head
    assert(est == 50.0) // exact below k

    val sample = pc((1 to 100).map(i => s"s$i"): _*).sampleReservoir(10, 42).collect().head
    assert(sample.length == 10)

    val qs = pc((1 to 1000).map(_.toDouble): _*).approxQuantiles(Seq(0.5)).collect().head
    assert(math.abs(qs.head - 500) < 60)
  }

  test("tryFlatMap and flatMapCatching route errors; mapPartitions passes through") {
    val p = pc("1,2", "bad", "3")
    val tried = p.tryFlatMap(_.split(",").map(_.trim.toInt)).collect()
    assert(tried.count(_._1.isDefined) == 3) // 1, 2, 3
    assert(tried.count(_._2.isDefined) == 1)

    val (ok, dlq) = p.flatMapCatching(_.split(",").map(_.toInt))
    assert(ok.collectSorted() == Seq(1, 2, 3))
    assert(dlq.collect().map(_._1) == Seq("bad"))

    assert(pc(1, 2, 3).mapPartitions(it => it.map(_ * 2)).collectSorted() == Seq(2, 4, 6))
  }

  test("per-key reservoir and KMV are deterministic") {
    val kv = PCollection.fromSeq(spark,
      (1 to 200).map(i => (s"k${i % 3}", s"v$i")))
    val s1 = kv.samplePerKey(5, 42).collect().map { case (k, vs) => (k, vs.toSeq) }.toMap
    val s2 = PCollection.fromSeq(spark, (1 to 200).map(i => (s"k${i % 3}", s"v$i")))
      .ds.repartition(7).transform(d => d)
    val s2pc = new PCollection(s2)
    val s2map = s2pc.samplePerKey(5, 42).collect().map { case (k, vs) => (k, vs.toSeq) }.toMap
    assert(s1 == s2map)
    assert(s1.values.forall(_.size == 5))

    val kmv = kv.approxDistinctCountKmvPerKey(128).collect().toMap
    // ~67 distinct per key, below k=128 -> exact
    assert(kmv.values.toSet subsetOf Set(66.0, 67.0))

    val hll = kv.approxDistinctCountHllPerKey(0.016).collect().toMap
    // ~67 distinct per key at p>=12 -> linear counting, near-exact
    assert(hll.keySet == Set("k0", "k1", "k2"))
    assert(hll.values.forall(v => math.abs(v - 67L) <= 3), s"per-key HLL $hll")
  }

  test("observe metrics are collected during execution") {
    val collector = Metrics.install(spark)
    val df = Metrics.observeCount(
      spark.range(100).toDF("id").filter($"id" % 2 === 0), "surface_even_rows")
    df.collect(): Unit
    val m = collector.await("surface_even_rows")
    assert(m.exists(_("rows") == 50L), s"metric missing or wrong: $m")
    assert(collector.toJson.contains("\"surface_even_rows\""))
  }

  test("applyTransform packages a reusable sub-pipeline") {
    def dedupeUpper(in: PCollection[String]): PCollection[String] =
      in.map(_.toUpperCase).distinct()
    assert(pc("a", "A", "b").applyTransform(dedupeUpper).collectSorted() == Seq("A", "B"))
  }

  test("events loader normalizes every ts encoding the testdata has shipped") {
    // the driver has regenerated events.parquet with different physical
    // ts types across rounds (TIMESTAMP(NANOS)-as-long, timestamp[us] /
    // NTZ); the loader must hand every downstream window expression ONE
    // type — a UTC-session TimestampType at the same wall-clock instant
    import org.apache.spark.sql.functions.lit
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    val wallClock = "2024-03-01 12:34:56"
    val micros = java.time.LocalDateTime.parse("2024-03-01T12:34:56")
      .toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L

    def loadOne(dir: java.io.File, writer: org.apache.spark.sql.DataFrame => Unit): java.sql.Timestamp = {
      writer(spark.range(1).toDF("event_id"))
      val out = SparkEntry.events(spark, dir.getAbsolutePath)
      assert(out.schema("ts").dataType == TimestampType, s"loader produced ${out.schema("ts").dataType}")
      out.select($"ts").head().getTimestamp(0)
    }

    val longDir = java.nio.file.Files.createTempDirectory("graft_ev_long").toFile
    val tsLong = loadOne(longDir, base => base
      .withColumn("ts", lit(micros * 1000L)) // legacy nanos-as-long file
      .write.mode("overwrite").parquet(new java.io.File(longDir, "events.parquet").getAbsolutePath))

    val ntzDir = java.nio.file.Files.createTempDirectory("graft_ev_ntz").toFile
    val tsNtz = loadOne(ntzDir, base => base
      .withColumn("ts", lit(wallClock).cast(TimestampNTZType))
      .write.mode("overwrite").parquet(new java.io.File(ntzDir, "events.parquet").getAbsolutePath))

    val utcDir = java.nio.file.Files.createTempDirectory("graft_ev_utc").toFile
    val tsUtc = loadOne(utcDir, base => base
      .withColumn("ts", lit(wallClock).cast(TimestampType))
      .write.mode("overwrite").parquet(new java.io.File(utcDir, "events.parquet").getAbsolutePath))

    assert(tsLong == tsNtz && tsNtz == tsUtc,
      s"ts encodings disagree after normalization: long=$tsLong ntz=$tsNtz utc=$tsUtc")
    assert(tsUtc.toInstant.toEpochMilli == micros / 1000L)
  }
}
