package graft

import graft.Validation._

/** Kitchen-sink integration: the whole typed facade composed in long
  * chains, mirroring the reference's mega integration test
  * (reference: tests/mega_integration.rs — "exercises the entire API
  * surface to ensure all features work together"). Individual-operator
  * semantics live in their own specs; this one pins that the surfaces
  * COMPOSE — the property the reference test exists for.
  */
class MegaIntegrationSpec extends SparkTestBase {
  import spark.implicits._
  import KeyedPCollection._
  import SideInputs._
  import Sketches._

  private def pc[T: org.apache.spark.sql.Encoder](ts: T*): PCollection[T] =
    PCollection.fromSeq(spark, ts)

  private val numbers = (1 to 100).toSeq

  test("mega pipeline: all surfaces compose") {
    import graft.Filters._
    import graft.testing.Assertions
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

  test("stateless transforms + side inputs + composite transform chain") {
    // reference sections 1, 2, 13
    val base = pc(numbers: _*)
    assert(base.map(_ * 2).collectSorted() == numbers.map(_ * 2))
    assert(base.filter(_ % 2 == 0).collectSorted() == numbers.filter(_ % 2 == 0))
    assert(base.flatMap(n => Seq(n, n)).collect().length == 200)

    val primes = Seq(2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31)
    val marked = base
      .mapWithSide(primes)((n, ps) => if (ps.contains(n)) s"$n:PRIME" else s"$n:COMPOSITE")
      .collect()
    assert(marked.count(_.endsWith(":PRIME")) == primes.length)

    // composite transform (reference DoubleAndFilter): double then keep > 20
    def doubleAndFilter(in: PCollection[Int]): PCollection[Int] =
      in.map(_ * 2).filter(_ > 20)
    assert(base.applyTransform(doubleAndFilter).collectSorted() ==
      numbers.map(_ * 2).filter(_ > 20))
  }

  test("keyed operations chain: keyBy -> transform -> aggregate -> join back") {
    // reference sections 3, 6
    val kv = pc(numbers: _*).keyBy(_ % 5)
    val sums = kv.sumPerKey.toDict
    assert(sums(0) == (5 to 100 by 5).sum)
    val counts = kv.countPerKey.toDict
    assert(counts.values.forall(_ == 20L))
    val avgs = kv.averagePerKey.toDict
    assert(math.abs(avgs(1) - (1 to 96 by 5).sum / 20.0) < 1e-9)

    // join the per-key aggregates back together (inner + full)
    val joined = new PCollection(sums.toSeq.toDS()).joinInner(new PCollection(counts.toSeq.toDS()))
      .mapValues { case (s, c) => s.toDouble / c }
      .toDict
    assert(joined.keySet == Set(0, 1, 2, 3, 4))
    assert(math.abs(joined(1) - avgs(1)) < 1e-9)

    val left = pc((1, "a"), (2, "b")).joinLeft(pc((1, "x")))
    assert(left.collect().toSet == Set((1, ("a", Some("x"))), (2, ("b", None))))
    val full = pc((1, "a")).joinFull(pc((2, "y")))
    assert(full.collect().toSet == Set((1, (Some("a"), None)), (2, (None, Some("y")))))

    // cogroup: both sides' values per key
    val cg = pc((1, "a"), (1, "b"), (2, "c")).coGroupByKey(pc((1, "x"), (3, "z")))
      .collect().map { case (k, (l, r)) => k -> ((l.sorted, r.sorted)) }.toMap
    assert(cg(1) == ((Seq("a", "b"), Seq("x"))))
    assert(cg(2) == ((Seq("c"), Seq())))
    assert(cg(3) == ((Seq(), Seq("z"))))
  }

  test("combiners: exact, sketch, and sampling aggregates agree with the data") {
    // reference sections 4, 10, 11
    val base = pc(numbers: _*)
    assert(base.countGlobally.collect().head == 100L)
    assert(base.sumGlobally.collect().head == numbers.sum)
    assert(base.minGlobally.collect().head == 1 && base.maxGlobally.collect().head == 100)
    assert(math.abs(base.averageGlobally.collect().head - 50.5) < 1e-9)

    // approximate distinct counts land within their error bounds
    val strings = pc(numbers.map(i => s"v${i % 40}"): _*)
    assert(strings.distinct().collect().length == 40)
    val kmv = strings.approxDistinctCountKmv(32).collect().head
    assert(kmv > 20 && kmv < 60, s"KMV estimate $kmv wildly off 40")
    val hll = strings.approxDistinctCountHll().collect().head
    assert(hll > 30 && hll < 50, s"HLL estimate $hll wildly off 40")

    // quantiles over 1..1000: median near 500
    val med = pc((1 to 1000).map(_.toDouble): _*).approxQuantiles(Seq(0.5)).collect().head
    assert(math.abs(med.head - 500.0) < 25)

    // deterministic reservoir: size k, drawn from the population, stable
    val s1 = pc(numbers.map(i => s"s$i"): _*).sampleReservoir(10, 42).collect().head
    val s2 = pc(numbers.map(i => s"s$i"): _*).sampleReservoir(10, 42).collect().head
    assert(s1.length == 10 && s1.sameElements(s2))
  }

  test("windowed combine over timestamped elements") {
    // reference sections 7, 15
    import EventTime._
    val events = pc((0L until 90L).map(i => (i, s"e$i")): _*)
    val counts = events
      .attachTimestamps { case (t, _) => t * 1000 } // seconds -> ms
      .keyByWindow(sizeMs = 30000)
      .countPerKey
      .collect()
      .map { case (w, n) => w.start -> n }.toMap
    assert(counts == Map(0L -> 30L, 30000L -> 30L, 60000L -> 30L))
  }

  test("batching amortizes work without changing results") {
    // reference section 8
    val batched = pc(numbers: _*).mapBatches(16)(chunk => chunk.map(_ + 1))
    assert(batched.collectSorted() == numbers.map(_ + 1))
    val sizes = pc(numbers: _*).batchElements(16).collect().map(_.size)
    assert(sizes.sum == 100 && sizes.forall(_ <= 16))
  }

  test("try operations: failures flow to results or dead letters, never crash the chain") {
    // reference section 9
    val tried = pc(numbers: _*)
      .tryMap(n => if (n % 10 == 0) throw new IllegalStateException(s"bad $n") else n * 2)
    val (oks, errs) = tried.collect().partition(_._1.isDefined)
    assert(oks.length == 90 && errs.length == 10)
    assert(errs.forall(_._2.exists(_.contains("bad"))))

    val (good, dlq) = pc(numbers: _*)
      .mapCatching(n => if (n > 95) throw new IllegalStateException(s"over $n") else n)
    assert(good.collectSorted() == (1 to 95))
    assert(dlq.collect().map(_._1).sorted == (96 to 100))
  }

  test("IO roundtrip composes with the typed facade end to end") {
    // reference section 14: write what a chain produced, read it back,
    // keep chaining on the re-read collection
    val dir = java.nio.file.Files.createTempDirectory("graft-mega-io")
    val perKey = pc(numbers: _*).keyBy(_ % 7).sumPerKey
    val df = perKey.ds.toDF("k", "total")
    graft.sources.IOOps.writeParquet(df, s"$dir/pq")
    graft.sources.IOOps.writeJsonl(df, s"$dir/jl")
    val back = new PCollection(
      graft.sources.IOOps.readParquet(spark, s"$dir/pq").as[(Int, Int)])
    val roundTripped = back.mapValues(_.toLong).toDict
    assert(roundTripped == perKey.toDict.map { case (k, v) => k -> v.toLong })
    val jl = graft.sources.IOOps.readJsonl(spark, s"$dir/jl")
    assert(jl.count() == 7)
  }

  test("validation + curation-style selection compose on the typed path") {
    // round-6 surfaces composed: log-and-continue gate feeding a keyed
    // aggregate, collector tallying what the gate dropped
    val collector = ErrorCollector.distributed(spark)
    val clean = pc(numbers: _*)
      .validateLogAndContinue(
        Validators.inRange("n", 1, 90)(_), collector, n => Some(n.toString))
      .keyBy(_ % 3).countPerKey.toDict
    assert(clean.values.sum == 90L)
    assert(collector.errorCount == 10)
  }
}
