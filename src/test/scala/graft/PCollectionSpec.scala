package graft

/** Element-wise surface (reference: src/helpers/common.rs, stdlib.rs,
  * batches.rs, try_process.rs, dead_letter.rs, wait_on.rs).
  */
class PCollectionSpec extends SparkTestBase {
  import spark.implicits._

  private def pc[T: org.apache.spark.sql.Encoder](xs: T*): PCollection[T] =
    PCollection.fromSeq(spark, xs)

  test("map / filter / flatMap / filterMap compose like the reference word-count") {
    val words = pc("the quick fox", "the lazy dog")
      .flatMap(_.split(" "))
      .map(_.toUpperCase)
      .filter(_.length > 3)
      .collectSorted()
    assert(words == Seq("LAZY", "QUICK"))
  }

  test("filterMap drops Nones and unwraps Somes") {
    val out = pc("1", "x", "3").filterMap(s => s.toIntOption).collectSorted()
    assert(out == Seq(1, 3))
  }

  test("take limits, first takes one") {
    assert(pc(1, 2, 3, 4, 5).take(3).collect().size == 3)
    assert(pc(1, 2, 3).first().collect().size == 1)
  }

  test("flatten/union keeps duplicates (bag semantics)") {
    val a = pc(1, 2)
    val b = pc(2, 3)
    assert(a.union(b).collectSorted() == Seq(1, 2, 2, 3))
  }

  test("distinct and distinctBy") {
    assert(pc(1, 2, 2, 3).distinct().collectSorted() == Seq(1, 2, 3))
    val byParity = pc(1, 2, 3, 4).distinctBy(_ % 2).collect()
    assert(byParity.size == 2)
    assert(byParity.map(_ % 2).toSet == Set(0, 1))
  }

  test("mapBatches sees whole chunks; batchElements groups; batchBySize bounds bytes") {
    val doubled = pc(1, 2, 3, 4, 5).reshuffle(1).mapBatches(2)(chunk => chunk.map(_ * 2)).collectSorted()
    assert(doubled == Seq(2, 4, 6, 8, 10))

    val batches = pc(1, 2, 3, 4, 5).reshuffle(1).batchElements(2).collect()
    assert(batches.map(_.size).sorted == Seq(1, 2, 2))

    // byte budget 10, each element "sized" 4 -> batches of 2 (except oversize alone)
    val sized = pc(1, 2, 3, 4, 5).reshuffle(1).batchBySize(10)(_ => 4L).collect()
    assert(sized.flatten.sorted == Seq(1, 2, 3, 4, 5))
    assert(sized.forall(_.size <= 2))
  }

  test("tryMap yields ok/err pairs; mapCatching dead-letters failures") {
    val tried = pc("1", "oops", "3").tryMap(_.toInt).collect()
    assert(tried.count(_._1.isDefined) == 2)
    assert(tried.count(_._2.isDefined) == 1)

    val (ok, dlq) = pc("1", "oops", "3").mapCatching(_.toInt)
    assert(ok.collectSorted() == Seq(1, 3))
    val dead = dlq.collect()
    assert(dead.map(_._1) == Seq("oops"))
  }

  test("waitOn forces the signal then passes data through unchanged") {
    val data = pc(1, 2, 3)
    val signal = pc("a", "b")
    assert(data.waitOn(signal).collectSorted() == Seq(1, 2, 3))
  }

  test("waitOn defers the signal until the downstream action, then completes it first") {
    WaitOnProbe.reset()
    val signal = pc(10, 20, 30).map { v => WaitOnProbe.touched.incrementAndGet(); v }
    val gated = pc(1, 2, 3).waitOn(signal)
    // composing further transforms is still wiring, not execution
    val downstream = gated.map(v => (v, WaitOnProbe.touched.get()))
    assert(WaitOnProbe.touched.get() == 0L,
      "signal ran at graph-build time; waitOn must defer to the downstream action")
    // the action forces the signal to fully drain BEFORE any element flows
    val out = downstream.collect().sortBy(_._1)
    assert(out.map(_._1) == Seq(1, 2, 3))
    assert(out.forall(_._2 == 3L),
      s"downstream elements saw a partially-drained signal: $out")
  }

  test("namedScope qualifies withName hierarchically and pops on exit") {
    // reference: Pipeline::named_scope + with_name -> "WordCount/Sum"
    val named = PCollection.namedScope("WordCount") {
      PCollection.namedScope("Inner") {
        pc(1, 2, 3).withName("Sum")
      }
    }
    assert(named.ds.queryExecution.analyzed.toString.contains("WordCount/Inner/Sum"),
      s"scope path missing from plan:\n${named.ds.queryExecution.analyzed}")
    // the scope pops even when the body throws (reference Drop-guard
    // contract), so later names are unqualified
    intercept[RuntimeException] {
      PCollection.namedScope("Stale") { throw new RuntimeException("boom") }
    }
    assert(PCollection.qualifyWithScope("Plain") == "Plain", "scope stack leaked")
    // naming resolves at wiring time, not at first action: the alias
    // must carry the scope active when withName was CALLED
    val wired = PCollection.namedScope("Outer") { pc(1).withName("Inside") }
    assert(wired.ds.queryExecution.analyzed.toString.contains("Outer/Inside"))
    // explain surfaces the attached names (reference:
    // ExecutionExplanation.node_names, the NAMED OPERATIONS footer)
    assert(named.explain().nodeNames.contains("WordCount/Inner/Sum"),
      s"node names missing from explain: ${named.explain().nodeNames}")
  }

  test("explain reports steps, counts shuffle barriers, suggests partitions") {
    val pc = PCollection.fromSeq(spark, (1 to 100).map(i => (i % 5, i)))
    // map-only chain: no shuffle barrier
    val narrow = pc.map { case (k, v) => (k, v * 2) }.explain()
    assert(narrow.barriers == 0, s"narrow plan has barriers:\n${narrow.formatted}")
    assert(narrow.totalOps > 0 && narrow.steps.nonEmpty)
    assert(narrow.suggestedPartitions > 0)
    // grouped chain: at least one Exchange
    import KeyedPCollection._
    val grouped = pc.groupByKey.explain()
    assert(grouped.barriers >= 1, s"groupBy plan shows no barrier:\n${grouped.formatted}")
    assert(grouped.steps.exists(_.isBarrier))
  }

  test("explain carries Catalyst cost estimates per optimized node and the rewrite log") {
    // a plan with a real scan (parquet -> stats from the files), a
    // filter, and an aggregation — enough surface for the optimizer to
    // have DONE something worth logging
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(org.apache.spark.sql.functions.col("l_quantity") >= 30)
      .groupBy("l_returnflag")
      .count()
    val ex = new PCollection(df.as(org.apache.spark.sql.Encoders.row(df.schema))).explain()
    // estimates: one per optimized-plan node, in the plan's own
    // (root-first) order, every node costed in bytes
    val optNames = df.queryExecution.optimizedPlan.collect { case n => n.nodeName }
    assert(ex.estimates.map(_.name) == optNames,
      s"estimates must cover the optimized plan in order: ${ex.estimates.map(_.name)} vs $optNames")
    assert(ex.estimates.nonEmpty && ex.estimates.forall(_.estimatedBytes > 0),
      s"every node needs a positive byte estimate: ${ex.estimates}")
    // the leaf scan's estimate is the real file-backed size — strictly
    // the largest number in this shrinking plan
    assert(ex.estimates.last.estimatedBytes >= ex.estimates.head.estimatedBytes,
      s"scan estimate must dominate the aggregated root: ${ex.estimates}")
    // the rewrite log names at least one effective optimizer rule and
    // carries NO analyzer resolution noise (those fire on every query)
    assert(ex.rewrites.nonEmpty, "optimizer rewrite log is empty")
    assert(ex.rewrites.forall(_.matches(".+ x\\d+")), s"bad rewrite entries: ${ex.rewrites}")
    assert(!ex.rewrites.exists(r => r.startsWith("ResolveReferences") || r.startsWith("CleanupAliases")),
      s"analyzer bookkeeping leaked into the optimization log: ${ex.rewrites}")
  }

  test("reshuffle preserves content") {
    assert(pc(1 to 100: _*).reshuffle(7).collectSorted() == (1 to 100))
  }

  test("tee returns two handles over the same cached data") {
    val (l, r) = pc(1, 2, 3).tee()
    assert(l.collectSorted() == r.collectSorted())
  }
}

/** Shared JVM-wide side-effect counter for the waitOn ordering test
  * (local-mode executors share this JVM, so the static is visible to
  * tasks and the driver alike).
  */
object WaitOnProbe {
  val touched = new java.util.concurrent.atomic.AtomicLong(0)
  def reset(): Unit = touched.set(0)
}
