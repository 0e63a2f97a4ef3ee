package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** Bench regression-guard plumbing: the baseline parser must recover the
  * per-query seconds map from a previous round's BENCH JSON (both the raw
  * one-line form Bench prints and the driver's wrapped {"parsed":{...}}
  * recording).
  */
class BenchGuardSpec extends AnyFunSuite {

  private def write(content: String): String = {
    val f = Files.createTempFile("bench", ".json")
    Files.writeString(f, content)
    f.toString
  }

  test("parseBaseline reads the queries map from a raw bench line") {
    val p = write(
      """{"metric":"total","value":10.144,"unit":"sec","queries":{"q1_agg":0.472,"sum_per_key":0.853},"sf":"/root/testdata/sf0.1"}""")
    val m = Bench.parseBaseline(p)
    assert(m("q1_agg") == 0.472)
    assert(m("sum_per_key") == 0.853)
  }

  test("parseBaseline reads a driver-wrapped recording with a queries block") {
    val p = write(
      """{
        |  "n": 4, "rc": 0,
        |  "parsed": {
        |    "metric": "total", "value": 12.616,
        |    "queries": { "q1_agg": 1.318, "join_broadcast": 1.524 }
        |  }
        |}""".stripMargin)
    val m = Bench.parseBaseline(p)
    assert(m("q1_agg") == 1.318)
    assert(m("join_broadcast") == 1.524)
  }

  test("parseBaseline reads medians, never spread bounds, from the spreads-carrying format") {
    // round 14 added per-query [min,max] spreads; they are emitted
    // BEFORE "queries" precisely so the scan-from-"queries" extractor
    // cannot read a spread bound as a median
    val p = write(
      """{"metric":"total","value":10.144,"unit":"sec","spreads":{"q1_agg":[0.101,9.999],"sum_per_key":[0.700,0.901]},"queries":{"q1_agg":0.472,"sum_per_key":0.853},"sf":"/root/testdata/sf0.1"}""")
    val m = Bench.parseBaseline(p)
    assert(m("q1_agg") == 0.472, s"median overwritten by a spread bound: $m")
    assert(m("sum_per_key") == 0.853)
  }

  test("every jitter-prone query is a real bench entry") {
    val unknown = SparkEntry.jitterProneBenchQueries -- SparkEntry.benchQueries.toSet
    assert(unknown.isEmpty, s"jitterProneBenchQueries not in benchQueries: $unknown")
    // the median-of-7 set is the worst-offender subset of jitter-prone
    val notProne = SparkEntry.highSpreadBenchQueries -- SparkEntry.jitterProneBenchQueries
    assert(notProne.isEmpty, s"highSpreadBenchQueries not jitter-prone: $notProne")
  }

  test("parseBaseline reads a driver recording whose tail embeds the line as an ESCAPED string") {
    // the driver's BENCH_rN.json wraps (a truncated tail of) the bench
    // line inside a JSON string — quotes arrive as \" and the r16
    // guard silently matched NOTHING against it (vacuous pass)
    val p = write(
      """{
        |  "n": 16, "rc": 0, "cpus": 32, "sf": 0.1,
        |  "tail": "sters_distributed\":2.740,\"q1_agg\":0.472,\"sum_per_key\":0.853}"
        |}""".stripMargin)
    val m = Bench.parseBaseline(p)
    assert(m("q1_agg") == 0.472 && m("sum_per_key") == 0.853, m.toString)
  }

  test("parseBaseline reads medians from the persisted target/bench.json nested format") {
    // round 17: Bench writes the full artifact (median + spread per
    // query, one line each) to target/bench.json — the parser must
    // read the "sec" medians and never a spread bound
    val p = write(
      """{
        |  "metric": "total", "value": 10.144, "unit": "sec", "sf": "/root/testdata/sf0.1",
        |  "queries": {
        |    "q1_agg": {"sec": 0.472, "spread": [0.101, 9.999]},
        |    "sum_per_key": {"sec": 0.853, "spread": [0.700, 0.901]}
        |  }
        |}""".stripMargin)
    val m = Bench.parseBaseline(p)
    assert(m == Map("q1_agg" -> 0.472, "sum_per_key" -> 0.853), m.toString)
  }

  test("parseBaseline tolerates a file with no queries block") {
    val p = write("""{"metric":"total","value":1.0}""")
    val m = Bench.parseBaseline(p)
    // "value" matches the generic pattern — harmless: guard only compares
    // names that exist in both the baseline and the current sweep.
    assert(!m.contains("q1_agg"))
  }

  test("bench surface covers every capstone chain") {
    // guard-the-guard: the exit-3 regression guard only sees queries in
    // benchQueries, so the most-composed pipelines must never silently
    // drop off the bench surface
    val missing = SparkEntry.capstoneQueries.toSet -- SparkEntry.benchQueries.toSet
    assert(missing.isEmpty, s"capstone chains missing from benchQueries: $missing")
  }

  test("every bench query is runnable and oracle-graded") {
    val noQuery = SparkEntry.benchQueries.filterNot(SparkEntry.queries.keySet.contains)
    assert(noQuery.isEmpty, s"benchQueries without a queries entry: $noQuery")
    val noOracle = SparkEntry.benchQueries.filterNot(SparkEntry.oracleSql.keySet.contains)
    assert(noOracle.isEmpty, s"benchQueries without an oracle: $noOracle")
  }

  test("the PQ quality gates are pinned and cannot drift") {
    // similarity_pq_recall's gates read these constants; a regression
    // in codebook training or ADC scoring could otherwise be absorbed
    // by silently loosening them. Measured bands at M=16/K=64 across
    // sf0.001-sf0.1: recall@10 0.29-0.42 (random scan ~0.5-2%), cosine
    // MAE 0.036-0.041 plain / 0.035-0.040 residual (similarity spread
    // 0.125). The plain ceiling tightened 0.08 -> 0.06 in round 10.
    assert(graft.operators.Similarity.PQRecallFloor == 0.15,
      s"PQ recall floor moved from its pinned 0.15: ${graft.operators.Similarity.PQRecallFloor}")
    assert(graft.operators.Similarity.PQErrorCeiling == 0.06,
      s"PQ error ceiling moved from its pinned 0.06: ${graft.operators.Similarity.PQErrorCeiling}")
    assert(graft.operators.Similarity.ResidualPQErrorCeiling == 0.06,
      s"residual PQ error ceiling moved from its pinned 0.06: ${graft.operators.Similarity.ResidualPQErrorCeiling}")
    assert(graft.operators.Similarity.OpqErrorCeiling == 0.06,
      s"OPQ error ceiling moved from its pinned 0.06: ${graft.operators.Similarity.OpqErrorCeiling}")
    assert(graft.operators.Similarity.OpqWorseRatio == 1.15,
      s"OPQ worse-ratio bound moved from its pinned 1.15: ${graft.operators.Similarity.OpqWorseRatio}")
    assert(graft.operators.QualityClassifier.AccuracyFloor == 0.9,
      s"classifier accuracy floor moved from its pinned 0.9: ${graft.operators.QualityClassifier.AccuracyFloor}")
  }

  test("the IVF recall floor is pinned and cannot drift downward") {
    // similarity_recall's gate reads this constant; a regression that
    // weakened the trained quantizer could otherwise be absorbed by
    // silently lowering the threshold inside the query. The measured
    // recall band is 0.76-0.78 (nprobe=4 of 8 cells, sf0.001-sf0.1) —
    // anyone changing the floor changes THIS assertion too, loudly.
    assert(graft.operators.Similarity.RecallFloor == 0.65,
      s"IVF recall floor moved from its pinned 0.65: ${graft.operators.Similarity.RecallFloor}")
  }

  test("queries and oracleSql cover exactly the same keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries with no oracle: ${q -- o}")
    assert((o -- q).isEmpty, s"oracles with no query: ${o -- q}")
  }
}
