package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan shape checks: the scale-critical properties the
  * operators rely on must actually appear in the executed plan —
  * filter/column pushdown into the parquet scan, broadcast joins for
  * small dims, map-side partial aggregation, and whole-stage codegen
  * around the native dot-product expression.
  */
class PlanShapeSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlanString(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force execution so AQE finalizes
    df.queryExecution.executedPlan.toString
  }

  test("filters and projections are pushed into the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_quantity") >= 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThanOrEqual(l_quantity,30.0)"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("small-dim join plans as a broadcast hash join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val part = spark.read.parquet(s"$sf/part.parquet")
    val joined = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand").count()
    val plan = executedPlanString(joined)
    assert(plan.contains("BroadcastHashJoin"), s"expected BroadcastHashJoin:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"unexpected SortMergeJoin:\n$plan")
  }

  test("aggregation runs partial map-side before the exchange") {
    val agg = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(sum("l_quantity"))
    val plan = executedPlanString(agg)
    // partial + final HashAggregate pair around one exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial aggregation:\n$plan")
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"), plan)
  }

  test("graft_dot participates in whole-stage codegen") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val df = emb.select(graft.operators.Similarity.dot(col("embedding"), col("embedding")).as("d"))
    val plan = executedPlanString(df)
    assert(plan.contains("graft_dot"), s"expression missing from plan:\n$plan")
    // the `*(n)` prefix on an operator marks its whole-stage-codegen span
    assert(plan.contains("*(1) Project [graft_dot"), s"no codegen span around graft_dot:\n$plan")
  }

  test("graft_dot resolves by name in SQL after GraftFunctions.register") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d"
    ).head().getDouble(0)
    assert(r == 11.0)
  }

  test("graft_dot null-poisons dirty inputs instead of degrading silently") {
    GraftFunctions.register(spark)
    // length mismatch (corrupt embedding) -> NULL, not a truncated product
    assert(spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d"
    ).head().isNullAt(0))
    // a null element -> NULL, not nulls-as-zero (matches zip_with form)
    assert(spark.sql(
      "SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d"
    ).head().isNullAt(0))
  }

  test("graft SQL functions reject wrong arity and non-integral literals loudly") {
    GraftFunctions.register(spark)
    // wrong arity names the function and expected count, not an opaque
    // IndexOutOfBounds from children(1)
    val arityErr = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(CAST(1.0 AS FLOAT)))").collect()
    }
    assert(arityErr.getMessage.contains("graft_dot") && arityErr.getMessage.contains("2"),
      s"unhelpful arity error: ${arityErr.getMessage}")
    // a fractional literal must not silently truncate the sketch width
    val litErr = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array('a','b'), 2.5)").collect()
    }
    assert(litErr.getMessage.contains("integer literal"),
      s"fractional numHashes not rejected: ${litErr.getMessage}")
    // the spark.sql.extensions entry point shares the same builders
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("hyperplane bucket projection is native codegen, not interpreted HOFs") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val buckets = graft.operators.Similarity.lshBuckets(emb, "vec_id", "embedding", 8)
    val plan = executedPlanString(buckets)
    assert(plan.contains("graft_hyperplane_bucket"), s"native expression missing:\n$plan")
    assert(plan.contains("*(1) Project [") && plan.contains("graft_hyperplane_bucket(embedding"),
      s"no codegen span around graft_hyperplane_bucket:\n$plan")
    // the composed form's interpreted HOFs must be gone from the scan path
    assert(!plan.contains("zip_with") && !plan.contains("aggregate(") && !plan.contains("lambdafunction"),
      s"interpreted HOFs still in the bucket projection:\n$plan")
  }

  test("quality-gate predicate stays in whole-stage codegen when pushed into the scan") {
    // the keep predicate inlines the full signal when-chain; with the
    // HOF-composed bigram signal the pushed Filter fell out of
    // whole-stage codegen (CodegenFallback transform lambdas) and ran
    // interpreted at ~1 ms/doc — this pins the native-expression fix
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val gated = graft.operators.Curation.qualityFilter(docs, "doc_id", "text",
      minTokens = 10, maxBigramRep = 0.2, minAlphaRatio = 0.8)
      .where(col("keep") === 1)
      .select("doc_id")
    val plan = executedPlanString(gated)
    assert(plan.contains("graft_bigram_rep"), s"native bigram expression missing:\n$plan")
    // every Filter mentioning the quality signals must carry the `*(n)`
    // codegen-span prefix; a bare "Filter" line means interpreted eval
    val filterLines = plan.linesIterator.filter(_.contains("Filter ")).toSeq
    assert(filterLines.nonEmpty, s"no Filter in the gated plan:\n$plan")
    filterLines.foreach { line =>
      assert(line.contains("*("),
        s"quality Filter outside whole-stage codegen (interpreted):\n$line\n\n$plan")
    }
    assert(!plan.contains("lambdafunction"),
      s"interpreted HOFs back in the quality predicate:\n$plan")
  }

  test("expensive projections evaluate exactly once under pushed filters (r21 barriers)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")

    // quality gate over an expensive text alias (the html capstone
    // shape): predicate pushdown used to alias-substitute the WHOLE
    // 12-regexp extraction chain into the pushed keep-filter — 7
    // evaluations per row. The Generate barrier pins it to one.
    val extracted = docs.select(col("doc_id"),
      graft.functions.TextFunctions.extractText(col("text")).as("text"))
    val gated = graft.operators.Curation.qualityFilter(extracted, "doc_id", "text",
      minTokens = 10, maxBigramRep = 0.2, minAlphaRatio = 0.8)
      .where(col("keep") === 1)
      .select("doc_id", "n_tokens")
    val gPlan = executedPlanString(gated).split("== Initial Plan ==")(0)
    // the extraction chain's script-strip pattern is its unique marker
    // (alpha_ratio legitimately carries its own small regexp_replace)
    val extractions = gPlan.linesIterator.count(_.contains("(?is)<script"))
    assert(extractions == 1,
      s"extraction chain appears on $extractions plan lines (want exactly 1):\n$gPlan")

    // simhash pairing: the banded consumer's isNotNull guard and the
    // inferred join-key null filters used to re-evaluate the
    // fingerprint hash 3x per row; KnownNotNull folds them away. One
    // side computes (the other is a ReusedExchange), and that side
    // carries the expression exactly once, in the projection.
    val pairs = graft.operators.Dedup.simhashNearDuplicates(
      docs, "doc_id", "text", bits = 16, maxHamming = 2)
    val sPlan = executedPlanString(pairs).split("== Initial Plan ==")(0)
    val simhashLines = sPlan.linesIterator.count(_.contains("graft_simhash"))
    assert(simhashLines == 1,
      s"graft_simhash appears on $simhashLines plan lines (want exactly 1 — " +
        s"null-check pushdown re-evaluating the hash):\n$sPlan")

    // jaccard verify: the threshold predicate used to push into the
    // join condition and run the O(|A|+|B|) sorted-intersect merge scan
    // 3x per candidate pair; behind the Generate barrier it runs once.
    val verified = graft.operators.Dedup.nearDuplicates(
      docs, "doc_id", "text", numHashes = 8, rowsPerBand = 2, thresholdPct = 40)
    val vPlan = executedPlanString(verified).split("== Initial Plan ==")(0)
    val intersects = vPlan.linesIterator.count(_.contains("graft_sorted_intersect_size"))
    assert(intersects == 1,
      s"sorted-intersect appears on $intersects plan lines (want exactly 1):\n$vPlan")
    assert(!vPlan.contains("lambdafunction"),
      s"interpreted HOF comparator back in the token-set projection:\n$vPlan")
  }

  test("LSH candidate join shuffles on the bucket key, not a cross join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 2)
    val plan = executedPlanString(pairs)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH degenerated to a cross join:\n$plan")
    // the self-join's two sides must share ONE shuffle exchange over the
    // (band, bsig) repartitioning, so the signature subtree computes once
    // (shuffle-file-backed, no cache) — ReusedExchange, and exactly one
    // band-stack Generate in the FINAL plan (the AQE string also prints
    // the pre-reuse Initial Plan; slice it off before counting)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("ReusedExchange"), s"band exchange not reused across self-join sides:\n$plan")
    assert("Generate stack".r.findAllIn(finalPlan).size == 1,
      s"band/signature subtree appears more than once in the final plan:\n$finalPlan")
  }

  test("simhash pairing joins on band buckets with a reused exchange, never a cross join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pairs = graft.operators.Dedup.simhashNearDuplicates(docs, "doc_id", "text", 16, 2)
    val plan = executedPlanString(pairs)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"simhash pairing degenerated to a cross join:\n$plan")
    // one fingerprint+band subtree, reused across both self-join sides:
    // the band-stack Generate must appear exactly once in the final
    // plan, with the second side reading the reused exchange
    assert(finalPlan.contains("ReusedExchange"),
      s"band exchange not reused across self-join sides:\n$plan")
    assert("Generate explode".r.findAllIn(finalPlan).size == 1,
      s"fingerprint/band subtree computed more than once:\n$finalPlan")
    // the corpus-sized width (dedup_simhash_pairs32) must keep the
    // exact same shape — wider bands change band signatures, never the
    // join strategy or the subtree reuse
    val plan32 = executedPlanString(
      graft.operators.Dedup.simhashNearDuplicates(docs, "doc_id", "text", 32, 2))
    val finalPlan32 = plan32.split("== Initial Plan ==")(0)
    assert(!plan32.contains("CartesianProduct") && !plan32.contains("BroadcastNestedLoopJoin") &&
      finalPlan32.contains("ReusedExchange") &&
      "Generate explode".r.findAllIn(finalPlan32).size == 1,
      s"32-bit simhash pairing lost the pinned plan shape:\n$plan32")
  }

  test("repeated-span detection runs ONE generator and ONE exchange, windowed frequency") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val spans = graft.operators.Dedup.repeatedSpans(docs, "doc_id", "text", 8, 2)
    val plan = executedPlanString(spans)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // the corpus-wide fingerprint generator — the dominant cost — must
    // execute exactly once: the aggregate-and-rejoin form ran it twice
    // (its partial-agg subtree never canonicalized with the probe side)
    assert("Generate posexplode".r.findAllIn(finalPlan).size == 1,
      s"span generator appears more than once in the final plan:\n$finalPlan")
    // one shuffle of the fixed-width occurrence relation, shared by both
    // Window operators (dense_rank + its per-span max)
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size
      + "ShuffleQueryStage".r.findAllIn(finalPlan).size <= 2, // exchange + its AQE stage wrapper
      s"more than one exchange in the span plan:\n$finalPlan")
    assert("Window".r.findAllIn(finalPlan).size == 2,
      s"expected the dense_rank + max window pair:\n$finalPlan")
    // the frequency is computed in-place over the window — no join back
    assert(!finalPlan.contains("Join"), s"span detection still rejoins:\n$finalPlan")
    // candidates are fingerprinted by the O(tokens)-per-doc native
    // rolling hash — the per-window concat+md5 form (a 128-bit crypto
    // hash per token position, ~2x the query's whole oracle wall time)
    // must never come back
    assert(finalPlan.contains("graft_rolling_span_hashes"),
      s"native rolling window fingerprint missing from the span plan:\n$finalPlan")
    assert(!finalPlan.contains("md5"), s"per-window md5 crept back into the span plan:\n$finalPlan")
  }

  test("span text re-derivation joins back only survivors, keeping the candidate path hash-only") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val spans = graft.operators.Dedup.repeatedSpansWithText(docs, "doc_id", "text", 8, 2)
    val plan = executedPlanString(spans)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // exactly one generator (the candidate fingerprint pass) — the text
    // side re-tokenizes per DOC, never per window, so no second explode
    assert("Generate posexplode".r.findAllIn(finalPlan).size == 1,
      s"with-text surface re-exploded the corpus:\n$finalPlan")
    assert(!finalPlan.contains("md5"), s"md5 in the with-text span plan:\n$finalPlan")
    // the string slice happens above the join — on surviving rows only
    assert(finalPlan.contains("concat_ws"), s"span text not re-derived:\n$finalPlan")
  }

  test("span cut projection is the native merge scan, not interpreted HOF probes") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val cut = graft.operators.Dedup.cutRepeatedSpans(docs, "doc_id", "text", 8, 2)
    val plan = executedPlanString(cut)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("graft_cut_spans"),
      s"native cut expression missing from the plan:\n$finalPlan")
    // the O(tokens x spans) exists() probe must be gone from the cut
    // projection (the detection generator's transform lambda remains —
    // it builds the windows, not the per-token probe)
    assert(!finalPlan.contains("exists("),
      s"interpreted exists() probe still in the cut projection:\n$finalPlan")
  }

  test("incremental near-dup computes each side's band signatures exactly once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nd = graft.operators.Dedup.incrementalNearDuplicates(
      docs.where(col("doc_id") % 10 === 0), docs.where(col("doc_id") % 10 =!= 0),
      "doc_id", "text", 8, 2, 40)
    val plan = executedPlanString(nd)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // ONE candidate join over a tagged union build side: the corpus's
    // band signatures compute once, the increment's once per join side
    // (probe + union member — the small side by design), and exactly
    // two exchanges feed the join. Three stacks total; a regression to
    // per-branch joins shows up as extra stacks/exchanges here.
    assert("Generate stack".r.findAllIn(finalPlan).size == 3,
      s"expected 3 band stacks (corpus once, increment twice):\n$finalPlan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental near-dup degenerated to a cross join:\n$plan")
  }

  test("language-profile fit explodes native char trigrams, not interpreted HOF lambdas") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text").as("t"), col("lang"))
    val fit = graft.functions.TextFunctions.langProfileFit(docs, "t", "lang", 5)
    val plan = executedPlanString(fit)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert(finalPlan.contains("graft_char_trigrams"),
      s"gram generator must be the native expression:\n$finalPlan")
    assert(!finalPlan.contains("transform("),
      s"interpreted HOF leaked back into the fit path:\n$finalPlan")
  }

  test("incremental fingerprint pairing hash-joins band buckets with the increment as build") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val fps = graft.operators.Dedup.simhash(docs, "doc_id", "text", bits = 16)
    val nd = graft.operators.Dedup.fingerprintNearDuplicatesIncremental(
      fps.where(col("doc_id") % 10 === 0), fps.where(col("doc_id") % 10 =!= 0),
      "doc_id", "simhash", bits = 16, maxHamming = 2)
    val plan = executedPlanString(nd)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // ONE shuffled hash join on (band, bsig) — the increment side is
    // the hinted build table (small by the daily-delta contract) — and
    // never a cross join; corpus x corpus pairs are excluded by
    // construction, not filtered after the fact
    assert("ShuffledHashJoin".r.findAllIn(finalPlan).size == 1,
      s"expected exactly one shuffled hash join on band buckets:\n$finalPlan")
    assert(finalPlan.contains("BuildLeft"),
      s"the increment (left) side must be the hash build table:\n$finalPlan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental fingerprint pairing degenerated to a cross join:\n$plan")
  }

  test("embedding near-dup self-join reuses one bucket exchange, cache-free") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val nd = graft.operators.Similarity.cosineNearDuplicates(emb, "vec_id", "embedding", 4, 30)
    val plan = executedPlanString(nd)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // the (id, vec, norm, bucket) projection must compute once, backed
    // by shuffle files — not an in-memory cache (no memory cost, no
    // blocking materialization job) and not once per join side
    assert(finalPlan.contains("ReusedExchange"),
      s"bucket exchange not reused across self-join sides:\n$plan")
    assert(!plan.contains("InMemoryRelation"),
      s"embedding near-dup still caches:\n$plan")
    assert("graft_hyperplane_bucket".r.findAllIn(finalPlan).size == 1,
      s"bucket projection computed more than once in the final plan:\n$finalPlan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"embedding near-dup degenerated to a cross join:\n$plan")
  }

  test("similarity top-k is a bounded partial aggregation, not a window sort") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val topk = graft.operators.Similarity.bruteForceTopK(
      emb.where(col("vec_id") < 5), emb, "vec_id", "embedding", 5)
    val plan = executedPlanString(topk)
    // the O(k) aggregate must appear, partially aggregated map-side
    // (ObjectHashAggregate partial_graft_top_k before the exchange)
    assert(plan.contains("graft_top_k"), s"bounded top-k aggregate missing:\n$plan")
    assert(plan.contains("partial_graft_top_k"), s"no map-side partial top-k:\n$plan")
    // and the full-sort window shape must NOT: a Window or a global Sort
    // over the scored set would shuffle every candidate per query
    assert(!plan.contains("Window"), s"top-k still a window:\n$plan")
    assert(!plan.contains("row_number"), s"top-k still row_number:\n$plan")
  }

  test("graft_sorted_intersect_size matches size(array_intersect) on sorted-distinct arrays") {
    GraftFunctions.register(spark)
    // randomized cross-check against the built-in, plus codegen presence
    val df = spark.read.parquet(s"$sf/documents.parquet").limit(200)
      .select(expr("array_sort(array_distinct(split(text, ' ')))").as("a"),
              expr("array_sort(array_distinct(split(reverse(text), ' ')))").as("b"))
    val mismatch = df.select(
      expr("graft_sorted_intersect_size(a, b)").as("fast"),
      expr("size(array_intersect(a, b))").as("ref")
    ).where(col("fast") =!= col("ref")).count()
    assert(mismatch == 0, s"$mismatch rows disagree with array_intersect")
    // codegen probe on HOF-free inputs (array_sort's lambda comparator is
    // CodegenFallback and would break the span regardless of this expr)
    val cg = spark.range(100).select(
      expr("array(concat('a', cast(id as string)), 'b', 'c')").as("a"),
      expr("array('b', 'c', 'd')").as("b"))
    val plan = executedPlanString(
      cg.select(expr("graft_sorted_intersect_size(a, b)").as("n")))
    assert(plan.contains("*(1) Project [graft_sorted_intersect_size"),
      s"no codegen span around graft_sorted_intersect_size:\n$plan")
  }

  test("bucketed co-located join runs with no shuffle exchange") {
    val base = "/root/repo/target/test-io/bucketed"
    graft.sources.IOOps.writeBucketed(
      spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_orderpriority"),
      "graft_test_orders_bkt", s"$base/orders", "o_orderkey", 4)
    graft.sources.IOOps.writeBucketed(
      spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_quantity"),
      "graft_test_lineitem_bkt", s"$base/lineitem", "l_orderkey", 4)
    // disable broadcast so the no-Exchange shape comes from bucketing,
    // not from a broadcast of the small test table
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = spark.table("graft_test_orders_bkt")
      val li = spark.table("graft_test_lineitem_bkt")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select("o_orderpriority", "l_quantity")
      val plan = executedPlanString(joined)
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-class join reading bucketed layout:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"bucket pruning metadata missing:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("partition-column filter prunes directories at the scan") {
    val base = "/root/repo/target/test-io/partitioned"
    graft.sources.IOOps.writePartitioned(
      spark.read.parquet(s"$sf/orders.parquet").select("o_orderkey", "o_orderpriority"),
      base, "o_orderpriority")
    val df = spark.read.parquet(base).where(col("o_orderpriority") === "1-URGENT")
    val plan = executedPlanString(df)
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"no partition filter at the scan:\n$plan")
    // the filter is satisfied entirely by directory pruning — nothing
    // left to push as a row-level parquet filter
    assert(plan.contains("PushedFilters: []"),
      s"partition predicate leaked into row-level filtering:\n$plan")
  }

  test("per-key t-digest aggregates partially map-side") {
    import spark.implicits._
    import Sketches._
    val kv = new PCollection(
      spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_returnflag"), col("l_extendedprice")).as[(String, Double)])
    val df = kv.approxQuantilesPerKey(Seq(0.5)).ds.toDF("k", "qs")
    val plan = executedPlanString(df)
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"typed aggregator shape missing:\n$plan")
    assert(plan.contains("partial_"), s"no map-side partial aggregation:\n$plan")
  }

  test("nearDuplicates verifies LSH candidates only - no all-pairs block join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val nd = graft.operators.Dedup.nearDuplicates(docs, "doc_id", "text", 8, 2, 40)
    val plan = executedPlanString(nd)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"near-dup verify degenerated to a cross join:\n$plan")
    // verified pairs must be a subset of the candidate pairs
    val cands = graft.operators.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val verified = nd.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.subsetOf(cands), "verified pairs not drawn from LSH candidates")
    assert(verified.nonEmpty, "expected at least one verified near-duplicate pair")
  }

  test("as-of join is a window over one union, never an inequality join") {
    import spark.implicits._
    val left = Seq((1L, "k", 10L), (2L, "k", 20L)).toDF("id", "key", "ts")
    val right = Seq((3L, "k", 5L, "v")).toDF("id", "key", "ts", "tag")
    val out = graft.operators.AsOf.asofJoin(left, right, "key", "ts", "id", Seq("tag"))
    val plan = executedPlanString(out)
    assert(plan.contains("Window"), s"carry-forward window missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct")
      && !plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"as-of used a join operator instead of the union+window shape:\n$plan")
  }

  test("rebalanceMix broadcasts the quota relation, windows the corpus once") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.operators.Curation.rebalanceMix(docs, "doc_id", "lang",
      Map("en" -> 0.4, "zh" -> 0.15, "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15))
    val plan = executedPlanString(out)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"quota relation not broadcast:\n$plan")
    val finalPlan = plan.split("== Initial Plan ==")(0)
    assert("Window".r.findAllIn(finalPlan).size >= 1,
      s"per-domain ranking window missing:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"rebalance degenerated:\n$plan")
    // the quota branch must derive from the SAME windowed subtree as
    // the corpus branch (last-row-per-domain selection): one corpus
    // scan, reused exchange — a diverged copy would re-scan the corpus
    assert("FileScan".r.findAllIn(finalPlan).size == 1,
      s"rebalance scans the corpus more than once:\n$finalPlan")
    assert(finalPlan.contains("ReusedExchange"),
      s"quota branch does not reuse the window exchange:\n$finalPlan")
  }

  test("LM perplexity scoring broadcasts count tables and reuses the unigram exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val ref = docs.where(col("doc_id") % 2 === 0)
    val out = graft.operators.LangModel.perplexityScore(docs, "doc_id", "text",
      graft.operators.LangModel.bigramCounts(ref, "doc_id", "text"),
      graft.operators.LangModel.unigramCounts(ref, "doc_id", "text"))
    val plan = executedPlanString(out)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // all three count-table joins hash-broadcast against the doc stream
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).size == 3,
      s"expected 3 broadcast count-table joins:\n$finalPlan")
    assert(!finalPlan.contains("SortMergeJoin"), s"count join degenerated to SMJ:\n$finalPlan")
    // the unigram aggregation's shuffle is computed ONCE and reused by
    // the w2 join and the vocabulary total (2 ReusedExchange consumers)
    assert("ReusedExchange".r.findAllIn(finalPlan).size >= 2,
      s"unigram exchange not shared across w1/w2/total consumers:\n$finalPlan")
    // per-doc mean is map-side combinable
    assert(finalPlan.contains("partial_avg"), s"no partial aggregation:\n$finalPlan")
  }

  test("PQ top-k shuffles bounded aggregates of byte codes, never vectors") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cb = graft.operators.Similarity.trainProductCodebooks(emb, "vec_id", "embedding", 16, 64)
    val out = graft.operators.Similarity.pqTopK(
      emb.where(col("vec_id") < 25), emb, "vec_id", "embedding", 10, cb)
    val plan = executedPlanString(out)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // candidate side: codes projected straight off the scan; the ONLY
    // hash exchange in the plan is the per-query top-k aggregate, and
    // what it shuffles is the O(k) partial buffer — vectors never move
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size == 1,
      s"expected exactly the top-k exchange:\n$finalPlan")
    assert(finalPlan.contains("partial_graft_top_k"),
      s"bounded top-k not partially aggregated map-side:\n$finalPlan")
    // ADC scoring stays in whole-stage codegen (the expressions would
    // otherwise silently fall back to interpreted eval)
    val adcLine = finalPlan.linesIterator.find(_.contains("graft_pq_adc")).getOrElse("")
    assert(adcLine.contains("*("), s"ADC projection outside codegen:\n$adcLine")
    // the query side (lut + norm) rides a broadcast
    assert(finalPlan.contains("BroadcastExchange"), s"query side not broadcast:\n$finalPlan")
  }

  test("reranked serve: shortlist and queries broadcast, the corpus never sort-merge joins") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val coarse = graft.operators.Similarity.trainCentroids(emb, "vec_id", "embedding", 4)
    val cb = graft.operators.Similarity.trainProductCodebooks(emb, "vec_id", "embedding", 8, 16)
    val index = graft.operators.Similarity.pqIndex(emb, "vec_id", "embedding", coarse, cb)
    val out = graft.operators.Similarity.ivfPqTopKReranked(
      emb.where(col("vec_id") < 10), index, emb, "vec_id", "embedding", 5, 32, coarse, 2, cb)
    val finalPlan = executedPlanString(out).split("== Initial Plan ==")(0)
    // the two-stage serve is broadcast end to end: the ADC cell join,
    // the shortlist join-back onto the corpus, and the query join are
    // all hash joins over broadcast sides — a sort-merge join anywhere
    // would mean the corpus (or the index) got shuffled for a
    // serve-batch-sized probe relation
    assert(!finalPlan.contains("SortMergeJoin"), s"corpus shuffled for the rerank:\n$finalPlan")
    assert(!finalPlan.contains("CartesianProduct"), s"unexpected cartesian:\n$finalPlan")
    assert("BroadcastHashJoin".r.findAllIn(finalPlan).size >= 3,
      s"expected cell + shortlist + query broadcast joins:\n$finalPlan")
    // exactly two hash exchanges may exist: the ADC stage's bounded
    // top-k aggregate and the final exact top-k aggregate — both O(k)
    // partial buffers, never vectors
    assert("Exchange hashpartitioning".r.findAllIn(finalPlan).size <= 2,
      s"unexpected shuffle beyond the two top-k aggregates:\n$finalPlan")
    assert(finalPlan.contains("partial_graft_top_k"),
      s"bounded top-k not partially aggregated map-side:\n$finalPlan")
  }

  test("BPE encode and classifier scoring stay inside whole-stage codegen") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = graft.operators.BpeTokenizer.train(docs, "doc_id", "text", 50)
    val bpePlan = executedPlanString(
      docs.select(col("doc_id"), graft.operators.BpeTokenizer.encode(col("text"), merges)))
      .split("== Initial Plan ==")(0)
    val bpeLine = bpePlan.linesIterator.find(_.contains("graft_bpe_encode")).getOrElse("")
    assert(bpeLine.contains("*("), s"BPE encode fell out of codegen:\n$bpeLine")

    val model = graft.operators.QualityClassifier.Model(new Array[Float](64), 0.0)
    val bowPlan = executedPlanString(
      docs.select(col("doc_id"), graft.operators.QualityClassifier.score(col("text"), model)))
      .split("== Initial Plan ==")(0)
    val bowLine = bowPlan.linesIterator.find(_.contains("graft_bow_score")).getOrElse("")
    assert(bowLine.contains("*("), s"classifier scoring fell out of codegen:\n$bowLine")
  }

  test("residual IVF-PQ serve path keeps the additive decomposition out of the probe loop") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val coarse = graft.operators.Similarity.trainCentroids(emb, "vec_id", "embedding", 4)
    val cb = graft.operators.Similarity.trainResidualCodebooks(emb, "vec_id", "embedding", coarse, 16, 64)
    val out = graft.operators.Similarity.ivfPqResidualTopK(
      emb.where(col("vec_id") < 25), emb, "vec_id", "embedding", 10, coarse, 2, cb)
    val plan = executedPlanString(out)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // the residual subtraction is fused into the ingest-side encode —
    // no residual vector column, no per-cell LUT recomputation
    assert(finalPlan.contains("graft_pq_encode_residual"),
      s"residual encode expression missing:\n$finalPlan")
    assert("graft_pq_lut".r.findAllIn(finalPlan).size == 1,
      s"per-query LUT must be computed once, not per cell:\n$finalPlan")
    // probe side scores via ADC + the precomputed qdot scalar; the
    // broadcast query relation is the only place vectors reach the join
    assert(finalPlan.contains("graft_pq_adc"), s"ADC missing from the probe:\n$finalPlan")
    assert(finalPlan.contains("BroadcastExchange"), s"query side not broadcast:\n$finalPlan")
    assert(finalPlan.contains("partial_graft_top_k"),
      s"bounded top-k not partially aggregated map-side:\n$finalPlan")
  }

  test("semantic dedup pairs reuse one cell exchange, never a cross join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = Array(Array.fill(64)(0.1f), Array.fill(64)(-0.1f))
    val pairs = graft.operators.Similarity.semanticDuplicatePairs(
      emb, "vec_id", "embedding", cents, thresholdPct = 30)
    val plan = executedPlanString(pairs)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    // the (id, vec, norm, cell) projection computes once, shuffle-file
    // backed, shared by both self-join sides — the cosineNearDuplicates
    // stance with the k-means cell standing in for the LSH bucket
    assert(finalPlan.contains("ReusedExchange"),
      s"cell exchange not reused across self-join sides:\n$plan")
    assert(!plan.contains("InMemoryRelation"), s"semantic pairs cache:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"semantic pairs degenerated to a cross join:\n$plan")
  }

  test("DSIR scoring is one codegen'd projection; selection a bounded top-k, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val term = Array.tabulate(64)(_.toDouble / 64)
    val scorePlan = executedPlanString(
      graft.operators.Dsir.scoreWith(docs, "doc_id", "text", term))
      .split("== Initial Plan ==")(0)
    // the whole serve path (hash + term lookup + sum) is one native
    // expression inside whole-stage codegen — no per-feature explode,
    // no join, no exchange anywhere in the scoring scan. The score DOES
    // ride a one-element explode (the Generate barrier that keeps the
    // n_feats filter from re-evaluating the scoring expression below
    // the projection — r21), so the pin is: the expression appears
    // EXACTLY ONCE, inside the codegen'd Generate, and nothing explodes
    // per feature.
    val scoreLine = scorePlan.linesIterator.find(_.contains("graft_ngram_score")).getOrElse("")
    assert(scoreLine.contains("*("), s"DSIR scoring fell out of codegen:\n$scoreLine")
    assert(!scorePlan.contains("Exchange"), s"DSIR scoring scan shuffles:\n$scorePlan")
    val scoreEvals = scorePlan.linesIterator.count(_.contains("graft_ngram_score"))
    assert(scoreEvals == 1,
      s"DSIR scoring expression evaluated $scoreEvals times (want exactly 1 — the " +
        s"n_feats filter must not re-evaluate it below the projection):\n$scorePlan")

    val selPlan = executedPlanString(
      graft.operators.Dsir.selectTopKWith(docs, "doc_id", "text", term, 10))
    assert(selPlan.contains("partial_graft_top_k"),
      s"DSIR selection not a map-side-partial bounded top-k:\n$selPlan")
    assert(!selPlan.contains("Window") && !selPlan.contains("row_number"),
      s"DSIR selection sorts the corpus:\n$selPlan")
  }

  test("BM25 broadcasts query terms and corpus stats; ranking is a bounded top-k") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val q = Seq((0L, "spark"), (0L, "query"), (1L, "merge")).toDF("query_id", "term")
    val plan = executedPlanString(graft.operators.Retrieval.bm25(docs, "doc_id", "text", q))
    // the query-term restriction and the 1-row stats row ship TO the
    // corpus-side streams, never the reverse — the corpus relation only
    // ever shuffles post-restriction (matching (doc, term) rows)
    assert(plan.contains("BroadcastHashJoin"), s"query-term restriction not broadcast:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"), s"stats row not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"non-broadcast cross product:\n$plan")
    // the direct path tokenizes the corpus EXACTLY ONCE: tf carries dl
    // denormalized and df is a per-term count window over that same
    // relation — a second Generate would mean a second corpus explode
    // (count only the FINAL plan; AQE prints the initial one after it)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val explodes = finalPlan.linesIterator.count(l =>
      l.contains("Generate explode") && !l.contains("posexplode"))
    assert(explodes == 1, s"corpus tokenized $explodes times (want 1):\n$plan")
    // ... and that window is term-partitioned, never a global sort
    val winLines = finalPlan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty && winLines.forall(_.contains("windowspecdefinition(term")),
      s"df window not partitioned by term:\n${winLines.mkString("\n")}")

    val topk = executedPlanString(
      graft.operators.Retrieval.searchTopK(docs, "doc_id", "text", Seq("spark", "merge"), k = 10))
    assert(topk.contains("partial_graft_top_k"),
      s"BM25 ranking not a map-side-partial bounded top-k:\n$topk")
    assert(!topk.contains("row_number"),
      s"BM25 ranking sorts the match set globally:\n$topk")
  }

  test("indexed BM25 serve is one term-pruned postings scan, no explode, no corpus join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("planshape-bm25-idx").toString
    graft.operators.Retrieval.buildIndex(docs, "doc_id", "text", dir)
    val plan = executedPlanString(
      graft.operators.Retrieval.searchTopKIndexed(spark, dir, "doc_id", Seq("spark", "merge"), k = 10))
    // the term restriction reaches the postings parquet scan (row-group
    // pruning on the build-time term sort does the rest at scale). The
    // postings scan is recognized by its tf column — the scan line's
    // Location path truncates at 100 chars, so the table name in the
    // segmented layout's longer path is not a reliable marker
    val postingsScan = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("tf#")).mkString("\n")
    assert(postingsScan.contains("In(term") || postingsScan.contains("EqualTo(term"),
      s"term restriction not pushed into the postings scan:\n$plan")
    // serve time re-tokenizes nothing and joins no corpus-sized side:
    // the only Generate is the posexplode of the k-row top-k array, and
    // every join is a broadcast
    assert(!plan.contains("split("), s"serve path re-tokenizes:\n$plan")
    val generates = plan.linesIterator.filter(_.contains("Generate")).toSeq
    assert(generates.forall(_.contains("posexplode")),
      s"unexpected corpus-side explode:\n${generates.mkString("\n")}")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"serve path shuffles a join side:\n$plan")
    assert(plan.contains("partial_graft_top_k"),
      s"indexed ranking not a map-side-partial bounded top-k:\n$plan")
  }

  test("segmented + tombstoned BM25 serve keeps term pushdown in EVERY segment scan, joins stay broadcast") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val d0 = java.nio.file.Files.createTempDirectory("planshape-bm25-seg0").toString
    val d1 = java.nio.file.Files.createTempDirectory("planshape-bm25-seg1").toString
    val d2 = java.nio.file.Files.createTempDirectory("planshape-bm25-seg2").toString
    graft.operators.Retrieval.buildIndex(
      docs.where(col("doc_id") % 3 =!= 0), "doc_id", "text", d0)
    graft.operators.Retrieval.updateIndex(spark, d0,
      docs.where(col("doc_id") % 3 === 0), "doc_id", "text", d1)
    graft.operators.Retrieval.deleteFromIndex(spark, d1,
      docs.where(col("doc_id") % 5 === 0 && col("text").isNotNull).select("doc_id"),
      "doc_id", d2)
    val plan = executedPlanString(
      graft.operators.Retrieval.searchTopKIndexed(spark, d2, "doc_id", Seq("spark", "merge"), k = 10))
    // the term restriction reaches BOTH segments' postings scans (and
    // the masked df-correction branch re-reads the same pruned scans):
    // every postings scan line must carry the In(term) pushdown
    val postingsScans = plan.linesIterator.filter(l =>
      l.contains("PushedFilters") && l.contains("tf#")).toSeq
    assert(postingsScans.size >= 2, s"expected per-segment postings scans:\n$plan")
    postingsScans.foreach(l => assert(l.contains("In(term") || l.contains("EqualTo(term"),
      s"term restriction missing from a segment scan:\n$l"))
    // serve never re-tokenizes and never shuffles a join side: the
    // tombstone mask and df joins are broadcast (the mask relation is
    // delta-sized), ranking stays the bounded map-side top-k
    assert(!plan.contains("split("), s"serve path re-tokenizes:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"serve path shuffles a join side:\n$plan")
    assert(plan.contains("partial_graft_top_k"),
      s"indexed ranking not a map-side-partial bounded top-k:\n$plan")
  }

  test("phrase counting is one codegen'd scan, no interpreted gram lambdas") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val plan = executedPlanString(
      graft.operators.Retrieval.phraseHits(docs, "doc_id", "text", "sort merge"))
      .split("== Initial Plan ==")(0)
    val line = plan.linesIterator.find(_.contains("graft_phrase_count")).getOrElse("")
    assert(line.contains("*("), s"phrase count fell out of whole-stage codegen:\n$plan")
    assert(!plan.contains("lambdafunction"), s"interpreted HOF lambda in the scan:\n$plan")
    assert(!plan.contains("Exchange"), s"phrase scan shuffles:\n$plan")
  }

  test("pageRank rounds carry the teleport as a literal, never a per-round broadcast join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the production prep shape: both edge directions, degree joined
    // on, cached and src-partitioned; the loop plan must stream that
    // cache once per round with NO BroadcastNestedLoopJoin (the
    // scalar-n_nodes relation regression this pin guards against)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val degEdges = graft.operators.Centrality.degreeJoinedEdges(pairs, "a", "b")
    try {
      val n = degEdges.select("src").distinct().count()
      val init = degEdges.select(col("src").as("id")).distinct()
        .select(col("id"), lit(1.0 / n).as("r"))
      val plan = executedPlanString(
        graft.operators.Centrality.loopRanks(degEdges, init, 0.15 / n, 0.85, iterations = 3))
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"rank loop re-grew a per-round scalar broadcast join:\n$plan")
      // every round streams the SAME cached edge layout
      val cacheScans = plan.linesIterator.count(_.contains("InMemoryTableScan"))
      assert(cacheScans >= 3, s"loop rounds do not reuse the edge cache ($cacheScans scans):\n$plan")
    } finally degEdges.unpersist()
  }

  test("personalized PageRank pays ONE shuffle aggregation per round, teleport fused") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the r11 regression this pins: a post-aggregation teleport union
    // cost a SECOND groupBy per round (8 shuffle aggregations for 4
    // rounds). The fused form must show exactly one partial/final
    // HashAggregate pair per iteration and no scalar broadcast join.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val degEdges = graft.operators.Centrality.degreeJoinedEdges(pairs, "a", "b")
    try {
      val seedIds = degEdges.select(col("src").as("id")).distinct()
        .where(col("id") <= 2L)
      val iterations = 3
      val ranked = graft.operators.Centrality.personalizedRanks(
        degEdges, seedIds, nSeeds = 2L, damping = 0.85, iterations = iterations)
      val plan = executedPlanString(ranked)
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"personalized loop re-grew a per-round scalar broadcast join:\n$plan")
      // one grouped sum per round in the OPTIMIZED LOGICAL plan — the
      // two-agg regression doubles this count. The logical tree is the
      // right place to count: the physical string under AQE reprints
      // subtrees per query-stage reference, double-counting nodes
      // (seedIds' distinct() is an Aggregate too, but carries no sum
      // and cannot mask a regression)
      val logical = ranked.queryExecution.optimizedPlan.toString
      val rankAggs = logical.linesIterator
        .count(l => l.contains("Aggregate [") && l.contains("sum("))
      assert(rankAggs == iterations,
        s"expected $iterations rank aggregations (one per round), saw $rankAggs:\n$logical")
    } finally degEdges.unpersist()
  }

  test("fuzzy matching joins on deletion keys, never a cartesian product") {
    val part = spark.read.parquet(s"$sf/part.parquet")
    val plan = executedPlanString(graft.operators.FuzzyJoin.nearNamePairs(part, "p_name"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy matching degenerated to all-pairs:\n$plan")
    // the key equality drives a hash join (broadcast or shuffled both fine)
    assert(plan.contains("HashJoin"), s"no hash join on the deletion keys:\n$plan")
  }

  test("histogram and corrExact aggregate partially map-side over a pruned scan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val hist = executedPlanString(
      graft.operators.Stats.histogram(li, "l_quantity", lo = 1, hi = 51, bins = 10))
    assert(hist.contains("partial_count"), s"histogram not map-side partial:\n$hist")
    assert(hist.contains("ReadSchema: struct<l_quantity:double>"),
      s"histogram scan reads more than its one column:\n$hist")
    val corr = executedPlanString(graft.operators.Stats.corrExact(li,
      org.apache.spark.sql.functions.col("l_quantity").cast("long"),
      org.apache.spark.sql.functions.round(org.apache.spark.sql.functions.col("l_discount") * 100, 0).cast("long")))
    assert(corr.contains("partial_sum"), s"corr sufficient statistics not map-side partial:\n$corr")
    assert(!corr.contains("Exchange hashpartitioning"),
      s"global 6-number aggregate should use a single-partition exchange, not a hash shuffle:\n$corr")
  }

  test("the content-audit live relations scan only their narrow columns") {
    import graft.operators.Retrieval
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma"), (3L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-plan-hash").toString
    Retrieval.buildIndex(docs, "doc_id", "text", s"$root/idx")
    // the audit feed must stay a metadata-narrow scan at 100 TB: the
    // doclen read prunes to (id, content_hash) — dl never leaves the
    // parquet footer — and nothing touches postings or text
    val plan = executedPlanString(Retrieval.liveDocHashes(spark, s"$root/idx"))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,content_hash:bigint>"),
      s"liveDocHashes must prune the doclen scan to (id, hash):\n$plan")
    assert(!plan.contains("/postings"),
      s"the audit feed must never scan postings:\n$plan")
  }
}
