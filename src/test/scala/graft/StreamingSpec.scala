package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{lit, when}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.Streams

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedCounts aggregates a stream into tumbling windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Streams.windowedCounts(input.toDF().toDF("ts", "k"), "ts", "1 hour", "2 hours", Seq("k"))
    val query = out.writeStream.format("memory").queryName("wc_out").outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:10:00"), "a"),
        (ts("2024-01-01 00:20:00"), "a"),
        (ts("2024-01-01 01:10:00"), "a"),
        (ts("2024-01-01 00:30:00"), "b")
      )
      query.processAllAvailable()
      val rows = spark.table("wc_out")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "a", 2L),
        ("2024-01-01 01:00:00.0", "a", 1L),
        ("2024-01-01 00:00:00.0", "b", 1L)
      ))
    } finally query.stop()
  }

  test("windowedCmsGrid maintains a probeable sketch per window with bounded cells") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val depth = 4; val width = 64
    val out = Streams.windowedCmsGrid(
      input.toDF().toDF("ts", "tok"), "ts", "tok", "1 hour", "2 hours", depth, width)
    val query = out.writeStream.format("memory").queryName("cms_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:05:00"), "alpha"), (ts("2024-01-01 00:10:00"), "alpha"),
        (ts("2024-01-01 00:15:00"), "alpha"), (ts("2024-01-01 00:20:00"), "beta"),
        (ts("2024-01-01 01:05:00"), "alpha"))
      query.processAllAvailable()
      val grid = spark.table("cms_out")
      // the grid carries BOTH window bounds so grids of mixed window
      // sizes stay distinguishable at a shared sink
      val bounds = grid.select("window_start", "window_end").distinct().collect()
        .map(r => r.getTimestamp(0).toString -> r.getTimestamp(1).toString).toMap
      assert(bounds == Map(
        "2024-01-01 00:00:00.0" -> "2024-01-01 01:00:00.0",
        "2024-01-01 01:00:00.0" -> "2024-01-01 02:00:00.0"))
      // state bound: at most depth*width cells per window, sparse in practice
      val perWindow = grid.groupBy("window_start").count().collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      assert(perWindow.values.forall(_ <= depth.toLong * width))
      // the stream-built grid probes with the batch estimator: CMS never
      // underestimates, and at this tiny load it is exact per window
      // "alpha" appears twice: duplicate query tokens must not inflate
      // the matched-cell count past depth and defeat the zero guard
      val queries = Seq("alpha", "alpha", "beta", "never-seen").toDF("tok")
      val est = graft.operators.HeavyHitters.estimateFromGrid(grid, queries, depth, width)
        .collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("tok")) ->
          r.getAs[Long]("n_est")).toMap
      assert(est(("2024-01-01 00:00:00.0", "alpha")) >= 3L)
      assert(est(("2024-01-01 00:00:00.0", "beta")) >= 1L)
      assert(est(("2024-01-01 01:00:00.0", "alpha")) >= 1L)
      assert(est.getOrElse(("2024-01-01 01:00:00.0", "beta"), 0L) <= 1L,
        "a token absent from a window must report only collision mass")
    } finally query.stop()
  }

  test("dedupExact drops duplicate content within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Streams.dedupExact(input.toDF().toDF("ts", "text"), "ts", "text", "1 hour")
    val query = out.writeStream.format("memory").queryName("dd_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), "alpha doc"),
        (ts("2024-01-01 00:05:00"), "beta doc"),
        (ts("2024-01-01 00:10:00"), "alpha doc") // dup within watermark
      )
      query.processAllAvailable()
      input.addData((ts("2024-01-01 00:20:00"), "alpha doc")) // still within horizon
      query.processAllAvailable()
      val texts = spark.table("dd_out").collect().map(_.getString(1)).toSeq
      assert(texts.sorted == Seq("alpha doc", "beta doc"), s"got $texts")
    } finally query.stop()
  }

  test("dedupNearSignature passes null-text docs through without deduping them") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val df = input.toDF().toDF("ts", "text")
      .select($"ts", when($"text" === "NULL", lit(null: String)).otherwise($"text").as("text"))
    val out = Streams.dedupNearSignature(df, "ts", "text", "1 hour")
    val query = out.writeStream.format("memory").queryName("ddnull_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), "NULL"),
        (ts("2024-01-01 00:05:00"), "NULL"),
        (ts("2024-01-01 00:10:00"), "real doc here"))
      query.processAllAvailable()
      // two distinct null-text events: unknown contents are NOT
      // duplicates — both must survive
      assert(spark.table("ddnull_out").count() == 3)
    } finally query.stop()
  }

  test("psiPerWindow scores each window exactly like a hand-replayed batch PSI") {
    implicit val sqlCtx = spark.sqlContext
    // baseline: values spread over [0, 10); stream: one quiet window
    // near the baseline shape, one shifted window, plus out-of-grid
    // and boundary values that must drop/clamp like the batch operator
    val baseVals = Seq(1, 1, 2, 3, 5, 5, 7, 9)
    val baseline = baseVals.toDF("v")
    val w1 = Seq(1, 2, 5, 9)                  // roughly baseline-shaped
    val w2 = Seq(9, 9, 9, 9, 8, 42, -1)      // shifted; 42 and -1 out of grid
    val w3 = Seq(100, 200, -5)                // ALL out of grid: the monitor
                                              // must still emit (n=0, max PSI)
    val input = MemoryStream[(Timestamp, Int)]
    val out = Streams.psiPerWindow(input.toDF().toDF("ts", "v"), "ts", "v",
      baseline, "v", lo = 0, hi = 10, bins = 5,
      windowDuration = "1 hour", watermark = "1 hour")
    val query = out.writeStream.format("memory").queryName("psi_out")
      .outputMode(OutputMode.Update()).start()
    val got = try {
      input.addData(
        w1.map(v => (ts("2024-01-01 00:10:00"), v)) ++
          w2.map(v => (ts("2024-01-01 01:10:00"), v)) ++
          w3.map(v => (ts("2024-01-01 02:10:00"), v)): _*)
      query.processAllAvailable()
      spark.table("psi_out").collect()
        .map(r => r.getStruct(0).getTimestamp(0).toString -> ((r.getLong(1), r.getDouble(2)))).toMap
    } finally query.stop()

    // hand replay: 5 bins of width 2, Laplace smoothing, in-range only
    def expect(vals: Seq[Int]): (Long, Double) = {
      val in = vals.filter(v => v >= 0 && v < 10)
      val bc = in.groupBy(v => math.min(v / 2, 4)).view.mapValues(_.size.toLong).toMap
      val baseBins = baseVals.groupBy(v => math.min(v / 2, 4)).view.mapValues(_.size.toLong).toMap
      val (nb, nc) = (baseVals.size, in.size)
      val psi = (0 until 5).map { b =>
        val p = (baseBins.getOrElse(b, 0L) + 1).toDouble / (nb + 5)
        val q = (bc.getOrElse(b, 0L) + 1).toDouble / (nc + 5)
        (q - p) * math.log(q / p)
      }.sum
      (in.size.toLong, math.round(psi * 1e6) / 1e6)
    }
    assert(got("2024-01-01 00:00:00.0") == expect(w1), s"w1: $got")
    assert(got("2024-01-01 01:00:00.0") == expect(w2), s"w2: $got")
    // an all-out-of-grid window must still EMIT — n_rows = 0 is the
    // loud signal (under Laplace smoothing an empty window reads as
    // uniform, so the PSI value alone cannot carry the alert); the
    // silent alternative would hide exactly the upstream-corruption
    // case that pushes every value off the grid
    assert(got("2024-01-01 02:00:00.0") == expect(w3), s"w3: $got")
    assert(got("2024-01-01 02:00:00.0")._1 == 0L)
    // the shifted window must read as MORE drifted than the quiet one
    assert(got("2024-01-01 01:00:00.0")._2 > got("2024-01-01 00:00:00.0")._2)
  }

  test("psiPerWindow in Append mode emits one FINAL row per watermark-closed window") {
    implicit val sqlCtx = spark.sqlContext
    val baseline = Seq(1, 3, 5, 7, 9).toDF("v")
    val input = MemoryStream[(Timestamp, Int)]
    val out = Streams.psiPerWindow(input.toDF().toDF("ts", "v"), "ts", "v",
      baseline, "v", lo = 0, hi = 10, bins = 5,
      windowDuration = "1 hour", watermark = "30 minutes")
    val query = out.writeStream.format("memory").queryName("psi_append")
      .outputMode(OutputMode.Append()).start()
    try {
      // two triggers land data in the SAME window: nothing may emit
      // until the watermark closes it
      input.addData((ts("2024-01-01 00:05:00"), 1), (ts("2024-01-01 00:10:00"), 9))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 00:20:00"), 5))
      query.processAllAvailable()
      assert(spark.table("psi_append").isEmpty,
        "append emitted before the watermark closed the window")
      // an event 90 minutes later advances the watermark past 00:00-01:00
      input.addData((ts("2024-01-01 02:00:00"), 3))
      query.processAllAvailable()
      val rows = spark.table("psi_append").collect()
        .map(r => r.getStruct(0).getTimestamp(0).toString -> r.getLong(1))
      // exactly ONE final row for the closed window, counting ALL
      // THREE events across both triggers
      assert(rows.toSeq == Seq("2024-01-01 00:00:00.0" -> 3L), s"got ${rows.toSeq}")
    } finally query.stop()
  }

  test("nearDupAdmission flags stream docs exactly like a batch Hamming scan of the corpus") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{bit_count, col, min, max, when => sqlWhen}
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (101L, "the quick brown fox jumps over the lazy dog"), // same fp, higher id
      (102L, "completely different words about spark engines here")
    ).toDF("doc_id", "text")
    val corpusFps = graft.operators.Dedup.simhash(corpus, "doc_id", "text", bits = 16)

    val incomingRows = Seq(
      (1L, ts("2024-01-01 00:00:00"), "the quick brown fox jumps over the lazy dog"),   // exact copy
      (2L, ts("2024-01-01 00:05:00"), "the quick brown fox jumps over the lazy cat"),   // near copy
      (3L, ts("2024-01-01 00:10:00"), "entirely novel sentences never ingested before today"),
      (4L, ts("2024-01-01 00:15:00"), "NULL")                                           // null text: admitted
    )
    val input = MemoryStream[(Long, Timestamp, String)]
    val incoming = input.toDF().toDF("doc_id", "ts", "text")
      .select($"doc_id", $"ts",
        sqlWhen($"text" === "NULL", lit(null: String)).otherwise($"text").as("text"))
    val out = Streams.nearDupAdmission(incoming, corpusFps,
      "doc_id", "ts", "text", "doc_id", "simhash", watermark = "1 hour")
    val query = out.writeStream.format("memory").queryName("adm_out")
      .outputMode(OutputMode.Update()).start()
    val got = try {
      input.addData(incomingRows: _*)
      query.processAllAvailable()
      spark.table("adm_out").collect()
        .map(r => r.getLong(0) -> (r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    } finally query.stop()

    // batch differential: brute-force every (incoming, corpus) pair —
    // no banding, no join tricks — and reduce the same way
    val incomingDf = incomingRows.toDF("doc_id", "ts", "text")
      .select($"doc_id", $"ts",
        sqlWhen($"text" === "NULL", lit(null: String)).otherwise($"text").as("text"))
    val inFps = graft.operators.Dedup.simhash(incomingDf, "doc_id", "text", bits = 16)
      .select(col("doc_id").as("in_id"), col("simhash").as("in_fp"))
    val hits = inFps.crossJoin(corpusFps.select(col("doc_id").as("c_id"), col("simhash").as("c_fp")))
      .where(bit_count(col("in_fp").bitwiseXOR(col("c_fp"))) <= 2)
      .groupBy("in_id").agg(min("c_id").as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = incomingRows.map { case (id, _, _) =>
      id -> (if (hits.contains(id)) (1, hits(id)) else (0, -1L))
    }.toMap
    assert(got == expected, s"stream $got vs batch $expected")
    // the fixture must actually exercise both verdicts and the min-id
    // tie-break across two fp-identical corpus docs
    assert(got(1L) == ((1, 100L)), s"exact copy not flagged to the min corpus id: $got")
    assert(got(3L)._1 == 0 && got(4L)._1 == 0, s"novel/null docs must be admitted: $got")
  }

  test("annAdmission flags stream vectors exactly like batch semanticDuplicatePairs on the same data") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, when => sqlWhen, size => sqlSize}
    // frozen coarse centroids (the trained-model stance); two cells
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val corpusRows = Seq(
      (100L, Array(0.9f, 0.1f, 0f, 0f)),    // cell 0
      (101L, Array(0.9f, 0.11f, 0f, 0f)),   // cell 0, near-identical to 100
      (102L, Array(0f, 1f, 0f, 0f)))        // cell 1
    // plus a NULL-vector corpus row: it must assign NO cell (the
    // corpus-side mirror of the stream guard) — it can never match,
    // and it must not fan junk candidate rows into any probed cell
    val corpus = (corpusRows.map { case (id, v) => (id, Option(v)) } :+
        ((103L, Option.empty[Array[Float]])))
      .toDF("vec_id", "embedding")
    val incomingRows = Seq(
      (1L, ts("2024-01-01 00:00:00"), Array(0.9f, 0.1f, 0f, 0f)),    // exact copy of 100
      (2L, ts("2024-01-01 00:05:00"), Array(0.88f, 0.12f, 0f, 0f)),  // near copy
      (3L, ts("2024-01-01 00:10:00"), Array(0.05f, 0.04f, 1f, 0f)),  // same cell, low cosine
      (4L, ts("2024-01-01 00:15:00"), Array.empty[Float]),           // sentinel -> null vec
      (5L, ts("2024-01-01 00:20:00"), Array(0f, 0f, 0f, 0f)))        // zero norm: NULL cosine
    val input = MemoryStream[(Long, Timestamp, Array[Float])]
    val incoming = input.toDF().toDF("vec_id", "ts", "embedding")
      .select($"vec_id", $"ts",
        sqlWhen(sqlSize($"embedding") === 0, lit(null).cast("array<float>"))
          .otherwise($"embedding").as("embedding"))
    val out = Streams.annAdmission(incoming, corpus,
      "vec_id", "ts", "embedding", "vec_id", "embedding", cents,
      thresholdPct = 95, watermark = "1 hour")
    val got = try {
      val query = out.writeStream.format("memory").queryName("ann_adm_out")
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(incomingRows: _*)
        query.processAllAvailable()
        spark.table("ann_adm_out").collect()
          .map(r => r.getLong(0) -> (r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      } finally query.stop()
    } finally ()
    // batch differential: the SAME question asked of the batch tier —
    // semanticDuplicatePairs over incoming ∪ corpus, restricted to
    // (incoming, corpus) pairs, reduced the same way
    val allVecs = (incomingRows.map { case (id, _, v) =>
      (id, if (v.isEmpty) null else v) } ++ corpusRows) :+ ((103L, null: Array[Float]))
    val pairs = graft.operators.Similarity.semanticDuplicatePairs(
        allVecs.toDF("vec_id", "embedding"), "vec_id", "embedding", cents, thresholdPct = 95)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter { case (in, c) => in < 100L && c >= 100L }
    val matched = pairs.groupBy(_._1).map { case (in, ps) => in -> ps.map(_._2).min }
    val expected = incomingRows.map { case (id, _, _) =>
      id -> (if (matched.contains(id)) (1, matched(id)) else (0, -1L))
    }.toMap
    assert(got == expected, s"stream $got vs batch $expected")
    // the fixture exercises both verdicts, the min-id tie-break across
    // two above-threshold corpus matches, and the null-vector pass
    assert(got(1L) == ((1, 100L)), s"exact copy not flagged to the min corpus id: $got")
    assert(got(2L)._1 == 1, s"near copy not flagged: $got")
    assert(got(3L)._1 == 0 && got(4L)._1 == 0, s"low-cosine/null vectors must be admitted: $got")
    // zero-norm vector: cosine is NULL (divide by zero) — the verdict
    // must still be the contracted 0, never NULL, matching the batch
    // tier where a NULL cosine survives no threshold filter
    assert(got(5L) == ((0, -1L)), s"zero-norm vector must be admitted with a 0/1 verdict: $got")
  }

  test("DIFFERENTIAL: nearDupAdmission against a PUBLISHED segmented+tombstoned index " +
      "equals the batch Hamming scan of the masked live set, across a republish") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{bit_count, col, min, when => sqlWhen}
    val root = java.nio.file.Files.createTempDirectory("graft-fp-index").toString
    val gen0 = s"$root/gen0"; val gen1 = s"$root/gen1"; val gen2 = s"$root/gen2"
    val corpus0 = Seq(
      (100L, "the quick brown fox jumps over the lazy dog"),
      (102L, "completely different words about spark engines here")
    ).toDF("doc_id", "text")
    graft.operators.Dedup.publishFingerprintIndex(corpus0, "doc_id", "text", bits = 16, gen0)

    def runGate(indexPath: String, rows: Seq[(Long, Timestamp, String)]): Map[Long, (Int, Long)] = {
      val input = MemoryStream[(Long, Timestamp, String)]
      val incoming = input.toDF().toDF("doc_id", "ts", "text")
      val out = Streams.nearDupAdmission(incoming, indexPath,
        "doc_id", "ts", "text", watermark = "1 hour", bits = 16, maxHamming = 2)
      val qn = s"fp_gate_${indexPath.hashCode.abs}"
      val query = out.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(rows: _*)
        query.processAllAvailable()
        spark.table(qn).collect()
          .map(r => r.getLong(0) -> (r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      } finally query.stop()
    }

    def batchVerdicts(
        live: org.apache.spark.sql.DataFrame,
        rows: Seq[(Long, Timestamp, String)]): Map[Long, (Int, Long)] = {
      val inFps = graft.operators.Dedup.simhash(
          rows.toDF("doc_id", "ts", "text"), "doc_id", "text", bits = 16)
        .select(col("doc_id").as("in_id"), col("simhash").as("in_fp"))
      val hits = inFps.crossJoin(live.select(col("doc_id").as("c_id"), col("fp").as("c_fp")))
        .where(bit_count(col("in_fp").bitwiseXOR(col("c_fp"))) <= 2)
        .groupBy("in_id").agg(min("c_id").as("m"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      rows.map { case (id, _, _) =>
        id -> (if (hits.contains(id)) (1, hits(id)) else (0, -1L)) }.toMap
    }

    val phase1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), "the quick brown fox jumps over the lazy dog"),
      (2L, ts("2024-01-01 00:05:00"), "entirely novel sentences never ingested before today"))
    val got1 = runGate(gen0, phase1)
    assert(got1 == batchVerdicts(
      graft.operators.SideIndex.read(spark, gen0, "doc_id", "simhash-16"), phase1),
      s"phase-1 stream verdicts diverged from the batch scan: $got1")
    assert(got1(1L)._1 == 1 && got1(2L)._1 == 0, s"fixture must exercise both verdicts: $got1")

    // REPUBLISH between query runs — the nightly maintenance round:
    // erase doc 100 (tombstone generation), ingest doc 104 (new
    // segment). The restarted gate must see the masked live set:
    // doc 100 stops matching (delete respected), doc 104 starts.
    graft.operators.SideIndex.delete(spark, gen0,
      Seq(100L).toDF("doc_id"), "doc_id", gen1)
    graft.operators.SideIndex.update(spark, gen1,
      graft.operators.Dedup.fingerprintIndexRows(
        Seq((104L, "entirely novel sentences never ingested before today"))
          .toDF("doc_id", "text"), "doc_id", "text", bits = 16),
      "doc_id", gen2)
    val phase2 = Seq(
      (11L, ts("2024-01-01 01:00:00"), "the quick brown fox jumps over the lazy dog"),
      (12L, ts("2024-01-01 01:05:00"), "entirely novel sentences never ingested before today"))
    val got2 = runGate(gen2, phase2)
    val live2 = graft.operators.SideIndex.read(spark, gen2, "doc_id", "simhash-16")
    assert(got2 == batchVerdicts(live2, phase2),
      s"phase-2 stream verdicts diverged from the batch scan of the masked live set: $got2")
    assert(got2(11L)._1 == 0,
      s"a doc whose ONLY match was tombstoned must now be admitted: $got2")
    assert(got2(12L) == ((1, 104L)),
      s"a doc matching the republished increment must be flagged to it: $got2")
    // flavor guard: a gate probing with the wrong fingerprint width
    // must refuse at resolution, not emit wrong verdicts
    val e = intercept[IllegalArgumentException] {
      Streams.nearDupAdmission(
        spark.readStream.format("rate").load()
          .selectExpr("value as doc_id", "timestamp as ts", "'x' as text"),
        gen2, "doc_id", "ts", "text", watermark = "1 hour", bits = 32, maxHamming = 2)
    }
    assert(e.getMessage.contains("simhash-32"), e.getMessage)
  }

  test("DIFFERENTIAL: annAdmission against a PUBLISHED embedding index equals batch " +
      "semanticDuplicatePairs on the masked live set, across a republish") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val cents = Array(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f))
    val root = java.nio.file.Files.createTempDirectory("graft-emb-index").toString
    val gen0 = s"$root/gen0"; val gen1 = s"$root/gen1"; val gen2 = s"$root/gen2"
    graft.operators.Similarity.publishEmbeddingIndex(
      Seq((100L, Array(0.9f, 0.1f, 0f, 0f)), (102L, Array(0f, 1f, 0f, 0f)))
        .toDF("vec_id", "embedding"), "vec_id", "embedding", gen0)

    def runGate(indexPath: String, rows: Seq[(Long, Timestamp, Array[Float])]): Map[Long, (Int, Long)] = {
      val input = MemoryStream[(Long, Timestamp, Array[Float])]
      val incoming = input.toDF().toDF("vec_id", "ts", "embedding")
      val out = Streams.annAdmission(incoming, indexPath,
        "vec_id", "ts", "embedding", cents, thresholdPct = 95, watermark = "1 hour")
      val qn = s"emb_gate_${indexPath.hashCode.abs}"
      val query = out.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Update()).start()
      try {
        input.addData(rows: _*)
        query.processAllAvailable()
        spark.table(qn).collect()
          .map(r => r.getLong(0) -> (r.getInt(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      } finally query.stop()
    }

    def batchVerdicts(
        live: org.apache.spark.sql.DataFrame,
        rows: Seq[(Long, Timestamp, Array[Float])]): Map[Long, (Int, Long)] = {
      val all = rows.map { case (id, _, v) => (id, v) }
        .toDF("vec_id", "embedding")
        .unionByName(live.select(col("vec_id"), col("vec").as("embedding")))
      val pairs = graft.operators.Similarity.semanticDuplicatePairs(
          all, "vec_id", "embedding", cents, thresholdPct = 95)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .flatMap { case (a, b) => Seq((a, b), (b, a)) }
        .filter { case (in, c) => in < 100L && c >= 100L }
      val matched = pairs.groupBy(_._1).map { case (in, ps) => in -> ps.map(_._2).min }
      rows.map { case (id, _, _) =>
        id -> (if (matched.contains(id)) (1, matched(id)) else (0, -1L)) }.toMap
    }

    val phase1 = Seq(
      (1L, ts("2024-01-01 00:00:00"), Array(0.9f, 0.1f, 0f, 0f)),
      (2L, ts("2024-01-01 00:05:00"), Array(0.05f, 0.04f, 1f, 0f)))
    val got1 = runGate(gen0, phase1)
    assert(got1 == batchVerdicts(
      graft.operators.SideIndex.read(spark, gen0, "vec_id", "embedding"), phase1),
      s"phase-1 stream verdicts diverged from the batch pairs: $got1")
    assert(got1(1L) == ((1, 100L)) && got1(2L)._1 == 0, s"fixture must exercise both verdicts: $got1")

    // republish: erase vector 100, re-embed it as a NEW document 104
    // in a different direction — the delete must be respected and the
    // new row must serve from its own segment (LSM sequencing)
    graft.operators.SideIndex.delete(spark, gen0,
      Seq(100L).toDF("vec_id"), "vec_id", gen1)
    graft.operators.SideIndex.update(spark, gen1,
      graft.operators.Similarity.embeddingIndexRows(
        Seq((104L, Array(0.05f, 0.04f, 1f, 0f))).toDF("vec_id", "embedding"),
        "vec_id", "embedding"),
      "vec_id", gen2)
    val phase2 = Seq(
      (11L, ts("2024-01-01 01:00:00"), Array(0.9f, 0.1f, 0f, 0f)),
      (12L, ts("2024-01-01 01:05:00"), Array(0.05f, 0.04f, 1f, 0f)))
    val got2 = runGate(gen2, phase2)
    assert(got2 == batchVerdicts(
      graft.operators.SideIndex.read(spark, gen2, "vec_id", "embedding"), phase2),
      s"phase-2 stream verdicts diverged from the masked live set: $got2")
    assert(got2(11L)._1 == 0,
      s"a vector whose ONLY match was tombstoned must now be admitted: $got2")
    assert(got2(12L)._1 == 1 && got2(12L)._2 == 104L,
      s"a vector matching the republished increment must be flagged to it: $got2")
  }

  test("dedupNearSignature drops signature-equal docs, keeps distinct and short ones") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = Streams.dedupNearSignature(input.toDF().toDF("ts", "text"), "ts", "text", "1 hour")
    val query = out.writeStream.format("memory").queryName("ndd_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), "the quick brown fox jumps over the lazy dog"),
        (ts("2024-01-01 00:05:00"), "the quick brown fox jumps over the lazy dog"), // exact dup
        (ts("2024-01-01 00:10:00"), "completely different words about spark engines here"),
        (ts("2024-01-01 00:15:00"), "tiny"),  // no shingles -> content-fp fallback
        (ts("2024-01-01 00:20:00"), "tiny"),  // dup of the short doc
        (ts("2024-01-01 00:25:00"), "small")  // distinct short doc must survive
      )
      query.processAllAvailable()
      val texts = spark.table("ndd_out").collect().map(_.getString(1)).toSeq.sorted
      assert(texts == Seq(
        "completely different words about spark engines here",
        "small", "the quick brown fox jumps over the lazy dog", "tiny"), s"got $texts")
    } finally query.stop()
  }

  test("quality gate runs unchanged on a stream (batch/stream unification)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // Curation.qualityFilter is a stateless narrow projection, so the
    // exact same operator runs on a streaming DataFrame
    val out = graft.operators.Curation.qualityFilter(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      minTokens = 5, maxBigramRep = 0.5, minAlphaRatio = 0.5)
    val query = out.writeStream.format("memory").queryName("qg_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "a perfectly ordinary clean sentence here"),
        (2L, "no"))
      query.processAllAvailable()
      val rows = spark.table("qg_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(5), r.getString(4))).toMap
      assert(rows(1L) == (1L, null))
      assert(rows(2L) == (0L, "too_short"))
    } finally query.stop()
  }

  test("DIFFERENTIAL: the multilingual gate (quality + langIdNgram) projects identically on a stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    // the multilingual front door is stateless end to end (signals,
    // substring-count scores, argmax), so the SAME composed gate runs
    // on a stream: carryCols keeps the text riding the projection, the
    // language decision lands per micro-batch with no state
    val rows = Seq(
      (1L, "the king stands at the bridge and the thing was singing today"),
      (2L, "der schnelle hund und ein kleines licht in der nacht sich jetzt"),
      (3L, "no"),
      (4L, "spam spam spam spam spam spam spam spam spam spam"))
    def gate(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Curation.qualityFilter(df, "doc_id", "text",
          minTokens = 5, maxBigramRep = 0.3, minAlphaRatio = 0.5,
          carryCols = Seq("text"))
        .withColumn("lang_pred",
          graft.functions.TextFunctions.langIdNgram(col("text")))
        .select("doc_id", "keep", "reject_reason", "lang_pred")
    val batch = gate(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(batch(1L) == ((1L, null, "en")) && batch(2L) == ((1L, null, "de"))
      && batch(3L)._1 == 0L && batch(4L)._2 == "repetitive", s"batch ground truth: $batch")
    val input = MemoryStream[(Long, String)]
    val query = gate(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ml_gate").outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(2): _*)
      query.processAllAvailable()
      input.addData(rows.drop(2): _*) // second micro-batch: no carried state
      query.processAllAvailable()
      val streamed = spark.table("ml_gate").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
      assert(streamed == batch, s"stream diverged from batch: $streamed vs $batch")
    } finally query.stop()
  }

  test("sessionCounts groups a stream into gap-separated sessions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    // session-window streaming aggregation only supports Append: sessions
    // emit once the watermark passes their end
    val out = Streams.sessionCounts(input.toDF().toDF("ts", "k"), "ts", "30 minutes", "1 hour", Seq("k"))
    val query = out.writeStream.format("memory").queryName("sc_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (ts("2024-01-01 00:00:00"), "u"),
        (ts("2024-01-01 00:10:00"), "u"),  // same session
        (ts("2024-01-01 02:00:00"), "u")   // > 30 min gap -> new session
      )
      query.processAllAvailable()
      // advance the watermark far past both sessions so they finalize
      input.addData((ts("2024-01-01 09:00:00"), "u"))
      query.processAllAvailable()
      val rows = spark.table("sc_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(2))).toSet
      assert(rows == Set(("2024-01-01 00:00:00.0", 2L), ("2024-01-01 02:00:00.0", 1L)))
    } finally query.stop()
  }

  test("streaming curation capstone survives a checkpointed stop/restart without dup or loss") {
    // The full continuous-curation chain — quality gate (stateless) ->
    // signature near-dup dedup (watermark state) -> windowed CMS grid
    // (aggregation state) — written to an exactly-once FILE sink with a
    // checkpoint, stopped mid-stream, and restarted. Both stateful
    // operators' state must come back from the checkpoint: a duplicate
    // sent AFTER the restart of a doc seen BEFORE it must still drop
    // (dedup state recovered), and pre-restart docs must still count in
    // the finalized grid (aggregation state recovered). The per-window
    // invariant sum(n | j) == deduped-doc-count for EVERY hash row j
    // catches both duplication (too much mass) and loss (too little)
    // exactly.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-capstone")
    val outPath = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val depth = 4; val width = 64

    val docs = input.toDF().toDF("ts", "doc_id", "text")
    // quality gate with a struct carry: the gate's projection keeps only
    // (idCol, signals), so the carried struct IS the id — the same
    // single-struct-carry idiom as the as-of join
    val gated = graft.operators.Curation.qualityFilter(
        docs.select(org.apache.spark.sql.functions.struct($"ts", $"doc_id", $"text").as("carry"), $"text"),
        "carry", "text", minTokens = 3, maxBigramRep = 0.9, minAlphaRatio = 0.5)
      .where($"keep" === 1)
      .select("carry.*")
    val deduped = Streams.dedupNearSignature(gated, "ts", "text", "1 hour")
    // the watermarked variant: dedupNearSignature already set the
    // watermark, and a multi-stateful-operator query forbids resetting it
    val grid = Streams.windowedCmsGridWatermarked(deduped, "ts", "text", "1 hour", depth, width)

    def start() = grid.writeStream.format("parquet")
      .option("path", outPath).option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Append()).start()

    val q1 = start()
    try {
      input.addData(
        (ts("2024-01-01 00:05:00"), 1L, "the quick brown fox jumps over the lazy dog"),
        (ts("2024-01-01 00:10:00"), 2L, "the quick brown fox jumps over the lazy dog"), // dup pre-restart
        (ts("2024-01-01 00:15:00"), 3L, "completely different words about spark engines here"),
        (ts("2024-01-01 00:20:00"), 4L, "no")) // fails the quality gate
      q1.processAllAvailable()
    } finally q1.stop()

    val q2 = start()
    try {
      input.addData(
        // dup ACROSS the restart: drops only if dedup state was recovered
        (ts("2024-01-01 00:25:00"), 5L, "the quick brown fox jumps over the lazy dog"),
        (ts("2024-01-01 00:30:00"), 6L, "another entirely novel document with plenty of tokens"),
        // watermark advancer: pushes the event-time watermark past the
        // first window's end so its grid finalizes to the sink
        (ts("2024-01-01 03:00:00"), 7L, "late watermark advancing document with many words"))
      q2.processAllAvailable()
    } finally q2.stop()

    val result = spark.read.parquet(outPath)
      .where($"window_start" === ts("2024-01-01 00:00:00"))
    // no duplicate grid cells from sink replay
    assert(result.groupBy("j", "cell").count().where($"count" > 1).isEmpty,
      "duplicate (j, cell) rows — the sink replayed a batch")
    // every hash row's total mass == the 3 deduped quality docs:
    // docs 1, 3 (pre-restart) and 6 (post-restart); 2 and 5 deduped, 4 gated
    val perJ = result.groupBy("j").agg(org.apache.spark.sql.functions.sum("n").as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perJ.keySet == (0 until depth).toSet, s"missing hash rows: $perJ")
    assert(perJ.values.forall(_ == 3L),
      s"expected 3 deduped docs of mass per hash row, got $perJ")
  }

  test("DIFFERENTIAL: streamed windowedCmsGrid equals the batch aggregation on the same rows") {
    // the batch/stream differential oracle: the SAME rows through the
    // MemoryStream path (incrementally, across two micro-batches) and
    // through the identical plan run as a plain batch query must
    // produce the SAME grid, cell for cell — any divergence in hashing,
    // windowing, or incremental merge shows up as a set difference
    implicit val sqlCtx = spark.sqlContext
    val batch1 = Seq(
      (ts("2024-01-01 00:05:00"), "alpha"), (ts("2024-01-01 00:10:00"), "alpha"),
      (ts("2024-01-01 00:20:00"), "beta"), (ts("2024-01-01 00:40:00"), "gamma"),
      (ts("2024-01-01 01:05:00"), "alpha"))
    val batch2 = Seq(
      (ts("2024-01-01 01:15:00"), "beta"), (ts("2024-01-01 01:20:00"), "alpha"),
      (ts("2024-01-01 00:50:00"), "alpha")) // late-but-in-horizon row merges into window 0
    val input = MemoryStream[(Timestamp, String)]
    val out = Streams.windowedCmsGrid(
      input.toDF().toDF("ts", "tok"), "ts", "tok", "1 hour", "2 hours", depth = 4, width = 64)
    // Complete mode: the memory sink holds the final aggregation state,
    // directly comparable to the one-shot batch result
    val query = out.writeStream.format("memory").queryName("cms_diff")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getTimestamp(0).toString, r.getTimestamp(1).toString, r.getInt(2), r.getInt(3), r.getLong(4))
      val streamed = spark.table("cms_diff").collect().map(key).toSet
      val batched = Streams.windowedCmsGrid(
          (batch1 ++ batch2).toDF("ts", "tok"), "ts", "tok", "1 hour", "2 hours", depth = 4, width = 64)
        .collect().map(key).toSet
      assert(streamed == batched,
        s"stream/batch grids diverged:\nonly-stream=${streamed -- batched}\nonly-batch=${batched -- streamed}")
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("DIFFERENTIAL: streamed dedupNearSignature keeps exactly one row per batch signature group") {
    // same rows through the stream and through the batch signature
    // computation: the stream's kept set must contain exactly one
    // representative per distinct batch-side signature (plus every
    // null-text row), and the kept rows' own signatures must be
    // pairwise distinct — signature-dedup equivalence up to
    // representative choice, which batch dropDuplicates leaves
    // unspecified too
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:00:00"), "the quick brown fox jumps over the lazy dog"),
      (ts("2024-01-01 00:05:00"), "the quick brown fox jumps over the lazy dog"),
      (ts("2024-01-01 00:10:00"), "completely different words about spark engines here"),
      (ts("2024-01-01 00:15:00"), "tiny"),
      (ts("2024-01-01 00:20:00"), "tiny"),
      (ts("2024-01-01 00:25:00"), "another corpus entry with its own words"))
    val input = MemoryStream[(Timestamp, String)]
    val out = Streams.dedupNearSignature(input.toDF().toDF("ts", "text"), "ts", "text", "1 hour")
    val query = out.writeStream.format("memory").queryName("ndd_diff")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.take(3): _*)
      query.processAllAvailable()
      input.addData(rows.drop(3): _*)
      query.processAllAvailable()
      // batch-side signature of a text, via the same expression chain
      def sigCol = {
        val sigs = org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.MinHashSignatures(
            org.apache.spark.sql.graftbridge.Bridge.expression(
              org.apache.spark.sql.functions.split($"text", " ")), 8))
        when(org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.split($"text", " ")) < 2,
            org.apache.spark.sql.functions.md5($"text".cast("binary")))
          .otherwise(org.apache.spark.sql.functions.concat_ws("|", sigs.cast("array<string>")))
      }
      val batchSigs = rows.toDF("ts", "text").select(sigCol).collect().map(_.getString(0)).toSet
      val keptSigs = spark.table("ndd_diff").select(sigCol).collect().map(_.getString(0)).toSeq
      assert(keptSigs.distinct.size == keptSigs.size, s"stream kept two rows of one signature: $keptSigs")
      assert(keptSigs.toSet == batchSigs,
        s"kept signatures != batch-distinct signatures:\nkept=$keptSigs\nbatch=$batchSigs")
    } finally query.stop()
  }

  test("DIFFERENTIAL: classifier and LM scoring project identically on streams and batches") {
    // the model-scoring tier is stateless per-row projection, so it
    // must compose with readStream unchanged and produce bit-identical
    // scores to the batch path — the property that lets one trained
    // model serve both the backfill and the live ingest
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts("2024-01-01 00:00:00"), "good clean fluent text here"),
      (ts("2024-01-01 00:05:00"), "spam spam spam buy now"),
      (ts("2024-01-01 00:10:00"), "another ordinary document"))
    val train = Seq((1L, "good clean fluent text here", 1), (2L, "spam spam spam buy now", 0))
      .toDF("doc_id", "text", "label")
    val model = graft.operators.QualityClassifier.train(train, "doc_id", "text", "label", numFeatures = 256)
    val input = MemoryStream[(Timestamp, String)]
    val out = input.toDF().toDF("ts", "text")
      .select($"text", graft.operators.QualityClassifier.score($"text", model).as("p"))
    val query = out.writeStream.format("memory").queryName("clf_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("clf_stream").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val batched = rows.toDF("ts", "text")
        .select($"text", graft.operators.QualityClassifier.score($"text", model).as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(streamed == batched, s"stream scores diverged: $streamed vs $batched")
      assert(streamed("spam spam spam buy now") < 0.5)
      assert(streamed("good clean fluent text here") > 0.5)
    } finally query.stop()
  }

  test("DIFFERENTIAL: BM25 scores a stream against index-time constants, equal to batch") {
    // the search-serving shape: df / N / total-length are frozen at
    // index build; live documents score through the same stateless
    // projection the batch path uses, so backfill and ingest rank
    // identically against the same query
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (0L, "rare common alpha beta"),
      (1L, "common alpha beta gamma delta epsilon zeta"),
      (2L, "common alpha"),
      (3L, "common beta gamma"),
      (4L, "alpha beta gamma delta"))
    val docs = corpus.toDF("doc_id", "text")
    val terms = Seq("rare", "common")
    // index-time constants derived from the SAME corpus the batch ran on
    val idx = graft.operators.Retrieval.invertedIndex(docs, "doc_id", "text")
    val df = idx.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (n, total) = (5L, 20L)
    val q = terms.map(t => (0L, t)).toDF("query_id", "term")
    val batched = graft.operators.Retrieval.bm25(docs, "doc_id", "text", q)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val input = MemoryStream[(Long, String)]
    val out = graft.operators.Retrieval.scoreAgainstQuery(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", terms, df, n, total)
    val query = out.writeStream.format("memory").queryName("bm25_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus: _*)
      query.processAllAvailable()
      val streamed = spark.table("bm25_stream").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(streamed == batched, s"stream scores diverged: $streamed vs $batched")
    } finally query.stop()
  }

  test("DIFFERENTIAL: bm25Score against a PUBLISHED segmented+tombstoned index equals " +
      "the batch scorer on the masked live corpus, across a republish") {
    // the third index-backed gate family: df / N / total-length resolve
    // from the published index THROUGH the handle (tombstone-corrected),
    // not from hand-carried constants — deletes are respected at the
    // next gate restart, re-adds count from their new segment
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-bm25-gate").toString
    val gen0 = s"$root/gen0"; val gen1 = s"$root/gen1"; val gen2 = s"$root/gen2"
    val corpus0 = Seq(
      (100L, "rare common alpha beta"),
      (101L, "common alpha beta gamma delta epsilon zeta"),
      (102L, "common alpha"),
      (103L, "common beta gamma"),
      (104L, "alpha beta gamma delta"))
    graft.operators.Retrieval.buildIndex(
      corpus0.toDF("doc_id", "text"), "doc_id", "text", gen0)
    // duplicate query term: re-scores per occurrence, like the batch path
    val terms = Seq("rare", "common", "common")

    def runStream(indexPath: String, rows: Seq[(Long, String)]): Map[Long, Double] = {
      val input = MemoryStream[(Long, String)]
      val out = Streams.bm25Score(
        input.toDF().toDF("doc_id", "text"), indexPath, "doc_id", "text", terms)
      val qn = s"bm25_gate_${indexPath.hashCode.abs}"
      val query = out.writeStream.format("memory").queryName(qn)
        .outputMode(OutputMode.Append()).start()
      try {
        input.addData(rows: _*)
        query.processAllAvailable()
        spark.table(qn).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      } finally query.stop()
    }
    def batchScores(live: Seq[(Long, String)]): Map[Long, Double] = {
      val q = terms.map(t => (0L, t)).toDF("query_id", "term")
      graft.operators.Retrieval.bm25(live.toDF("doc_id", "text"), "doc_id", "text", q)
        .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    }

    // phase 1: fresh index, live = the whole corpus
    val got1 = runStream(gen0, corpus0)
    assert(got1 == batchScores(corpus0), s"phase-1 diverged: $got1 vs ${batchScores(corpus0)}")
    assert(!got1.contains(104L), "a doc sharing no query term must emit no row")

    // republish: erase doc 100 — the ONLY doc carrying 'rare', so the
    // term's live df reaches 0 and it must stop contributing entirely
    graft.operators.Retrieval.deleteFromIndex(spark, gen0,
      Seq(100L).toDF("doc_id"), "doc_id", gen1)
    val live1 = corpus0.filterNot(_._1 == 100L)
    val got2 = runStream(gen1, live1 :+ (200L, "rare rare rare"))
    assert(got2 == batchScores(live1),
      s"phase-2 diverged from the batch scan of the masked live set: $got2")
    assert(!got2.contains(200L),
      s"a doc matching only a fully-tombstoned term must emit no row: $got2")

    // re-add doc 100 with CHANGED text (delete + update, the LSM
    // re-key) — the restarted gate scores with the new segment's stats
    graft.operators.Retrieval.updateIndex(spark, gen1,
      Seq((100L, "rare rare common alpha")).toDF("doc_id", "text"),
      "doc_id", "text", gen2)
    val live2 = (100L, "rare rare common alpha") +: live1
    val got3 = runStream(gen2, live2)
    assert(got3 == batchScores(live2),
      s"phase-3 diverged after the re-add republish: $got3")
    assert(got3(100L) != got1(100L),
      "the re-keyed doc must score under its NEW text and the new constants")
  }

  test("DIFFERENTIAL: LM perplexity scores a stream against batch-trained count tables") {
    // the CCNet deployment shape: count tables train OFFLINE on the
    // reference corpus (batch), the live ingest scores against them as
    // stream-static joins. Scores must equal the batch path on the
    // same rows.
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat")).toDF("doc_id", "text")
    val bigrams = graft.operators.LangModel.bigramCounts(ref, "doc_id", "text")
    val unigrams = graft.operators.LangModel.unigramCounts(ref, "doc_id", "text")
    val rows = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "zx qv wq jj kx"),
      (12L, "the dog sat on the rug"))
    val input = MemoryStream[(Long, String)]
    val out = graft.operators.LangModel.perplexityScore(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", bigrams, unigrams)
    val query = out.writeStream.format("memory").queryName("lm_stream")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streamed = spark.table("lm_stream").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      val batched = graft.operators.LangModel.perplexityScore(
          rows.toDF("doc_id", "text"), "doc_id", "text", bigrams, unigrams)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(streamed == batched, s"stream LM scores diverged: $streamed vs $batched")
      // gibberish scores strictly worse than in-domain text
      assert(streamed(11L)._2 > streamed(10L)._2)
    } finally query.stop()
  }

  test("sessionizeStream matches the batch sessionize on ordered-per-user arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val out = Streams.sessionizeStream(input.toDS(), gapSeconds = 600L)
    val query = out.toDF("event_id", "user_id", "session_seq").writeStream
      .format("memory").queryName("sess_out").outputMode(OutputMode.Append()).start()
    val base = 1700000000000000L // epoch micros
    // user 1: two events 300 s apart (one session), then +2000 s (new
    // session) in the NEXT batch — state must carry across; user 2
    // stays in one session across the batch boundary
    val batch1 = Seq((1L, 10L, base), (1L, 11L, base + 300L * 1000000L), (2L, 20L, base))
    val batch2 = Seq((1L, 12L, base + 2300L * 1000000L), (2L, 21L, base + 500L * 1000000L))
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val got = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val all = (batch1 ++ batch2).map { case (u, id, us) =>
        (id, u, new java.sql.Timestamp(us / 1000L)) }
      val want = graft.operators.EventAnalytics.sessionize(
        all.toDF("event_id", "user_id", "ts"), "user_id", "ts", "event_id", gapSeconds = 600L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want, s"stream $got != batch $want")
      assert(got.exists(_._3 == 2L), s"the 2300 s gap must open a second session: $got")
    } finally query.stop()
  }

  test("sessionStatsStream emits closed sessions equal to the batch rollup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val out = Streams.sessionStatsStream(input.toDS(), gapSeconds = 600L)
    val query = out.toDF("user_id", "session_seq", "n_events", "duration_us").writeStream
      .format("memory").queryName("sess_stats").outputMode(OutputMode.Append()).start()
    val base = 1700000000000000L // epoch micros
    val m = 1000000L
    // user 1: 3-event session, then a 2000 s gap straddling the BATCH
    // BOUNDARY closes it mid-stream and opens session 2 (which stays
    // open and must NOT emit); user 2's single-event session closes in
    // batch 2 with span 0
    val batch1 = Seq((1L, 10L, base), (1L, 11L, base + 300L * m),
      (1L, 12L, base + 500L * m), (2L, 20L, base))
    val batch2 = Seq((1L, 13L, base + 2500L * m), (2L, 21L, base + 5000L * m))
    try {
      input.addData(batch1: _*)
      query.processAllAvailable()
      input.addData(batch2: _*)
      query.processAllAvailable()
      val got = spark.table("sess_stats").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // the batch rollup over the SAME rows, restricted to closed
      // sessions (every session but each user's running last)
      val all = (batch1 ++ batch2).map { case (u, id, us) =>
        (id, u, new java.sql.Timestamp(us / 1000L)) }
      val batch = graft.operators.EventAnalytics.sessionStats(
        all.toDF("event_id", "user_id", "ts"), "user_id", "ts", "event_id", gapSeconds = 600L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val lastSeq = batch.groupBy(_._1).map { case (u, ss) => u -> ss.map(_._2).max }
      val want = batch.filter { case (u, seq, _, _) => seq != lastSeq(u) }.toSet
      assert(got == want, s"stream $got != closed batch sessions $want")
      assert(got == Set((1L, 1L, 3L, 500L * m), (2L, 1L, 1L, 0L)), s"got $got")
    } finally query.stop()
  }

  test("runningCountPerKey keeps state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = Streams.runningCountPerKey(input.toDS())
    val query = out.toDF("k", "n").writeStream
      .format("memory").queryName("rc_out").outputMode(OutputMode.Update()).start()
    try {
      input.addData("x", "x", "y")
      query.processAllAvailable()
      input.addData("x")
      query.processAllAvailable()
      val last = spark.table("rc_out").collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }
      assert(last == Map("x" -> 3L, "y" -> 1L))
    } finally query.stop()
  }

  private def ingestDocs: Seq[(Long, String)] = Seq(
    (1L, "spark joins data fast"), (2L, "fast spark shuffle"),
    (3L, "slow scans all data"), (4L, "join the spark stream"),
    (5L, "fast fast join"), (6L, "unrelated words entirely"),
    (7L, "spark spark spark"), (8L, "data stream join fast"),
    (9L, "one more spark doc"), (10L, "joins and scans"))

  test("bm25IndexIngest: streamed batches serve identically to a from-scratch build, pointer flips per batch") {
    import graft.operators.{Retrieval, ServePointer}
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    // yesterday's base: docs 1-4; the stream lands 5-7 then 8-10
    Retrieval.buildIndex(all.where($"doc_id" <= 4), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    val input = MemoryStream[(Long, String)]
    val query = Streams.bm25IndexIngest(
      input.toDF().toDF("doc_id", "text"), ptr, s"$root/gen",
      "doc_id", "text", s"$root/ckpt", maxSegments = 8,
      keepGenerations = Some(1))
    try {
      input.addData(ingestDocs.filter(d => d._1 >= 5 && d._1 <= 7): _*)
      query.processAllAvailable()
      val mid = ServePointer.read(spark, ptr)
      assert(mid.contains("/gen/batch-0/"), s"pointer must flip to batch 0's generation: $mid")
      // mid-stream serve: the 7-doc corpus answers like a fresh build
      Retrieval.buildIndex(all.where($"doc_id" <= 7), "doc_id", "text", s"$root/ref7")
      val midGot = Retrieval.searchTopKIndexed(spark, mid, "doc_id", Seq("spark", "join"), 5)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      val midWant = Retrieval.searchTopKIndexed(spark, s"$root/ref7", "doc_id", Seq("spark", "join"), 5)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(midGot == midWant, s"mid-stream serve diverged:\n$midGot\n$midWant")
      input.addData(ingestDocs.filter(_._1 >= 8): _*)
      query.processAllAvailable()
    } finally query.stop()
    val fin = ServePointer.read(spark, ptr)
    assert(fin.contains("/gen/batch-1/"), s"pointer must flip to batch 1's generation: $fin")
    Retrieval.buildIndex(all, "doc_id", "text", s"$root/ref10")
    val got = Retrieval.searchTopKIndexed(spark, fin, "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Retrieval.searchTopKIndexed(spark, s"$root/ref10", "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want, s"final serve diverged:\n$got\n$want")
    // retention kept at most the rollback window + carried generations:
    // the base root must still exist only if something carries it
    val hist = ServePointer.history(spark, ptr)
    assert(hist.nonEmpty, "the ingest must be recording generation history")
  }

  test("ingestIndexBatch: a TORN manifest is crash residue on an unserved root, a loud refusal on the serving one") {
    import graft.operators.{Retrieval, ServePointer}
    val root = java.nio.file.Files.createTempDirectory("graft-torn").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    Retrieval.buildIndex(all.where($"doc_id" <= 4), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    // a crash mid-manifest-write: the manifest DIRECTORY exists but its
    // parquet is unreadable — the exception class differs from the
    // missing-manifest refusal, and the round must still classify it
    // as residue (delete + re-run), not wedge the stream forever
    val tornDir = new java.io.File(s"$root/gen/batch-0/updated/manifest")
    assert(tornDir.mkdirs())
    java.nio.file.Files.writeString(
      tornDir.toPath.resolve("part-00000.parquet"), "not parquet at all")
    Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
      0L, ptr, s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr).contains("/gen/batch-0/"),
      "the torn residue must have been cleaned and the batch committed")
    assert(Retrieval.liveDocIds(spark, ServePointer.read(spark, ptr)).count() == 7L)
    // now tear the SERVING generation's manifest out-of-band: the
    // replay must refuse loudly instead of auto-deleting a root the
    // pointer still names
    val servedManifest = new java.io.File(
      ServePointer.read(spark, ptr).stripPrefix("file:") + "/manifest")
    servedManifest.listFiles().foreach(f => assert(f.delete()))
    java.nio.file.Files.writeString(
      servedManifest.toPath.resolve("part-00000.parquet"), "garbage")
    val e = intercept[IllegalArgumentException] {
      Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
        0L, ptr, s"$root/gen", "doc_id", "text")
    }
    assert(e.getMessage.contains("out-of-band corruption"), e.getMessage)
    assert(new java.io.File(ServePointer.read(spark, ptr).stripPrefix("file:")).exists,
      "the refusal must not have deleted the serving root")
  }

  test("ingestUpsertBatch: replaced docs stop serving when their new text starts; new docs just add") {
    import graft.operators.{Retrieval, ServePointer}
    val root = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    Retrieval.buildIndex(all.where($"doc_id" <= 6), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    // one CDC batch: docs 2 and 5 replaced, docs 7 and 8 brand new
    val upsert = Seq(
      (2L, "replacement text for doc two"), (5L, "spark join replacement"),
      (7L, "spark spark spark"), (8L, "data stream join fast")).toDF("doc_id", "text")
    Retrieval.ingestUpsertBatch(spark, upsert, 0L, ptr, s"$root/gen", "doc_id", "text")
    val served = ServePointer.read(spark, ptr)
    assert(served.contains("/gen/batch-0/"), served)
    // the equivalent corpus, built from scratch: originals 1,3,4,6 +
    // the four upsert rows
    val want = all.where($"doc_id".isin(1L, 3L, 4L, 6L)).unionByName(upsert)
    Retrieval.buildIndex(want, "doc_id", "text", s"$root/ref")
    def top(path: String) = Retrieval.searchTopKIndexed(spark, path, "doc_id",
      Seq("spark", "join", "replacement"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(top(served) == top(s"$root/ref"),
      "upserted index diverged from the from-scratch build of the replaced corpus")
    assert(Retrieval.liveDocIds(spark, served).count() == 8L)
    // exactly-once: the replayed batch heals, never re-applies (a
    // second tombstone round would trip the delete liveness guard)
    Retrieval.ingestUpsertBatch(spark, upsert, 0L, ptr, s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr) == served)
    assert(top(served) == top(s"$root/ref"))
    // duplicate ids in one batch refuse loudly — nothing orders them
    val dup = Seq((9L, "v1"), (9L, "v2")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Retrieval.ingestUpsertBatch(spark, dup, 1L, ptr, s"$root/gen", "doc_id", "text")
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    assert(ServePointer.read(spark, ptr) == served, "a refused batch must not publish")
    // a null-text "current version" looks like a deletion — silently
    // skipping it would leave the stale version serving, so it refuses
    // (and is NOT misdiagnosed as a duplicate)
    val nullText = Seq((2L, null: String), (9L, "fine")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.ingestUpsertBatch(spark, nullText, 1L, ptr, s"$root/gen", "doc_id", "text")
    }
    assert(e2.getMessage.contains("null 'text'") && !e2.getMessage.contains("duplicate"),
      e2.getMessage)
    // a null id names no document: its own refusal, not "duplicate"
    val nullId = Seq((java.lang.Long.valueOf(9L), "v"), (null: java.lang.Long, "w"))
      .toDF("doc_id", "text")
    val e3 = intercept[IllegalArgumentException] {
      Retrieval.ingestUpsertBatch(spark, nullId, 1L, ptr, s"$root/gen", "doc_id", "text")
    }
    assert(e3.getMessage.contains("null 'doc_id'") && !e3.getMessage.contains("duplicate"),
      e3.getMessage)
    assert(ServePointer.read(spark, ptr) == served)
  }

  test("ingestIndexBatch: a replay never deletes a SERVING compacted step whose manifest was torn out-of-band") {
    import graft.operators.{Retrieval, ServePointer}
    val root = java.nio.file.Files.createTempDirectory("graft-torn-compact").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    Retrieval.buildIndex(all.where($"doc_id" <= 4), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    // maxSegments = 1 trips compaction: the batch root commits BOTH an
    // updated step and the compacted step the pointer then serves
    Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
      0L, ptr, s"$root/gen", "doc_id", "text", maxSegments = 1)
    val served = ServePointer.read(spark, ptr)
    assert(served.contains("/gen/batch-0/compacted"), served)
    // tear the SERVING compacted manifest out-of-band: the replay's
    // classifier finds a valid `updated` chain beside unreadable
    // `compacted` residue — the exact shape of a crash between the
    // compaction commit and the flip, EXCEPT the pointer says the
    // compacted step serves. Deleting the "residue" here would destroy
    // the serving root and silently roll the pointer back.
    val servedManifest = new java.io.File(served.stripPrefix("file:") + "/manifest")
    servedManifest.listFiles().foreach(f => assert(f.delete()))
    java.nio.file.Files.writeString(
      servedManifest.toPath.resolve("part-00000.parquet"), "garbage")
    val e = intercept[IllegalArgumentException] {
      Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
        0L, ptr, s"$root/gen", "doc_id", "text", maxSegments = 1)
    }
    assert(e.getMessage.contains("out-of-band corruption"), e.getMessage)
    assert(new java.io.File(served.stripPrefix("file:")).exists,
      "the refusal must not have deleted the serving compacted root")
    assert(ServePointer.read(spark, ptr) == served,
      "the refusal must not have moved the pointer")
  }

  test("ingestIndexBatch: a pointer flip during the round's maintain fences the ingest publish out") {
    import graft.operators.{Retrieval, ServePointer}
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-fence").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    Retrieval.buildIndex(all.where($"doc_id" <= 4), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    // the racing actor: a nightly-style maintenance that flips the
    // pointer onto ITS generation while the ingest round is still
    // maintaining — the zombie-vs-scheduler interleave the fence
    // exists to catch. Injected at the ingest publish's commit point:
    // everything the ingest read (its chain base) is stale by then.
    val night = Retrieval.maintainIndex(spark, s"$root/base",
      deletes = None,
      increment = Some(all.where($"doc_id" === 9)),
      "doc_id", "text", s"$root/night")
    ServePointer.setFenceCheckHook { _ =>
      ServePointer.setFenceCheckHook(_ => ())
      ServePointer.publish(spark, ptr, night, "BM25")
    }
    try {
      val e = intercept[IllegalArgumentException] {
        Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
          0L, ptr, s"$root/gen", "doc_id", "text")
      }
      assert(e.getMessage.contains("lost the pointer fence"), e.getMessage)
    } finally ServePointer.setFenceCheckHook(_ => ())
    // the winner's generation serves; the fenced-out ingest moved
    // nothing (its committed batch root is crash residue the operator
    // must clear before resuming — documented on ingestRound)
    assert(ServePointer.read(spark, ptr).endsWith("/night/updated"))
    assert(Retrieval.liveDocIds(spark, ServePointer.read(spark, ptr)).count() == 5L)
    // and the natural operational response — restarting the stream —
    // must NOT self-undo the winner: the replay finds the committed
    // batch root, sees (via its recorded chain base) that the pointer
    // no longer serves what the batch was built on, and refuses
    // instead of re-flipping the stale chain
    val e2 = intercept[IllegalArgumentException] {
      Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
        0L, ptr, s"$root/gen", "doc_id", "text")
    }
    assert(e2.getMessage.contains("another writer moved the pointer"), e2.getMessage)
    assert(ServePointer.read(spark, ptr).endsWith("/night/updated"),
      "the replay refusal must leave the winner serving")
    // clearing the stale batch root (the documented operator action)
    // lets the stream resume cleanly on the winner's generation
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$root/gen/batch-0"), true))
    Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 5 && $"doc_id" <= 7),
      0L, ptr, s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr).contains("/gen/batch-0/"))
    assert(Retrieval.liveDocIds(spark, ServePointer.read(spark, ptr)).count() == 8L)
  }

  test("ingestIndexBatch: a replay is a NO-OP when the serving generation chains THROUGH the batch") {
    import graft.operators.{Retrieval, ServePointer}
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-chained").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    Retrieval.buildIndex(all.where($"doc_id" <= 4), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    val b0 = all.where($"doc_id" >= 5 && $"doc_id" <= 7)
    Retrieval.ingestIndexBatch(spark, b0, 0L, ptr, s"$root/gen", "doc_id", "text")
    // the stream crashes BEFORE its checkpoint commits; a maintenance
    // round then legitimately chains on top of the batch's generation
    // (the stream is down — no concurrent writers)
    val night = Retrieval.maintainIndex(spark, ServePointer.read(spark, ptr),
      deletes = None, increment = Some(all.where($"doc_id" === 9)),
      "doc_id", "text", s"$root/night")
    ServePointer.publish(spark, ptr, night, "BM25")
    val served = ServePointer.read(spark, ptr)
    // the restart replays batch 0: the serving manifest carries the
    // batch's segments by reference, so its data ALREADY serves — the
    // replay must be a pure no-op, never a pointer regression onto the
    // batch's own step (which would un-serve doc 9) and not a refusal
    Retrieval.ingestIndexBatch(spark, b0, 0L, ptr, s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr) == served,
      "a chained-through replay must not move the pointer")
    assert(Retrieval.liveDocIds(spark, ServePointer.read(spark, ptr)).count() == 8L)
  }

  test("ingestPqUpsertBatch: re-embedded vectors stop serving their old codes; refusals match the shared contract") {
    import graft.operators.{ServePointer, Similarity}
    val root = java.nio.file.Files.createTempDirectory("graft-pq-upsert").toString
    val vecs = (1L to 40L).map(i => (i, Array.tabulate(8)(d => i * 0.1f + d)))
      .toDF("vec_id", "embedding")
    val coarse = Similarity.trainCentroids(vecs, "vec_id", "embedding", 4)
    val cb = Similarity.trainProductCodebooks(vecs, "vec_id", "embedding",
      numSub = 4, nCentroids = 8)
    Similarity.writePqIndex(vecs, "vec_id", "embedding", coarse, cb, s"$root/base")
    val ptr = s"$root/CURRENT"
    ServePointer.publish(spark, ptr, s"$root/base", "IVF-PQ")
    // the CDC batch: ids 1..5 re-embedded (components doubled), three
    // brand-new arrivals — one round, one flip
    val newVec = (i: Long) => Array.tabulate(8)(d => 2f * (i * 0.1f + d))
    val batch = ((1L to 5L).map(i => (i, newVec(i))) ++
      (101L to 103L).map(i => (i, Array.tabulate(8)(d => i * 0.1f + d))))
      .toDF("vec_id", "embedding")
    Similarity.ingestPqUpsertBatch(spark, batch, 0L, ptr, s"$root/gen",
      "vec_id", "embedding", coarse, cb)
    assert(ServePointer.read(spark, ptr).contains("/gen/batch-0/"))
    val served = Similarity.readPqIndex(spark, ServePointer.read(spark, ptr))
    assert(served.count() == 43L, "40 base + 3 arrivals, replaced ids exactly once")
    assert(served.groupBy("neighbor_id").count().where($"count" > 1).count() == 0L,
      "a replaced id must serve exactly one row — the old codes are dead")
    // the served rows for the replaced ids carry the NEW vectors' codes:
    // identical to a direct encode of the new embeddings under the same
    // frozen models (c_norm rides along — exact same arithmetic)
    val want = Similarity.pqIndex(batch.where($"vec_id" <= 5), "vec_id", "embedding",
      coarse, cb)
    val diff = served.where($"neighbor_id" <= 5).as("s")
      .join(want.as("w"), Seq("neighbor_id"))
      .where(!($"s.codes" === $"w.codes") || $"s.c_norm" =!= $"w.c_norm")
    assert(diff.count() == 0L, "replaced ids must serve the re-embedded codes")
    // the shared refusal contract, at this tier
    assert(intercept[IllegalArgumentException] {
      Similarity.ingestPqUpsertBatch(spark,
        Seq((1L, newVec(1L)), (1L, newVec(1L))).toDF("vec_id", "embedding"),
        1L, ptr, s"$root/gen", "vec_id", "embedding", coarse, cb)
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      Similarity.ingestPqUpsertBatch(spark,
        Seq((1L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"),
        1L, ptr, s"$root/gen", "vec_id", "embedding", coarse, cb)
    }.getMessage.contains("null 'embedding'"))
  }

  test("SideIndex.ingestUpsertBatch: refreshed rows replace their live payloads in one generation") {
    import graft.operators.{ServePointer, SideIndex}
    val root = java.nio.file.Files.createTempDirectory("graft-side-upsert-spec").toString
    val rows = (1L to 20L).map(i => (i, i * 10)).toDF("doc_id", "payload")
    SideIndex.build(rows, "doc_id", "t", s"$root/base")
    val ptr = s"$root/CURRENT"
    ServePointer.publish(spark, ptr, s"$root/base", "side(t)")
    val batch = ((1L to 5L).map(i => (i, i * 10 + 1)) ++
      Seq((101L, 7L), (102L, 8L))).toDF("doc_id", "payload")
    SideIndex.ingestUpsertBatch(spark, batch, 0L, ptr, s"$root/gen", "doc_id", "t")
    assert(ServePointer.read(spark, ptr).contains("/gen/batch-0/"))
    val got = SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = ((1L to 5L).map(i => (i, i * 10 + 1)) ++
      (6L to 20L).map(i => (i, i * 10)) ++ Seq((101L, 7L), (102L, 8L)))
      .sortBy(_._1)
    assert(got == want, s"served relation diverged:\n$got\n$want")
    // null ids and duplicate ids refuse (no payload-column check: side
    // rows have no single canonical payload)
    assert(intercept[IllegalArgumentException] {
      SideIndex.ingestUpsertBatch(spark, Seq((1L, 1L), (1L, 2L)).toDF("doc_id", "payload"),
        1L, ptr, s"$root/gen", "doc_id", "t")
    }.getMessage.contains("duplicate"))
    assert(intercept[IllegalArgumentException] {
      SideIndex.ingestUpsertBatch(spark,
        Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(1L)))
          .toDF("doc_id", "payload"),
        1L, ptr, s"$root/gen", "doc_id", "t")
    }.getMessage.contains("null 'doc_id'"))
    // an upsert batch of ONLY brand-new rows degrades to a plain ingest
    // round (no tombstone generation minted)
    SideIndex.ingestUpsertBatch(spark, Seq((201L, 9L)).toDF("doc_id", "payload"),
      1L, ptr, s"$root/gen", "doc_id", "t")
    val inf = SideIndex.info(spark, ServePointer.read(spark, ptr), "t").head()
    assert(inf.getInt(1) == 1,
      s"only batch 0 minted a tombstone generation, got ${inf.getInt(1)}")
    assert(SideIndex.read(spark, ServePointer.read(spark, ptr), "doc_id", "t")
      .count() == 23L)
  }

  test("ingestIndexBatch: committed replay heals the pointer without re-indexing; residue is cleaned") {
    import graft.operators.{Retrieval, ServePointer}
    val root = java.nio.file.Files.createTempDirectory("graft-ingest-replay").toString
    val ptr = s"$root/CURRENT"
    val all = ingestDocs.toDF("doc_id", "text")
    Retrieval.buildIndex(all.where($"doc_id" <= 4), "doc_id", "text", s"$root/base")
    ServePointer.publish(spark, ptr, s"$root/base", "BM25")
    val b0 = all.where($"doc_id" >= 5 && $"doc_id" <= 7)
    Retrieval.ingestIndexBatch(spark, b0, 0L, ptr, s"$root/gen", "doc_id", "text")
    val after = ServePointer.read(spark, ptr)
    val served = Retrieval.searchTopKIndexed(spark, after, "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    // exactly-once: the replayed batch is a pointer heal, NOT a second
    // increment (which the re-submission guard would refuse loudly)
    Retrieval.ingestIndexBatch(spark, b0, 0L, ptr, s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr) == after, "replay must not mint a new generation")
    val served2 = Retrieval.searchTopKIndexed(spark, after, "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served2 == served)
    // a half-written attempt (no manifest) is residue: the re-run
    // clears it and commits cleanly
    val half = new java.io.File(s"$root/gen/batch-1/updated/segments/junk")
    assert(half.mkdirs())
    java.nio.file.Files.writeString(half.toPath.resolve("garbage.txt"), "not an index")
    Retrieval.ingestIndexBatch(spark, all.where($"doc_id" >= 8), 1L, ptr,
      s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr).contains("/gen/batch-1/"))
    assert(!half.exists, "crash residue must have been cleared before the re-run")
    val fin = Retrieval.searchTopKIndexed(spark, ServePointer.read(spark, ptr),
      "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    Retrieval.buildIndex(all, "doc_id", "text", s"$root/ref10")
    val want = Retrieval.searchTopKIndexed(spark, s"$root/ref10", "doc_id", Seq("spark", "join"), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(fin == want, s"post-residue serve diverged:\n$fin\n$want")
    // an EMPTY batch publishes nothing and moves no pointer
    val before = ServePointer.read(spark, ptr)
    Retrieval.ingestIndexBatch(spark, all.where($"doc_id" > 100), 2L, ptr,
      s"$root/gen", "doc_id", "text")
    assert(ServePointer.read(spark, ptr) == before)
    assert(!new java.io.File(s"$root/gen/batch-2").exists)
  }
}
