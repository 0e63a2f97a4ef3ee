package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming tier — beyond the reference, which is
  * batch-only by design ("Not a full watermark/late data engine",
  * reference: src/helpers/timestamped.rs:18-20). Every batch windowed
  * combine in graft has a streaming sibling here: same `window()` /
  * `session_window()` grouping, plus watermarks for state eviction and
  * `mapGroupsWithState` for custom per-key state — the pieces a 100 TB
  * continuous ingest pipeline needs that the reference's
  * timestamp-as-metadata model cannot express.
  */
object Streams {

  /** Tumbling-window counts with a watermark bounding state. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      windowSize: String,
      watermark: String,
      keys: Seq[String]
  ): DataFrame = {
    val groups = window(col(tsCol), windowSize) +: keys.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("n"))
      .select((col("window.start").as("window_start") +: keys.map(col)) :+ col("n"): _*)
  }

  /** Session windows per key with a gap, watermark-bounded. */
  def sessionCounts(
      events: DataFrame,
      tsCol: String,
      gap: String,
      watermark: String,
      keys: Seq[String]
  ): DataFrame = {
    val groups = session_window(col(tsCol), gap) +: keys.map(col)
    events
      .withWatermark(tsCol, watermark)
      .groupBy(groups: _*)
      .agg(count(lit(1)).as("n"))
      .select((col("session_window.start").as("session_start") +: keys.map(col)) :+ col("n"): _*)
  }

  /** Continuously-maintained windowed Count-Min sketch — the streaming
    * sibling of [[graft.operators.HeavyHitters]]: per event-time
    * window, the sparse (j, cell) -> n grid aggregates under a
    * watermark, so live state is bounded by depth x width CELLS per
    * open window REGARDLESS of key cardinality — the fixed-memory
    * shape that survives an unbounded-cardinality stream where exact
    * per-key windowed counts would grow state with |keys|. The grid
    * uses the same hash family as the batch tier, so a sink-persisted
    * grid is probed with [[graft.operators.HeavyHitters
    * .estimateFromGrid]] unchanged, and grids merge by union +
    * re-aggregation (CMS is a sum sketch).
    *
    * COMPATIBILITY NOTE: the output gained a `window_end` column (now
    * window_start, window_end, j, cell, n) so grids of mixed window
    * sizes stay distinguishable at a shared sink. A pre-existing sink
    * consumer reading positionally or with a fixed 4-column schema must
    * be updated; in-repo consumers (estimateFromGrid extraCols) already
    * are.
    */
  def windowedCmsGrid(
      events: DataFrame,
      tsCol: String,
      tokCol: String,
      windowSize: String,
      watermark: String,
      depth: Int = 4,
      width: Int = 2048
  ): DataFrame =
    windowedCmsGridWatermarked(
      events.withWatermark(tsCol, watermark), tsCol, tokCol, windowSize, depth, width)

  /** [[windowedCmsGrid]] for composition AFTER an upstream stateful
    * operator (e.g. [[dedupNearSignature]]): a multi-stateful-operator
    * query forbids redefining the watermark, so this variant aggregates
    * under the watermark the caller already set upstream.
    */
  def windowedCmsGridWatermarked(
      events: DataFrame,
      tsCol: String,
      tokCol: String,
      windowSize: String,
      depth: Int = 4,
      width: Int = 2048
  ): DataFrame =
    events
      .select(col(tsCol),
        graft.operators.HeavyHitters.cellCoords(col(tokCol), depth, width).as("jc"))
      .groupBy(window(col(tsCol), windowSize), col("jc.j").as("j"), col("jc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
      // carry BOTH window bounds: a sink consumer joining grids of mixed
      // window sizes can't distinguish them from the start alone
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("j"), col("cell"), col("n"))

  /** Streaming exact dedup — the continuous-ingest sibling of
    * [[graft.operators.Dedup.exactGroups]]: rows with an already-seen
    * content fingerprint (md5, partition/retry-stable) are dropped.
    * `dropDuplicatesWithinWatermark` bounds the fingerprint state to
    * the watermark horizon, so state stays O(arrival rate x horizon)
    * instead of growing with the full corpus — the only shape that
    * survives an unbounded stream.
    */
  def dedupExact(
      events: DataFrame,
      tsCol: String,
      contentCol: String,
      watermark: String
  ): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .withColumn("fp", md5(col(contentCol).cast("binary")))
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Streaming NEAR-dup dedup — the continuous-ingest sibling of
    * [[graft.operators.Dedup.nearDuplicates]]'s detection side: each
    * doc's full MinHash signature (the same native per-row
    * [[graft.expressions.MinHashSignatures]] expression the batch path
    * uses — a narrow projection, deterministic across retries) becomes
    * the dedup key, so a doc whose signature matches an already-seen
    * doc inside the watermark horizon is dropped. Signature equality is
    * the streaming-tractable near-dup test: it catches exact dups and
    * heavy near-dups (all `numHashes` min-shingles equal) with O(rate x
    * horizon) state; banded LSH (ANY band match) needs a second
    * stateful hop over band buckets plus a per-doc verify join, which
    * is the batch path's job — run it over checkpointed micro-batch
    * output when recall below signature-equality matters. Docs with no
    * 2-shingle (fewer than two tokens) fall back to the exact content
    * fingerprint rather than colliding on an empty signature, and
    * null-text docs BYPASS dedup entirely (the batch siblings filter
    * them out of the dedup relations for the same reason: unknown
    * contents are not duplicates of each other).
    */
  def dedupNearSignature(
      docs: DataFrame,
      tsCol: String,
      textCol: String,
      watermark: String,
      numHashes: Int = 8
  ): DataFrame = {
    val sigs = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.MinHashSignatures(
        org.apache.spark.sql.graftbridge.Bridge.expression(split(col(textCol), " ")),
        numHashes))
    val withWm = docs.withWatermark(tsCol, watermark)
    val deduped = withWm
      .where(col(textCol).isNotNull)
      .withColumn("graft_sig",
        // branch on the CHEAP token count, not size(sigs): size(sigs)
        // in the condition would evaluate the full numHashes-x-shingles
        // hash pass a second time per row (no subexpression elimination
        // across conditional branches) — same stance as the batch
        // path's input-side predicate, Dedup.minhashSignatures. split
        // never yields null tokens, so >= 2 tokens <=> sigs non-empty.
        when(size(split(col(textCol), " ")) < 2, md5(col(textCol).cast("binary")))
          .otherwise(concat_ws("|", sigs.cast("array<string>"))))
      .dropDuplicatesWithinWatermark("graft_sig")
      .drop("graft_sig")
    deduped.unionByName(withWm.where(col(textCol).isNull))
  }

  /** Streaming near-duplicate ADMISSION gate — a stream of incoming
    * documents fingerprint-checked against a STATIC, already-ingested
    * corpus (the ingest-time question "is this new page a copy of
    * something we already hold?", where [[dedupNearSignature]] answers
    * the within-stream question). Each incoming doc's SimHash
    * fingerprint (the batch tier's native
    * [[graft.expressions.SimHashFingerprint]] expression) is sliced
    * into the same maxHamming+1 pigeonhole bands the batch pairing
    * uses ([[graft.operators.Dedup.fingerprintBands]] — shared code,
    * so the two tiers cannot drift), each band slice probes the
    * corpus's banded relation through a stream-static equality join,
    * and candidates are verified with the exact XOR popcount. Banding
    * is EXHAUSTIVE (pigeonhole, not probabilistic), so a missed match
    * is impossible, and the corpus side is a static relation Spark
    * broadcasts or hash-joins per micro-batch with no streaming state
    * of its own.
    *
    * Output: one row per incoming doc — (idCol, tsCol, `is_dup` 0/1,
    * `matched_id` = the smallest matching corpus id or NULL). The
    * per-doc reduction is a streaming aggregation keyed by
    * (doc id, event time); the watermark bounds its state, and in
    * append mode a doc's verdict emits once the watermark passes its
    * event time (update mode emits immediately — the spec's choice).
    * Docs with NULL text carry a NULL fingerprint, match nothing, and
    * pass through admitted — the batch tiers' stance that unknown
    * contents are not duplicates of anything.
    *
    * Scale shape: the stream side is a narrow per-row projection
    * (fingerprint + band explode = maxHamming+1 rows per doc); the
    * corpus relation carries (id, fp, band, bsig) longs only — at
    * 100 TB the corpus FINGERPRINT relation is ~40 bytes x docs, a
    * parquet side table maintained by the batch tier
    * ([[graft.operators.Dedup.simhash]] output), never the corpus
    * text. Within-stream duplicates are deliberately NOT paired here
    * (a micro-batch is not a join boundary for stream-stream
    * self-joins); compose [[dedupNearSignature]] upstream for that.
    */
  def nearDupAdmission(
      incoming: DataFrame,
      corpusFps: DataFrame,
      idCol: String,
      tsCol: String,
      textCol: String,
      corpusIdCol: String,
      corpusFpCol: String,
      watermark: String,
      bits: Int = 16,
      maxHamming: Int = 2
  ): DataFrame = {
    // [1,32], not the band machinery's [1,64]: this gate COMPUTES the
    // stream side's fingerprint with SimHashFingerprint, whose domain
    // is 32 bits — validate at the API boundary rather than letting
    // the expression constructor throw from a deeper layer
    require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")
    require(maxHamming >= 0 && maxHamming < bits,
      s"maxHamming must be in [0, bits), got $maxHamming")
    val corpusBanded = graft.operators.Dedup
      .bandedFingerprintRel(corpusFps, corpusIdCol, corpusFpCol, bits, maxHamming)
      .select(col("sid").as("graft_cid"), col("fp").as("graft_cfp"),
        col("band"), col("bsig"))
    val fpExpr = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.SimHashFingerprint(
        org.apache.spark.sql.graftbridge.Bridge.expression(split(col(textCol), " ")),
        bits))
    val probes = incoming
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        graft.operators.Dedup.maskToDomain(fpExpr, bits).as("graft_fp"))
      // a NULL fingerprint yields NULL band signatures, which match no
      // corpus row in the equi-join — the doc survives to the
      // aggregation as admitted rather than being dropped
      .select(col(idCol), col(tsCol), col("graft_fp"),
        explode(graft.operators.Dedup.fingerprintBands(col("graft_fp"), bits, maxHamming)).as("bb"))
      .select(col(idCol), col(tsCol), col("graft_fp"),
        col("bb.band").as("band"), col("bb.bsig").as("bsig"))
    probes
      .join(corpusBanded, Seq("band", "bsig"), "left_outer")
      .withColumn("graft_hit",
        col("graft_cid").isNotNull &&
          bit_count(col("graft_fp").bitwiseXOR(col("graft_cfp"))) <= maxHamming)
      .groupBy(col(idCol), col(tsCol))
      .agg(
        max(col("graft_hit").cast("int")).as("is_dup"),
        min(when(col("graft_hit"), col("graft_cid"))).as("matched_id"))
  }

  /** [[nearDupAdmission]] served from a PUBLISHED fingerprint side
    * index — the deployment shape: the batch tier maintains the
    * corpus SimHash relation as a segmented + tombstoned
    * [[graft.operators.SideIndex]] (nightly build, daily O(increment)
    * segments, O(delta) delete tombstones), and the admission gate
    * resolves it through the manifest handle at query (re)start. The
    * masked-live read means DELETES ARE RESPECTED: a document whose
    * only match was erased yesterday admits today — the
    * right-to-erasure contract extended to the online gate. The index
    * `flavor` must be `simhash-<bits>` (written by the batch
    * publisher), so a gate probing with the wrong fingerprint width
    * refuses loudly instead of emitting silently-wrong verdicts.
    *
    * Static-side resolution happens ONCE per streaming query start —
    * Structured Streaming pins a static relation's file listing at
    * plan time, so a nightly republish is picked up by the nightly
    * gate restart (or a foreachBatch re-resolution), exactly the
    * cadence the batch tier publishes at. The differential spec
    * proves verdicts equal the batch Hamming scan of the masked live
    * set across a delete + re-add republish between two query runs.
    */
  def nearDupAdmission(
      incoming: DataFrame,
      corpusIndexPath: String,
      idCol: String,
      tsCol: String,
      textCol: String,
      watermark: String,
      bits: Int,
      maxHamming: Int
  ): DataFrame = {
    val spark = incoming.sparkSession
    val fps = graft.operators.SideIndex.read(
      spark, corpusIndexPath, idCol = "doc_id", flavor = s"simhash-$bits")
    nearDupAdmission(incoming, fps, idCol, tsCol, textCol,
      corpusIdCol = "doc_id", corpusFpCol = "fp", watermark, bits, maxHamming)
  }

  /** Streaming SEMANTIC admission gate — [[nearDupAdmission]]'s
    * embedding-tier sibling: a stream of incoming vectors checked
    * against a STATIC, already-embedded corpus for cosine duplicates
    * (the ingest-time question "is this document semantically a copy
    * of something we already hold?"). The coarse centroids are FROZEN
    * and ride the plan as literals (the trained-model stance shared
    * with [[psiPerWindow]]'s baseline and
    * [[graft.operators.Similarity.semanticDuplicatePairsIncremental]]):
    * both sides assign to the same caller-supplied cells, the stream
    * row probes the corpus's cell-keyed relation through ONE
    * stream-static equality join, and every candidate is verified with
    * the exact codegen'd cosine — identical arithmetic to the batch
    * tier, so the two cannot drift. Cell blocking is the SemDeDup
    * within-cluster stance (same-cell pairs only, like the batch
    * operator — not the pigeonhole exhaustiveness of the SimHash
    * gate), so batch and stream agree EXACTLY by construction: the
    * differential spec pins stream output == batch
    * [[graft.operators.Similarity.semanticDuplicatePairs]] restricted
    * to (incoming, corpus) pairs.
    *
    * Output: one row per incoming vector — (idCol, tsCol, `is_dup`
    * 0/1, `matched_id` = smallest matching corpus id or NULL). The
    * per-doc reduction is a streaming aggregation keyed by
    * (id, event time); the watermark bounds its state, and in append
    * mode a verdict emits once the watermark passes its event time.
    * NULL vectors assign no cell, match nothing, and pass through
    * admitted — unknown contents are not duplicates of anything.
    *
    * Scale shape / bounded-state argument: the stream side is a
    * narrow per-row projection (norm + one argmin over K centroid
    * literals — no explode, exactly one probe row per vector); the
    * corpus side carries (id, vec, norm, cell) and is a static
    * relation hash-joined per micro-batch with NO streaming state of
    * its own — at 100 TB it is the parquet side table the batch tier
    * maintains, pre-bucketed by cell so each micro-batch's shuffle
    * prunes to the probed cells. The only stateful operator is the
    * per-(id, ts) verdict aggregation, whose state is one boolean +
    * one long per in-flight doc and is evicted by the watermark —
    * state is bounded by stream rate x watermark horizon, never by
    * corpus size. Within-stream duplicates are deliberately not
    * paired here (same boundary as [[nearDupAdmission]]); compose
    * [[dedupNearSignature]] upstream for that.
    */
  def annAdmission(
      incoming: DataFrame,
      corpus: DataFrame,
      idCol: String,
      tsCol: String,
      vecCol: String,
      corpusIdCol: String,
      corpusVecCol: String,
      cents: Array[Array[Float]],
      thresholdPct: Int,
      watermark: String
  ): DataFrame = {
    require(cents.nonEmpty, "annAdmission: empty centroid set")
    import graft.operators.Similarity.{assignCell, dot, l2Norm}
    // the corpus side gets the SAME null-vector guard as the stream
    // side below: an unguarded assignCell on a NULL vector would land
    // in whatever cell the argmin's null-score struct sort surfaces,
    // and those junk rows would then join every probe in that cell
    // (verdicts stay correct — NULL denom coalesces to false — but
    // the join fans out for nothing). A null cell never matches.
    val corpusCells = corpus.select(
      col(corpusIdCol).as("graft_cid"), col(corpusVecCol).as("graft_cvec"),
      l2Norm(col(corpusVecCol)).as("graft_cnorm"),
      when(col(corpusVecCol).isNull, lit(null))
        .otherwise(assignCell(col(corpusVecCol), cents)).as("cell"))
    val probes = incoming
      .withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol), col(vecCol).as("graft_vec"),
        l2Norm(col(vecCol)).as("graft_norm"),
        // a NULL vector must assign NO cell (join miss -> admitted),
        // not whatever cell the argmin's null-score sort happens to
        // surface — guard explicitly rather than trusting struct-sort
        // null ordering
        when(col(vecCol).isNull, lit(null))
          .otherwise(assignCell(col(vecCol), cents)).as("cell"))
    probes
      .join(corpusCells, Seq("cell"), "left_outer")
      // the cosine must be GUARDED and the predicate NULL-SAFE: a
      // zero-norm vector on either side has no defined cosine — an
      // unguarded divide faults under ANSI and yields NULL under
      // legacy Divide, and a propagated NULL through max() would emit
      // a NULL verdict instead of the contracted 0/1. when(denom > 0)
      // NULLs the cosine (the decontaminateByEmbedding stance, shared
      // with semanticDuplicatePairs so the batch differential holds
      // verbatim) and coalesce(false) admits the row.
      .withColumn("graft_hit", {
        val denom = col("graft_norm") * col("graft_cnorm")
        col("graft_cid").isNotNull &&
          coalesce(
            when(denom > 0,
              dot(col("graft_vec"), col("graft_cvec")) / denom) * 100 >= thresholdPct,
            lit(false))
      })
      .groupBy(col(idCol), col(tsCol))
      .agg(
        max(col("graft_hit").cast("int")).as("is_dup"),
        min(when(col("graft_hit"), col("graft_cid"))).as("matched_id"))
  }

  /** [[annAdmission]] served from a PUBLISHED embedding side index —
    * the semantic twin of the index-backed [[nearDupAdmission]]
    * overload: the batch tier maintains the corpus (id, vector)
    * relation as a segmented + tombstoned
    * [[graft.operators.SideIndex]] (flavor `embedding`), the gate
    * resolves the masked LIVE vectors through the manifest handle at
    * query (re)start, and cells assign on both sides from the same
    * frozen `cents` (the trained-model stance — the quantizer is
    * part of the deployment, not the index). Deletes are respected:
    * an erased corpus vector stops matching at the next gate
    * restart, and a re-embedded one (delete + update) serves its new
    * segment's row under the shared LSM sequencing.
    */
  def annAdmission(
      incoming: DataFrame,
      corpusIndexPath: String,
      idCol: String,
      tsCol: String,
      vecCol: String,
      cents: Array[Array[Float]],
      thresholdPct: Int,
      watermark: String
  ): DataFrame = {
    val spark = incoming.sparkSession
    val vecs = graft.operators.SideIndex.read(
      spark, corpusIndexPath, idCol = "vec_id", flavor = "embedding")
    annAdmission(incoming, vecs, idCol, tsCol, vecCol,
      corpusIdCol = "vec_id", corpusVecCol = "vec", cents, thresholdPct, watermark)
  }

  /** Streaming BM25 scorer served from a PUBLISHED segmented +
    * tombstoned index — the third index-backed gate family, completing
    * the set ([[nearDupAdmission]] lexical-fingerprint,
    * [[annAdmission]] embedding, this one relevance): each incoming
    * document is scored against ONE fixed query whose df / n_docs /
    * total_len constants resolve from the BM25 index at `indexPath`
    * through the manifest handle, with the sequenced tombstone mask
    * applied ([[graft.operators.Retrieval.queryConstants]]) — so an
    * erased document's term statistics stop counting at the next gate
    * restart, and a re-added one's count from its new segment. The
    * scoring itself is [[graft.operators.Retrieval.scoreAgainstQuery]]
    * — a pure codegen'd projection (native token-walk tf, no join, no
    * shuffle, no state), so it composes with any upstream watermark
    * and emits one (idCol, score) row per matching document.
    *
    * Static-side resolution happens ONCE per streaming query start —
    * the constants are plan literals, so a nightly republish is picked
    * up by the nightly gate restart, exactly the cadence the batch
    * tier publishes at (the shared stance of all three gate families).
    * The differential spec pins stream scores equal to the batch
    * scorer over the masked live corpus across a delete + re-add
    * republish.
    */
  def bm25Score(
      incoming: DataFrame,
      indexPath: String,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    val (df, nDocs, totalLen) = graft.operators.Retrieval.queryConstants(
      incoming.sparkSession, indexPath, terms)
    graft.operators.Retrieval.scoreAgainstQuery(
      incoming, idCol, textCol, terms, df, nDocs, totalLen, k1, b)
  }

  /** CONTINUOUS BM25 index ingest — the write-side counterpart of the
    * index-backed gates: each micro-batch of new documents lands as an
    * O(batch) increment generation on the segmented index (compaction
    * policy amortizing the segment debt), and the SERVE POINTER flips
    * to the new generation after each commit, so batch consumers and
    * gate restarts pick up the stream's progress at whatever cadence
    * they re-resolve the pointer. Exactly-once rides on
    * [[graft.operators.Retrieval.ingestIndexBatch]]'s batchId-keyed
    * idempotence under `foreachBatch`'s replay contract: a re-executed
    * batch heals the pointer instead of double-indexing (the
    * re-submission guard would otherwise refuse loudly — corruption is
    * impossible either way). With `keepGenerations` set, every round
    * retains the pointer's history down to the rollback window plus
    * whatever newer generations still carry by reference — the
    * long-running ingest's disk footprint stays bounded by the
    * compaction cadence, not the batch count.
    *
    * The returned query is started; callers own its lifecycle
    * (`processAllAvailable` in tests, `awaitTermination` in a
    * deployment). The pointer must already publish a base generation
    * — build one with [[graft.operators.Retrieval.buildIndex]] (an
    * empty corpus is a valid base) and
    * [[graft.operators.ServePointer.publish]].
    *
    * SINGLE WRITER PER POINTER — this stream (and each of its
    * upsert/vector/side siblings below) is a pointer-lifecycle WRITER:
    * while it runs, nothing else may publish, roll back, vacuum, or
    * retain on `pointerPath` (schedule nightly maintenance on a
    * different pointer, or stop the stream for the window). A
    * violation is DETECTED, not prevented (fencing, not a lock —
    * commit decisions serialize through the epoch's exclusive-create
    * bump, but a later-entering operation's execution can still
    * overlap an earlier one's): every round carries the pointer's
    * fencing epoch across its whole read-maintain-flip span, so a
    * concurrent flip makes the round REFUSE after its batch root
    * committed — the stream stops, and the operator must delete that
    * batch root (and resolve pointer ownership) before resuming,
    * because a foreachBatch replay would otherwise re-flip a chain
    * built from the superseded base.
    */
  def bm25IndexIngest(
      incoming: DataFrame,
      pointerPath: String,
      ingestRoot: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      maxSegments: Int = 8,
      maxMaskedRatio: Double = 0.2,
      keepGenerations: Option[Int] = None,
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Retrieval.ingestIndexBatch(
          batch.sparkSession, batch, batchId, pointerPath, ingestRoot,
          idCol, textCol, maxSegments, maxMaskedRatio, keepGenerations,
          snapshotPath, nightlyMarkerPath)
      }
      .start()

  /** [[bm25IndexIngest]]'s UPSERT form — the CDC-shaped stream where a
    * batch row is "the current version of this document", new or not:
    * already-live ids are tombstoned and re-added in the SAME
    * generation ([[graft.operators.Retrieval.ingestUpsertBatch]] —
    * the LSM delete + re-add update path per micro-batch), so a
    * replaced document's old postings stop serving exactly when its
    * new text starts. Duplicate-id batches refuse loudly (no version
    * column orders them); collapse versions upstream first.
    */
  def bm25UpsertIngest(
      incoming: DataFrame,
      pointerPath: String,
      ingestRoot: String,
      idCol: String,
      textCol: String,
      checkpointDir: String,
      maxSegments: Int = 8,
      maxMaskedRatio: Double = 0.2,
      keepGenerations: Option[Int] = None,
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Retrieval.ingestUpsertBatch(
          batch.sparkSession, batch, batchId, pointerPath, ingestRoot,
          idCol, textCol, maxSegments, maxMaskedRatio, keepGenerations,
          snapshotPath, nightlyMarkerPath)
      }
      .start()

  /** [[bm25IndexIngest]]'s VECTOR-TIER sibling: each micro-batch of
    * new embeddings is PQ-encoded under the FROZEN quantizer models
    * and lands as an O(batch) increment generation on the IVF-PQ
    * index behind the serve pointer — same exactly-once replay story,
    * same optional retention ([[graft.operators.Similarity
    * .ingestPqIndexBatch]]). Retrain-and-rebuild remains the batch
    * tier's job when embedding drift demands new models.
    */
  def pqIndexIngest(
      incoming: DataFrame,
      pointerPath: String,
      ingestRoot: String,
      idCol: String,
      vecCol: String,
      coarseCents: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      checkpointDir: String,
      residual: Boolean = false,
      maxSegments: Int = 8,
      maxMaskedRatio: Double = 0.2,
      keepGenerations: Option[Int] = None,
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.ingestPqIndexBatch(
          batch.sparkSession, batch, batchId, pointerPath, ingestRoot,
          idCol, vecCol, coarseCents, codebooks, residual,
          maxSegments, maxMaskedRatio, keepGenerations, snapshotPath, nightlyMarkerPath)
      }
      .start()

  /** [[pqIndexIngest]]'s UPSERT form — the CDC-shaped vector stream
    * where a batch row is "the current embedding of this id":
    * already-live ids are tombstoned and re-encoded in the SAME
    * generation ([[graft.operators.Similarity.ingestPqUpsertBatch]]),
    * so a re-embedded document's old codes stop serving exactly when
    * its new codes start. Null-id / null-vector / duplicate-id batches
    * refuse loudly (the shared upsert contract).
    */
  def pqUpsertIngest(
      incoming: DataFrame,
      pointerPath: String,
      ingestRoot: String,
      idCol: String,
      vecCol: String,
      coarseCents: Array[Array[Float]],
      codebooks: Array[Array[Array[Float]]],
      checkpointDir: String,
      residual: Boolean = false,
      maxSegments: Int = 8,
      maxMaskedRatio: Double = 0.2,
      keepGenerations: Option[Int] = None,
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.ingestPqUpsertBatch(
          batch.sparkSession, batch, batchId, pointerPath, ingestRoot,
          idCol, vecCol, coarseCents, codebooks, residual,
          maxSegments, maxMaskedRatio, keepGenerations, snapshotPath, nightlyMarkerPath)
      }
      .start()

  /** [[sideIndexIngest]]'s UPSERT form — refreshed side rows replace
    * their live predecessors in the same generation
    * ([[graft.operators.SideIndex.ingestUpsertBatch]]); null-id /
    * duplicate-id batches refuse loudly.
    */
  def sideUpsertIngest(
      incoming: DataFrame,
      pointerPath: String,
      ingestRoot: String,
      idCol: String,
      flavor: String,
      checkpointDir: String,
      maxSegments: Int = 8,
      maxMaskedRatio: Double = 0.2,
      keepGenerations: Option[Int] = None,
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.SideIndex.ingestUpsertBatch(
          batch.sparkSession, batch, batchId, pointerPath, ingestRoot,
          idCol, flavor, maxSegments, maxMaskedRatio, keepGenerations,
          snapshotPath, nightlyMarkerPath)
      }
      .start()

  /** [[bm25IndexIngest]]'s SIDE-TABLE sibling: each micro-batch of
    * new (id, payload) side rows lands as an O(batch) increment
    * generation behind the serve pointer
    * ([[graft.operators.SideIndex.ingestBatch]]) — the continuously-
    * fed admission table the index-backed gates read at restart.
    */
  def sideIndexIngest(
      incoming: DataFrame,
      pointerPath: String,
      ingestRoot: String,
      idCol: String,
      flavor: String,
      checkpointDir: String,
      maxSegments: Int = 8,
      maxMaskedRatio: Double = 0.2,
      keepGenerations: Option[Int] = None,
      snapshotPath: Option[String] = None,
      nightlyMarkerPath: Option[String] = None
  ): org.apache.spark.sql.streaming.StreamingQuery =
    incoming.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.SideIndex.ingestBatch(
          batch.sparkSession, batch, batchId, pointerPath, ingestRoot,
          idCol, flavor, maxSegments, maxMaskedRatio, keepGenerations,
          snapshotPath, nightlyMarkerPath)
      }
      .start()

  /** Online drift monitor — the streaming sibling of
    * [[graft.operators.Stats.populationStability]]: each event-time
    * tumbling window's value distribution is scored against a STATIC
    * baseline snapshot with the same fixed-grid / Laplace-smoothed PSI
    * arithmetic, emitting one (window, n, psi) row per closed window —
    * the alert feed a continuous ingest pipeline watches for "today's
    * crawl stopped looking like the corpus". The baseline histogram is
    * bins-row tiny, so it collects once at plan build (the
    * trained-model stance: a bounded driver-side fit, scoring stays
    * distributed) and rides the plan as literals; the stream pays ONE
    * stateful aggregation per window (the per-bin counts pivoted into
    * `bins` conditional sums — a second chained aggregation for totals
    * would be a second stateful operator), and the PSI fold over the
    * bin columns is pure per-row arithmetic after it. Out-of-grid and
    * null values are excluded from the counts on both sides —
    * mirroring the batch operator's in-range contract — but by
    * CONDITIONAL aggregation, not a pre-filter: a window whose events
    * are ALL out-of-grid still emits a row instead of going silent
    * exactly when the data is most corrupted — n_rows = 0 IS the
    * alert there (under Laplace smoothing an empty window reads as
    * uniform, so the PSI value alone cannot carry it; alert on
    * psi OR n_rows). Every grid bin participates in the sum (the
    * both-empty-bin term matters whenever the window's count differs
    * from the baseline's — same fix as the batch operator), and the
    * value column must be integral on both sides (the batch siblings'
    * fixed-point bit-reproducibility contract, same loud refusal).
    *
    * Output: (window struct, n_rows, psi) — n_rows counts IN-RANGE
    * events, psi rounded to 6 places; conventional alert bands:
    * < 0.1 quiet, 0.1-0.25 drifting, > 0.25 shifted. One FINAL row per
    * window requires Append output mode (emission once the watermark
    * closes the window); Update mode emits an evolving partial row per
    * trigger — fine for a live dashboard, wrong for a fire-once
    * alerter.
    */
  def psiPerWindow(
      events: DataFrame,
      tsCol: String,
      valueCol: String,
      baseline: DataFrame,
      baselineValueCol: String,
      lo: Double,
      hi: Double,
      bins: Int,
      windowDuration: String,
      watermark: String
  ): DataFrame = {
    require(bins >= 1 && hi > lo, s"bad grid [$lo, $hi) / $bins")
    graft.operators.Stats.requireIntegral(events, "psiPerWindow", col(valueCol))
    graft.operators.Stats.requireIntegral(baseline, "psiPerWindow", col(baselineValueCol))
    // bounded collect: the baseline histogram is <= bins rows
    val baseCounts = graft.operators.Stats
      .histogram(baseline, baselineValueCol, lo, hi, bins)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nBase = baseCounts.values.sum
    val pDen = (nBase + bins).toDouble
    // the batch siblings' shared grid expressions — bin-identical by
    // construction; inRange is never null, so it guards the
    // conditional sums safely
    val inRange = graft.operators.Stats.inRangeExpr(col(valueCol), lo, hi)
    val binCol = graft.operators.Stats.binExpr(col(valueCol), lo, hi, bins)
    val counted = events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration))
      .agg(
        sum(inRange.cast("long")).as("n_rows"),
        (0 until bins).map(b =>
          sum((inRange && binCol === b).cast("long")).as(s"graft_n_$b")): _*)
    val qDen = (col("n_rows") + bins).cast("double")
    val terms = (0 until bins).map { b =>
      val p = lit((baseCounts.getOrElse(b, 0L) + 1).toDouble / pDen)
      val q = (col(s"graft_n_$b") + 1).cast("double") / qDen
      (q - p) * log(q / p)
    }
    counted.select(col("window"), col("n_rows"),
      round(terms.reduce(_ + _), 6).as("psi"))
  }

  /** Per-event gap sessionization on a STREAM — the continuous sibling
    * of [[graft.operators.EventAnalytics.sessionize]]: every event
    * gets its user's session SEQUENCE NUMBER, a new session opening
    * when the gap to the user's previous event exceeds `gapSeconds`.
    * State per user is two longs (last event-time micros, session
    * count) via `flatMapGroupsWithState` — two longs per user EVER
    * OBSERVED: there is deliberately no state timeout, because
    * evicting a quiet user would reset their session numbering and
    * break parity with the batch operator. Size the state store for
    * the all-time user cardinality, not the live set.
    *
    * Within each micro-batch a user's events sort by (event-time, id)
    * before sequencing, so intra-batch disorder is harmless. ACROSS
    * batches the assignment equals the batch operator's exactly when
    * each user's events arrive in event-time order (the
    * partitioned-by-user ingest deployment); an event arriving OLDER
    * than its user's last processed time sequences against that later
    * time instead of its true predecessor — an inherent limit of
    * forward-only state (the batch operator, or
    * [[sessionCounts]]' session_window aggregate, owns the unordered
    * regime). Differential-tested against the batch sessionize.
    * Input: (userId, eventId, eventTimeUs). Output:
    * (eventId, userId, sessionSeq).
    */
  def sessionizeStream(
      events: Dataset[(Long, Long, Long)],
      gapSeconds: Long
  ): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[(Long, Long, Long)], state: GroupState[(Long, Long)]) =>
          var (lastUs, seq) = state.getOption.getOrElse((Long.MinValue, 0L))
          val out = evs.toSeq.sortBy(e => (e._3, e._2)).map { case (_, id, us) =>
            if (lastUs == Long.MinValue || us - lastUs > gapSeconds * 1000000L) seq += 1
            lastUs = us
            (id, user, seq)
          }
          state.update((lastUs, seq))
          out.iterator
      }
  }

  /** Per-session COUNT and SPAN on a stream, emitted when a session
    * CLOSES — the continuous sibling of
    * [[graft.operators.EventAnalytics.sessionStats]]: a session closes
    * the moment a later event of the same user opens the next one
    * (gap > `gapSeconds`), and exactly then its final (n_events,
    * duration_us) row emits. The still-open session emits NOTHING —
    * its stats are not final, and there is deliberately no timeout
    * flush: an eviction-driven emit would publish a session that a
    * late-but-in-order event could still extend, breaking the
    * closed-means-final contract ([[sessionizeStream]]'s no-timeout
    * stance; state per user is four longs: session start, last event
    * time, session seq, event count — size the store for all-time
    * users).
    *
    * Differential contract vs the batch rollup, on per-user
    * event-time-ordered arrival: the emitted rows equal batch
    * [[graft.operators.EventAnalytics.sessionStats]] RESTRICTED to
    * closed sessions — every session but each user's last.
    * Input: (userId, eventId, eventTimeUs).
    * Output: (userId, sessionSeq, nEvents, durationUs).
    */
  def sessionStatsStream(
      events: Dataset[(Long, Long, Long)],
      gapSeconds: Long
  ): Dataset[(Long, Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long), (Long, Long, Long, Long)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (user: Long, evs: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long, Long, Long)]) =>
          var (startUs, lastUs, seq, n) =
            state.getOption.getOrElse((0L, Long.MinValue, 0L, 0L))
          val closed = Seq.newBuilder[(Long, Long, Long, Long)]
          evs.toSeq.sortBy(e => (e._3, e._2)).foreach { case (_, _, us) =>
            if (lastUs == Long.MinValue) { seq = 1L; startUs = us; n = 1L }
            else if (us - lastUs > gapSeconds * 1000000L) {
              closed += ((user, seq, n, lastUs - startUs))
              seq += 1L; startUs = us; n = 1L
            } else n += 1L
            lastUs = us
          }
          state.update((startUs, lastUs, seq, n))
          closed.result().iterator
      }
  }

  /** Custom per-key running state via mapGroupsWithState — the
    * streaming analog of the reference's CombineFn accumulators with
    * explicit state lifetime.
    */
  def runningCountPerKey[K: Encoder](ds: Dataset[K])(implicit
      pair: Encoder[(K, Long)]
  ): Dataset[(K, Long)] = {
    implicit val stateEnc: Encoder[Long] = org.apache.spark.sql.Encoders.scalaLong
    ds.groupByKey(identity)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (k: K, it: Iterator[K], state: GroupState[Long]) =>
          val c = state.getOption.getOrElse(0L) + it.size
          state.update(c)
          (k, c)
      }
  }
}
