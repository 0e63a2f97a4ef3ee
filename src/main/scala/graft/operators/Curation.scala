package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-curation operators: the selection layer a training-data
  * pipeline runs after dedup ([[Dedup]]) and scoring
  * ([[graft.functions.TextFunctions]]) — quality gating with per-rule
  * reject reasons, token-budget subsampling, and domain-mix
  * rebalancing. All plans are distributed-by-construction: per-row
  * projections, hash aggregates, windows partitioned by stratum, and
  * broadcast joins for the (tiny) per-domain quota relations; nothing
  * collects to the driver.
  *
  * Selection is everywhere deterministic via content-hash (md5)
  * priorities — the reference's rank_from_value stance
  * (reference: src/combiners/sampling.rs:69-188) — so a retried or
  * repartitioned run selects the same corpus.
  */
object Curation {

  /** Quality gate with reasons: evaluates the cheap per-row text
    * signals and emits keep=1/0 plus the FIRST failing rule name
    * (length -> repetition -> symbol-soup, mirroring how production
    * quality stacks report the dominant defect). A narrow projection —
    * at 100 TB this is a single pass over corpus bytes, and the
    * `keep` column composes with partition-pruned writes for the
    * kept/rejected split. `carryCols` ride the signal projection so a
    * downstream stage that still needs them (the text for language ID,
    * a domain column for budget cuts) composes without a join back to
    * the corpus — a second scan of the text column is the expensive
    * part of the whole gate at scale.
    */
  def qualityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minTokens: Int = 5,
      maxBigramRep: Double = 0.2,
      minAlphaRatio: Double = 0.8,
      carryCols: Seq[String] = Nil
  ): DataFrame = {
    val txt = col(textCol)
    // a carried column that collides with the gate's own outputs would
    // be silently overwritten (keep/reject_reason) or turn ambiguous
    // (id/signals) — refuse at the API boundary instead
    val reserved = idCol +: Seq("n_tokens", "bigram_rep", "alpha_ratio", "reject_reason", "keep",
      "__graft_q")
    require(carryCols.intersect(reserved).isEmpty,
      s"qualityFilter carryCols ${carryCols.intersect(reserved).mkString(", ")} collide with gate output columns")
    // carryCols ride the signal projection so a downstream stage that
    // needs the text (language ID, budget cut) composes WITHOUT a
    // join back to the corpus — at 100 TB a second text scan is the
    // expensive part of the whole gate.
    //
    // The signals are emitted THROUGH a one-element explode (a Generate
    // barrier), not as plain projection aliases: every caller filters on
    // `keep`, and Catalyst's predicate pushdown substitutes projection
    // aliases into the pushed Filter with no cost guard — with plain
    // aliases the keep CASE re-evaluates every signal (and, when the
    // caller's text column is itself an expensive alias like
    // extractText, the WHOLE upstream chain: measured 7 evaluations of
    // the 12-regexp extraction per row on the html capstone) below the
    // projection. A predicate on a generator output cannot push below
    // the Generate, so the signals are computed exactly once per row;
    // the explode of a single-element array keeps row count and order
    // semantics untouched for ~an array allocation per row.
    val qStruct = explode(array(struct(
      TextFunctions.tokenCount(txt).as("n_tokens"),
      TextFunctions.bigramRepetitionRatio(txt).as("bigram_rep"),
      TextFunctions.alphaRatio(txt).as("alpha_ratio"))))
    val out = docs
      .select(col(idCol) +: carryCols.map(col) :+ qStruct.as("__graft_q"): _*)
      .select(
        col(idCol) +: carryCols.map(col) ++: Seq(
          col("__graft_q.n_tokens").as("n_tokens"),
          col("__graft_q.bigram_rep").as("bigram_rep"),
          col("__graft_q.alpha_ratio").as("alpha_ratio")): _*)
    out.select(
      out.columns.toIndexedSeq.map(col) :+
        // null text first: every signal is NULL for it, so the later
        // when() predicates all evaluate to null (not true) and a null
        // document would otherwise sail through the gate with keep=1
        when(col("n_tokens").isNull, lit("null_text"))
          .when(col("n_tokens") < minTokens, lit("too_short"))
          .when(col("bigram_rep") > maxBigramRep, lit("repetitive"))
          .when(col("alpha_ratio") < minAlphaRatio, lit("symbol_soup"))
          .as("reject_reason"): _*)
      .withColumn("keep", col("reject_reason").isNull.cast("bigint"))
  }

  /** CCNet-style language-model quality gate: train a stupid-backoff
    * bigram LM on `refDocs` (typically the heuristic-quality KEEP split
    * of the same corpus, or an external clean reference), score every
    * doc's log2-perplexity against it, and keep docs at or under
    * `maxLog2Ppl` (perplexity <= 2^maxLog2Ppl). This is the composition
    * a real training-data pipeline runs after the cheap per-row
    * signals: heuristics catch structural junk, the LM catches fluent-
    * looking gibberish the heuristics pass. Output: the gated docs'
    * (id, n_bigrams, log2_ppl) — join back on id for the full rows.
    *
    * Scale shape inherits [[LangModel.perplexityScore]]'s: two
    * map-side-combinable count aggregations whose state grows with
    * vocabulary (not corpus), then a scoring join Catalyst broadcasts
    * when the tables are small. Docs with no bigram (null/one-token
    * text) have no perplexity evidence and are NOT kept — the
    * heuristic gate owns the too-short signal, and a gate that
    * defaulted them to keep would wave through exactly the rows the
    * model cannot vouch for.
    */
  def lmGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      refDocs: DataFrame,
      maxLog2Ppl: Double
  ): DataFrame = {
    // the reference split feeds BOTH count aggregations (bigram and
    // unigram tables key differently, so no exchange can be shared) —
    // materialize it once instead of running its lineage twice; when
    // refDocs carries an expensive derivation (the keep split's
    // repetition signal), the second run costs more than the cache
    // (measured: 1.94 s -> 1.63 s at sf0.1). Same spill-safe level the
    // pipeline stages use; at corpus scale the deployment shape is
    // writing the keep split to storage and passing the read back in.
    val ref = refDocs.select(col(idCol), col(textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    LangModel.perplexityScore(docs, idCol, textCol,
        LangModel.bigramCounts(ref, idCol, textCol),
        LangModel.unigramCounts(ref, idCol, textCol))
      .where(col("log2_ppl") <= maxLog2Ppl)
  }

  /** Deterministic token-budget subsample per stratum: within each
    * stratum (language, source, ...), order docs by content-hash
    * priority and keep them while the running token count stays within
    * `budgetTokens`. The window is partitioned by stratum, so each
    * stratum sorts independently — the right shape when strata are
    * plentiful (the curation norm); a single giant stratum serializes
    * its own sort by construction, because a sequential budget IS a
    * sequential scan semantically.
    *
    * `countOf` chooses the budget's denomination: the default is the
    * cheap whitespace count; pass
    * `BpeTokenizer.tokenCount(_, merges)` to budget in LEARNED model
    * tokens — the unit context windows are actually measured in.
    */
  def tokenBudgetSample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      budgetTokens: Long,
      countOf: Column => Column = TextFunctions.tokenCount
  ): DataFrame = {
    val byPriority = Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    docs
      // a null-text doc has NULL token count: it must not be selected
      // into a budget while charging nothing against it
      .where(col(textCol).isNotNull)
      .select(col(idCol), col(strataCol), countOf(col(textCol)).as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(byPriority))
      .where(col("cum_tokens") <= budgetTokens)
  }

  /** GPT-style sequence packing: lay the corpus out as ONE contiguous
    * token stream per stratum (deterministic content-hash order) and
    * cut it every `contextTokens` — the standard way training data
    * becomes fixed-length rows, with documents straddling context
    * boundaries rather than padding them. Emits, per document, its
    * stream position and the context windows it lands in:
    * (id, stratum, n_tokens, start_token, bin_id, n_bins); a doc
    * spans bins bin_id .. bin_id + n_bins - 1, and its offset within
    * the first bin is start_token mod contextTokens. Downstream, an
    * `explode(sequence(bin_id, bin_id+n_bins-1))` + groupBy(bin)
    * materializes per-window example manifests.
    *
    * One cumulative-sum window partitioned by stratum — no shuffle
    * beyond it, O(1) state per row, and the same caveat as
    * [[tokenBudgetSample]]: a single giant stratum serializes its own
    * prefix sum, because a sequential layout IS sequential
    * semantically; strata (language, source) are the parallelism unit.
    * `countOf` picks the token denomination, as in
    * [[tokenBudgetSample]] — BPE-denominated packing lays the stream
    * out in the same units the model's context window counts.
    */
  def packSequences(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      contextTokens: Int,
      countOf: Column => Column = TextFunctions.tokenCount
  ): DataFrame = {
    val byPriority = Window
      .partitionBy(strataCol)
      .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))
    docs
      .select(col(idCol), col(strataCol), countOf(col(textCol)).as("n_tokens"))
      .withColumn("start_token", sum("n_tokens").over(byPriority) - col("n_tokens"))
      // integer division (DIV), not floor(double/): exact at any
      // corpus size, where double division degrades past 2^53 tokens
      .withColumn("bin_id", expr(s"start_token DIV $contextTokens"))
      .withColumn("n_bins",
        expr(s"(start_token + n_tokens - 1) DIV $contextTokens") - col("bin_id") + 1)
  }

  /** Per-context-window example manifest from [[packSequences]] output:
    * one row per (bin, document) telling the loader exactly which token
    * slice of which document fills which offsets of which training
    * example — the materialization the doc comment on packSequences
    * used to leave to the reader. For each doc spanning bins
    * `bin_id .. bin_id + n_bins - 1`:
    * `offset_in_bin` = where the doc's slice starts inside that bin,
    * `len_in_bin` = how many of its tokens land there (token slices
    * partition the doc: sum(len_in_bin) over a doc's rows = n_tokens).
    *
    * Shape: one `explode(sequence(...))` per doc — row growth is
    * bounded by ceil(n_tokens/contextTokens)+1 per doc, i.e. linear in
    * corpus tokens — followed by pure per-row arithmetic. No window, no
    * join, no aggregation: composes onto packSequences' single
    * stratum-partitioned prefix-sum shuffle unchanged.
    */
  def packManifest(packed: DataFrame, contextTokens: Int): DataFrame = {
    val c = lit(contextTokens.toLong)
    val binStart = col("bin_id") * c
    val docEnd = col("start_token") + col("n_tokens")
    packed
      // defensive: sequence(lo, lo + n - 1) with n = 0 defaults to step
      // -1 and emits a bogus descending 2-element sequence instead of
      // the empty list the oracle's generate_series returns. n_bins = 0
      // is unreachable from packSequences (tokenCount >= 1 for non-null
      // text; null text nulls the sequence and the explode drops the
      // row), but a hand-built input must not diverge silently.
      .where(col("n_bins") >= 1)
      .withColumn("bin_id", explode(sequence(col("bin_id"), col("bin_id") + col("n_bins") - 1)))
      .withColumn("offset_in_bin", greatest(col("start_token") - binStart, lit(0L)))
      .withColumn("len_in_bin",
        least(docEnd, binStart + c) - greatest(col("start_token"), binStart))
      .drop("start_token", "n_bins")
  }

  /** Deterministic corpus split (train/val/test/...) by content-hash
    * bucket: each row's md5-derived unsigned 32-bit bucket is compared
    * against INTEGER thresholds precomputed from the cumulative
    * fractions — float-free comparisons, so the same row lands in the
    * same split on any engine, any partitioning, any retry (the
    * property a reproducible training run needs; a rand()-based split
    * has none of it). A narrow projection: no shuffle, no state —
    * appends a `split` column to the input row.
    */
  def splitByHash(docs: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"splitByHash needs positive fractions, got $splits")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    docs.withColumn("split", splitColumn(col(idCol), splits))
  }

  /** The split-label column [[splitByHash]] appends — exposed so a
    * query can project it without carrying the whole input row.
    */
  def splitColumn(id: Column, splits: Seq[(String, Double)]): Column = {
    // domain-separated hash ("split:" prefix): every keep/order decision
    // in this file (tokenBudgetSample, packSequences, rebalanceMix*)
    // sorts by the BARE md5(id), so bucketing the bare hash would make
    // the split a function of keep-priority — budget-sampling a corpus
    // and then splitting it would label the entire kept low-md5 prefix
    // 'train' and leave val/test empty
    val bucket = conv(
      substring(md5(concat(lit("split:"), id.cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    // integer thresholds: cumulative fraction x 2^32, last pinned to
    // 2^32 so float rounding can never leave a bucket unlabeled
    val cum = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val thresholds = cum.init.map(f => math.round(f * 4294967296.0)) :+ 4294967296L
    val named = splits.map(_._1).zip(thresholds)
    val labeled = named.init.foldRight(lit(named.last._1): Column) { case ((name, t), rest) =>
      when(bucket < t, name).otherwise(rest)
    }
    // a null id has no bucket: label it null rather than letting the
    // when-chain's null conditions cascade into the LAST split's
    // otherwise (which would silently dump all id-less docs into test)
    when(id.isNull, lit(null).cast("string")).otherwise(labeled)
  }

  /** Deterministic per-group document cap: keep at most `maxPerGroup`
    * docs per group (source domain, site, feed, ...), chosen by
    * content-hash priority — the domain-capping step that stops one
    * mega-site from dominating a crawl-derived corpus. Same-row-wins on
    * any engine/partitioning/retry, like [[splitByHash]]; the hash is
    * domain-separated ("cap:" prefix) so capping composes with
    * sampling/splitting without correlating with their orders. Null-id
    * docs are dropped (no deterministic tiebreak exists among them).
    *
    * One window per group — groups (domains) are the parallelism unit,
    * with the same single-giant-stratum caveat as [[tokenBudgetSample]];
    * a cap is a per-group sequential selection semantically.
    */
  def capPerGroup(docs: DataFrame, idCol: String, groupCol: String, maxPerGroup: Long): DataFrame = {
    require(maxPerGroup >= 1, s"maxPerGroup must be >= 1, got $maxPerGroup")
    val byPriority = Window
      .partitionBy(groupCol)
      .orderBy(md5(concat(lit("cap:"), col(idCol).cast("string")).cast("binary")), col(idCol))
    docs
      .where(col(idCol).isNotNull)
      .withColumn("cap_rn", row_number().over(byPriority))
      .where(col("cap_rn") <= maxPerGroup)
      .drop("cap_rn")
  }

  /** PII redaction: replace email addresses and IPv4 literals with
    * placeholder tokens and count what was removed — the scrub step a
    * corpus runs before training. Pure per-row regexp projections (one
    * pass, codegen'd, no shuffle). Patterns deliberately avoid
    * lookaround so the same expression runs identically under Java
    * regex (Spark) and RE2 (DuckDB oracle / many scrubbing stacks).
    * `carryCols` ride the projection (the [[qualityFilter]]
    * convention) so a composed pipeline keeps its label columns
    * without a corpus-sized join-back.
    */
  def redactPii(
      docs: DataFrame, idCol: String, textCol: String,
      carryCols: Seq[String] = Nil): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    // counts mirror the SEQUENTIAL replacement: IPs are counted in the
    // email-redacted text, so an IPv4 inside an email's domain (eaten
    // by the <EMAIL> placeholder) is not double-reported — the audit
    // totals reconcile with the placeholders actually inserted
    val emailRedacted = regexp_replace(col(textCol), email, "<EMAIL>")
    docs.select(Seq(
      col(idCol),
      regexp_replace(emailRedacted, ipv4, "<IP>").as("clean_text"),
      size(call_function("regexp_extract_all", col(textCol), lit(email), lit(0)))
        .as("n_emails"),
      size(call_function("regexp_extract_all", emailRedacted, lit(ipv4), lit(0)))
        .as("n_ips")) ++ carryCols.map(col): _*)
  }

  /** Benchmark decontamination: find corpus docs sharing at least
    * `minHits` distinct word n-grams with a benchmark (eval) set — the
    * standard leakage guard a training pipeline runs before shipping a
    * corpus. Shapes chosen for the real size asymmetry: the benchmark
    * n-gram set is tiny next to the corpus, so it is deduplicated and
    * BROADCAST; the corpus side is one explode + distinct + broadcast
    * hash join + count — linear in corpus n-grams, no corpus shuffle
    * beyond the per-doc distinct. Returns (idCol, n_hits) for flagged
    * docs; anti-join it against the corpus to clean.
    */
  def decontaminate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      benchTextCol: String,
      n: Int = 3,
      minHits: Int = 1
  ): DataFrame = {
    // bound to the projected `tk` token column both sides prepare
    def grams = {
      val parts = (0 until n).map(j => s"element_at(tk, i+$j)").mkString(", ")
      // guard short docs: sequence(1, k) with k < 1 would count DOWN
      expr(
        s"""CASE WHEN size(tk) >= $n
           |THEN transform(sequence(1, size(tk)-${n - 1}), i -> concat_ws(' ', $parts))
           |ELSE array() END""".stripMargin)
    }
    val benchGrams = benchmark
      .select(split(col(benchTextCol), " ").as("tk"))
      .select(explode(grams).as("g"))
      .distinct()
    val docGrams = docs
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .select(col(idCol), explode(grams).as("g"))
      .distinct()
    docGrams
      .join(broadcast(benchGrams), "g")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
      .where(col("n_hits") >= minHits)
  }

  /** Embedding-space decontamination: drop every corpus row whose
    * vector's cosine against ANY benchmark vector reaches
    * `thresholdPct`/100 — the semantic cousin of [[decontaminate]],
    * catching paraphrased benchmark leakage that shares no n-gram.
    * Scale shape: benchmark sets are small (thousands of prompts), so
    * the bench side BROADCASTS and the corpus streams through ONE scan;
    * matched ids leave via left-anti. A zero-norm vector on either side
    * has no defined cosine — the guard makes it NULL, NULL comparisons
    * are false, so such rows match nothing and survive; put them
    * through a validation gate first if that is not the intent.
    */
  def decontaminateByEmbedding(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String,
      thresholdPct: Int
  ): DataFrame = {
    import graft.operators.Similarity.{dot, l2Norm}
    val bench = benchmark.select(col(vecCol).as("bench_vec"))
    // guard, don't divide: ANSI mode faults 0/0 before NaN semantics
    // could even apply, and a single malformed row must not kill a
    // corpus-wide purge
    val norms = l2Norm(col(vecCol)) * l2Norm(col("bench_vec"))
    val cos = when(norms > 0, dot(col(vecCol), col("bench_vec")) / norms)
    corpus.join(broadcast(bench), cos * 100 >= thresholdPct, "left_anti")
  }

  /** Token-weighted mix rebalance: like [[rebalanceMix]] but quotas are
    * TOKEN budgets, not document counts — training mixes target token
    * share, and domains with different document lengths would otherwise
    * skew. The binding domain is the one with the smallest
    * total-tokens/weight ratio; every domain keeps docs in content-hash
    * priority order while its running token count stays within
    * floor(weight * scale). Same distributed shape as the doc-count
    * form: tiny per-domain budget relation broadcast, one window over
    * the corpus.
    */
  def rebalanceMixByTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      targetWeights: Map[String, Double]
  ): DataFrame = {
    // ONE corpus tokenize pass feeding the shared budget-cut
    // arithmetic. Null-text docs are excluded up front: their NULL
    // token count would stall the cumulative sum and duplicate the
    // last-row selection [[tokenBudgetCut]] relies on.
    tokenBudgetCut(
      docs.where(col(textCol).isNotNull)
        .select(col(idCol), col(domainCol),
          TextFunctions.tokenCount(col(textCol)).as("n_tokens")),
      idCol, domainCol, targetWeights)
  }

  /** The token-budget selection over an `(idCol, domainCol, n_tokens)`
    * relation whose counts are already materialized and STRICTLY
    * POSITIVE — ONE copy of the arithmetic for both front doors
    * ([[rebalanceMixByTokens]] tokenizes first;
    * [[releaseRegistryManifest]] reads a registry), exactly as the
    * oracle side keeps one mixBudgetCtesSql. Positivity is
    * load-bearing: the per-domain totals relation is the LAST row of
    * each domain's priority order — the row whose cumulative sum
    * equals the domain total — and a zero or NULL count would let a
    * second row share that cumulative sum, duplicating the totals row
    * and with it every row of the domain. Selecting the last row
    * (rather than a groupBy) makes the quota branch reference BOTH
    * window columns, so its copy of the subtree prunes identically to
    * the main branch's and the two canonicalize to ONE exchange
    * (ReuseExchange: the input is scanned and shuffled once,
    * shuffle-file-backed).
    */
  private def tokenBudgetCut(
      withTokens: DataFrame,
      idCol: String,
      domainCol: String,
      targetWeights: Map[String, Double]
  ): DataFrame = {
    val spark = withTokens.sparkSession
    import spark.implicits._
    val w = targetWeights.toSeq.toDF(domainCol, "w")
    val withCum = withTokens
      .withColumn("cum_tokens",
        sum("n_tokens").over(Window.partitionBy(domainCol)
          .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))))
      .withColumn("dom_tokens", sum("n_tokens").over(Window.partitionBy(domainCol)))
    val budgets = withCum
      .where(col("cum_tokens") === col("dom_tokens"))
      .select(col(domainCol), col("dom_tokens"))
      .join(broadcast(w), domainCol)
      .withColumn("scale", min(col("dom_tokens") / col("w")).over(Window.partitionBy()))
      .select(col(domainCol), floor(col("w") * col("scale")).as("budget_tokens"))
    withCum
      .join(broadcast(budgets), domainCol)
      .where(col("cum_tokens") <= col("budget_tokens"))
      .select(col(idCol), col(domainCol), col("n_tokens"))
  }

  /** Token-balanced OUTPUT sharding over a [[packManifest]] relation —
    * the writer's final step: bin `b` of a stratum holding `T` context
    * bins lands in shard `b * min(T, nShards) DIV T`, so each
    * stratum's bins split into `min(T, nShards)` CONTIGUOUS ranges
    * whose sizes differ by at most one bin — and because every bin is
    * a fixed `contextTokens` slice by construction (only each
    * stratum's last bin is short), the shards are token-balanced to
    * within one context window. The `min(T, nShards)` numerator keeps
    * populated shard ids DENSE: a small stratum (T < nShards) fills
    * shards 0..T-1 exactly, so a writer/reader iterating shard ids
    * sees empty shards only ABOVE every populated one, never gaps
    * between them (the plain `b * nShards DIV T` formula would emit
    * sparse ids — T=2, nShards=4 lands in {0, 2}). For T >= nShards
    * the two formulas coincide. Contiguity preserves the stream order
    * inside a shard, so a shard is a self-contained slice of the
    * training stream (a reader can consume shard files independently
    * without reordering).
    *
    * Scale shape: per-stratum bin totals are one rows-per-stratum
    * aggregate over the manifest (every bin appears — the packed
    * stream is gapless), broadcast back; the shard id is then pure
    * per-row integer arithmetic. No window, no extra corpus shuffle —
    * composes onto packSequences' single prefix-sum exchange. Output:
    * the manifest plus `shard_id`; write with
    * `partitionBy(strataCol, "shard_id")`.
    */
  def assignShards(manifest: DataFrame, strataCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val totals = manifest
      .groupBy(col(strataCol))
      .agg((max(col("bin_id")) + 1).as("__sh_bins"))
    manifest.join(broadcast(totals), Seq(strataCol))
      .withColumn("shard_id",
        expr(s"bin_id * least(__sh_bins, $nShards) DIV __sh_bins").cast("int"))
      .drop("__sh_bins")
  }

  /** Rebalance the corpus to target domain proportions by downsampling
    * over-represented domains (never upsampling): the binding domain is
    * the one with the smallest count/weight ratio; every domain keeps
    * floor(weight * scale) docs chosen by content-hash priority.
    * Domains absent from `targetWeights` are dropped. The per-domain
    * count/quota relations are rows-per-domain tiny, so they broadcast;
    * the corpus itself is touched by exactly one window (partitioned by
    * domain) and one broadcast semi-join — no full shuffle of the
    * documents.
    */
  def rebalanceMix(
      docs: DataFrame,
      idCol: String,
      domainCol: String,
      targetWeights: Map[String, Double]
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = targetWeights.toSeq.toDF(domainCol, "w")
    // one corpus pass, same trick as rebalanceMixByTokens: rank and
    // per-domain count share the domain-partitioned window shuffle,
    // and the counts relation is each domain's LAST ranked row
    // (rn == dom_cnt) — referencing both windows keeps the quota
    // branch's subtree copy canonically identical to the main
    // branch's, so ReuseExchange scans the corpus once. scale =
    // min(cnt/w) attaches via a global window over the |domains|-row
    // relation — no cross join
    val ranked = docs
      .withColumn("rn", row_number().over(
        Window.partitionBy(domainCol)
          .orderBy(md5(col(idCol).cast("string").cast("binary")), col(idCol))))
      .withColumn("dom_cnt", count(lit(1)).over(Window.partitionBy(domainCol)))
    val quotas = ranked
      .where(col("rn") === col("dom_cnt"))
      .select(col(domainCol), col("dom_cnt"))
      .join(broadcast(w), domainCol)
      .withColumn("scale", min(col("dom_cnt") / col("w")).over(Window.partitionBy()))
      .select(col(domainCol), floor(col("w") * col("scale")).as("keep_n"))
    ranked
      .join(broadcast(quotas), domainCol)
      .where(col("rn") <= col("keep_n"))
      .select(col(idCol), col(domainCol))
  }

  /** The full release-packing arithmetic — token-budget cut
    * ([[rebalanceMixByTokens]]'s selection), [[packSequences]],
    * [[packManifest]], [[assignShards]] — over a per-document REGISTRY
    * `(idCol, strataCol, nTokensCol)` instead of corpus text: the
    * relation a published release stores beside its shards. Identical
    * output to the text-fed chain when the registered token counts
    * match, and the enabling fact of [[releaseDelta]]: everything
    * after curation is a deterministic function of the registry, so a
    * re-release over yesterday's registry + today's churn never
    * touches yesterday's text. Rows with NULL or non-positive counts
    * are excluded up front — the text-fed chain's domain (tokenCount
    * of non-null text is >= 1), enforced because registry counts are
    * caller-supplied. Output columns, fixed order:
    * (idCol, strataCol, n_tokens, bin_id, offset_in_bin, len_in_bin,
    * shard_id).
    */
  def releaseRegistryManifest(
      registry: DataFrame,
      idCol: String,
      nTokensCol: String,
      strataCol: String,
      targetWeights: Map[String, Double],
      contextTokens: Int,
      nShards: Int
  ): DataFrame = {
    // registries are caller-supplied counts, so the text-fed chain's
    // implicit domain (tokenCount of non-null text is always >= 1)
    // must be enforced here: NULL or non-positive counts would
    // duplicate tokenBudgetCut's last-row totals selection, and a
    // zero-token doc has no bytes to ship anyway
    val bud = tokenBudgetCut(
      registry
        .where(col(nTokensCol).isNotNull && col(nTokensCol) > 0)
        .select(col(idCol), col(strataCol), col(nTokensCol).as("n_tokens")),
      idCol, strataCol, targetWeights)
    assignShards(
        packManifest(
          packSequences(bud, idCol, "n_tokens", strataCol, contextTokens,
            countOf = c => c),
          contextTokens),
        strataCol, nShards)
      .select(col(idCol), col(strataCol), col("n_tokens"),
        col("bin_id"), col("offset_in_bin"), col("len_in_bin"), col("shard_id"))
  }

  /** INCREMENTAL release: given yesterday's published release
    * manifest and today's from-scratch manifest (both
    * [[releaseRegistryManifest]] relations), emit the delta a
    * publisher ships instead of a full re-release — shards are files,
    * so the unit of change is the whole shard:
    *
    *  - `kind = 'shard'`: EVERY row of each (stratum, shard) whose
    *    content differs from (or did not exist in) the previous
    *    release — the files to (re)write.
    *  - `kind = 'drop_shard'`: a (stratum, shard) present yesterday
    *    with no content today — the files to retire.
    *  - `kind = 'tombstone'`: ids shipped yesterday and absent from
    *    today's release — the removed-documents record published
    *    beside the shards (the index tiers' delete pattern; removal
    *    itself is effected by the shard rewrites above).
    *
    * Cost shape: a pure diff of two MANIFEST relations (narrow integer
    * rows, no text anywhere) — an exact exceptAll for the touched
    * shard set plus bounded joins. The inputs are manifests, not
    * registries, deliberately: the previous manifest IS the published
    * release sitting in durable storage, and today's derives once via
    * [[releaseRegistryManifest]] — taking registries here would bury
    * both derivations inside a plan that references them several
    * times and silently re-run the packing windows per reference.
    * Publish bytes are O(changed shards), the entire point: a 100 TB
    * release whose daily churn touches one language must not rewrite
    * every shard daily. The law [[applyReleaseDelta]] holds by
    * construction and is what the oracle grades: prev manifest +
    * delta == from-scratch manifest of the new registry.
    */
  def releaseDelta(
      prevM: DataFrame,
      newM0: DataFrame,
      idCol: String,
      strataCol: String
  ): DataFrame = {
    // exceptAll compares POSITIONALLY, and the previous manifest is
    // typically re-read from published parquet whose column order
    // need not match a freshly derived manifest's — align before
    // diffing, or same-typed columns mispair and every shard reads
    // as touched (a silent full republish, not an error)
    require(prevM.columns.toSet == newM0.columns.toSet,
      s"releaseDelta: manifests disagree on columns — prev ${prevM.columns.mkString(",")} " +
        s"vs new ${newM0.columns.mkString(",")}")
    val newM = newM0.select(prevM.columns.map(col): _*)
    // exact symmetric difference -> the touched (stratum, shard) set;
    // exceptAll (not a checksum) because a release diff must be sound,
    // and the manifests are narrow arithmetic rows
    val touched = prevM.exceptAll(newM).select(col(strataCol), col("shard_id"))
      .unionByName(newM.exceptAll(prevM).select(col(strataCol), col("shard_id")))
      .distinct()
    // absent-column nulls take their types from the MANIFEST schema —
    // the API is type-agnostic over (idCol, strataCol, nTokensCol),
    // so a string-keyed or long-counted registry must union cleanly
    val mSchema = newM.schema
    def nullAs(name: String) = lit(null).cast(mSchema(name).dataType).as(name)
    val shardRows = newM.join(touched, Seq(strataCol, "shard_id"), "left_semi")
      .select(lit("shard").as("kind"), col(strataCol), col("shard_id"),
        col(idCol), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"))
    val dropped = touched
      .join(newM.select(col(strataCol), col("shard_id")).distinct(),
        Seq(strataCol, "shard_id"), "left_anti")
      .select(lit("drop_shard").as("kind"), col(strataCol), col("shard_id"),
        nullAs(idCol), nullAs("n_tokens"),
        nullAs("bin_id"), nullAs("offset_in_bin"), nullAs("len_in_bin"))
    val tombstones = prevM.select(col(idCol)).distinct()
      .join(newM.select(col(idCol)).distinct(), Seq(idCol), "left_anti")
      .select(lit("tombstone").as("kind"), nullAs(strataCol),
        nullAs("shard_id"), col(idCol),
        nullAs("n_tokens"), nullAs("bin_id"),
        nullAs("offset_in_bin"), nullAs("len_in_bin"))
    shardRows.unionByName(dropped).unionByName(tombstones)
  }

  /** Apply a [[releaseDelta]] to the previous release's manifest:
    * shards named by the delta (shipped or dropped) are replaced
    * wholesale by the delta's `shard` rows; untouched shards carry
    * over verbatim. By the delta's construction this EQUALS the
    * from-scratch manifest of the new registry — the equality the
    * release-delta oracle value-grades.
    */
  /** The release root's commit-marker directory — the
    * [[graft.operators.IndexManifest]] protocol at the release tier:
    * present iff the tree is a CONSISTENT release state. Underscore-
    * prefixed, so parquet readers of the root never see it.
    */
  private val ReleaseCommitDir = "_commit"

  private def releaseCommitPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/$ReleaseCommitDir")

  /** Physically publish a release manifest as a `(strataCol,
    * shard_id)`-partitioned parquet tree — the on-disk unit of change
    * [[publishReleaseDelta]] rewrites — plus a commit marker written
    * LAST: a crash mid-publish leaves a root [[readRelease]] refuses,
    * never a half release. Write once per release root; deltas take
    * over from there.
    */
  def publishRelease(manifest: DataFrame, strataCol: String, path: String): Unit = {
    val spark = manifest.sparkSession
    val fs = releaseCommitPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(releaseCommitPath(path))) fs.delete(releaseCommitPath(path), true): Unit
    manifest.write.partitionBy(strataCol, "shard_id").mode("overwrite").parquet(path)
    spark.range(1).write.mode("overwrite").parquet(s"$path/$ReleaseCommitDir")
  }

  /** Read back a published release, refusing a root whose commit
    * marker is missing — an interrupted [[publishRelease]] or
    * [[publishReleaseDelta]] must answer "republish", not serve a
    * mixed state.
    */
  def readRelease(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val fs = releaseCommitPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(releaseCommitPath(path)),
      s"no consistent release at $path: commit marker missing " +
        "(publish interrupted or never run) — republish or re-apply the delta")
    spark.read.parquet(path)
  }

  /** Apply a [[releaseDelta]] to a PUBLISHED release in place,
    * touching only the delta's partitions — where the O(changed
    * shards) publish-bytes claim becomes physical:
    *
    *  - `shard` rows rewrite their `(stratum, shard_id)` partitions
    *    via DYNAMIC partition overwrite — partitions absent from the
    *    delta are not listed, not rewritten, their files stay
    *    byte-identical on disk (at 100 TB, a churn that touches one
    *    language must not rewrite every shard's parquet).
    *  - `drop_shard` rows delete their partition directories (a
    *    bounded shards-count driver loop over filesystem metadata),
    *    resolved through Spark's own partition-path escaping so a
    *    stratum value like "zh:Hant" hits the directory the writer
    *    actually produced. Deletes are idempotent (an already-absent
    *    directory — a re-applied delta after a crash — passes), but a
    *    delete that fails while the directory persists fails loudly.
    *  - `tombstone` ids land under `_removed/delta-<content-hash>/`
    *    — the removed-documents record published beside the shards
    *    (the leading underscore keeps `_removed` invisible to parquet
    *    readers of the release root; read it back via
    *    [[readRemoved]]). The subdir is keyed by a deterministic
    *    content hash of the WHOLE delta and written with overwrite
    *    semantics, the index tiers' per-generation tombstone-dir
    *    pattern (Retrieval `tombstones/ts-NNNNN`): re-applying the
    *    same delta lands in the same subdir and leaves the
    *    removed-doc ROW COUNT unchanged, so a consumer counting
    *    removals (or replaying them into an index tier) never reads
    *    an inflated record. Hashing the whole delta — not just the
    *    tombstone ids — keeps a later remove/re-add/remove cycle of
    *    the same ids a DISTINCT event (its shard rows differ).
    *
    * The three mutations are not atomic individually, so the apply
    * wears the index tiers' crash posture: the commit marker is
    * deleted FIRST and re-written LAST — a crash anywhere in between
    * leaves a root [[readRelease]] loudly refuses (re-applying the
    * same delta repairs it — all three mutations are idempotent —
    * and [[repairRelease]] does so from the staged snapshot without
    * needing the caller's delta plan back), never a silently mixed
    * state. A markerless root whose staged snapshot belongs to a
    * DIFFERENT delta — or that has none at all (an interrupted
    * [[publishRelease]] never stages) — refuses up front: certifying
    * either tree would launder its inconsistency. Before the marker is touched the
    * delta is STAGED to parquet under `_staged/delta-<hash>` (same
    * filesystem as the release — underscore-hidden from readers) and
    * every mutation reads the STAGED copy, never the caller's plan.
    * Staging is load-bearing twice over: (1) it is the
    * materialization barrier — a pure compute failure (an upstream
    * bug, an OOM in the diff) surfaces while the release is still
    * intact and readable, so only real mutations open the unreadable
    * window; (2) a delta whose lineage reads the release root itself
    * (the [[maintainRelease]] shape: prev = [[readRelease]]) would
    * otherwise be silently RECOMPUTED against the half-rewritten tree
    * mid-apply — Spark refreshes path-dependent caches when the path
    * is overwritten, so even a persisted plan is not a snapshot; a
    * staged file is.
    */
  def publishReleaseDelta(
      delta: DataFrame, idCol: String, strataCol: String, path: String): Unit = {
    val spark = delta.sparkSession
    val fs = releaseCommitPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // while the commit marker still stands, any `_staged` residue is
    // by definition leftover from a COMPLETED apply whose final
    // cleanup crashed (the marker returns before the staged snapshot
    // is removed). Sweep it NOW: left in place, the next unreadable
    // window would hold TWO snapshots and [[repairRelease]] would
    // refuse a perfectly repairable root as ambiguous.
    val stagedRoot = new org.apache.hadoop.fs.Path(s"$path/_staged")
    if (fs.exists(releaseCommitPath(path)) && fs.exists(stagedRoot))
      fs.delete(stagedRoot, true): Unit
    val d0 = delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded pass over the delta, run while the commit marker
    // still stands: an order-insensitive content hash (sum of per-row
    // xxhash64 in decimal — no overflow under ANSI) keying the staged
    // and tombstone dirs, plus the tombstone row count. The per-row
    // hash folds a NULL BITMAP beside the values: Spark's hash fold
    // SKIPS null columns, so two rows differing only in WHICH
    // same-typed column is null would otherwise hash identically —
    // and a cross-delta key collision overwrites an earlier delta's
    // `_removed/delta-<key>` record (overwrite semantics), silently
    // shrinking the right-to-erasure audit trail.
    val (deltaKey, nTombstones) =
      try {
        val rowHash = xxhash64(
          d0.columns.map(col) ++ d0.columns.map(c => col(c).isNull): _*)
        val fp = d0.agg(
          coalesce(sum(rowHash.cast("decimal(38,0)")),
            lit(0L).cast("decimal(38,0)")).as("h"),
          sum(when(col("kind") === "tombstone", 1L).otherwise(0L)).as("n_ts")).head()
        val key = fp.getDecimal(0).toBigInteger.toString(16).replace("-", "n")
        // a root whose marker is ALREADY gone is broken in one of two
        // ways, and only one is repairable here: (a) a crashed earlier
        // DELTA apply left its staged snapshot — re-staging the SAME
        // key is the documented re-apply repair and proceeds; a
        // DIFFERENT key refuses (applying a new delta would rewrite
        // the marker over a tree missing the crashed delta's tail
        // mutations and the residue sweep would later destroy the only
        // repair evidence); (b) NO snapshot at all — an interrupted
        // publishRelease (which deletes the marker first and never
        // stages) or out-of-band mutilation: certifying THAT tree
        // would silently serve a half-written release, so it refuses
        // exactly as repairRelease does.
        if (!fs.exists(releaseCommitPath(path))) {
          val stagedDirs =
            if (!fs.exists(stagedRoot)) Array.empty[String]
            else fs.listStatus(stagedRoot)
              .filter(s => s.isDirectory && s.getPath.getName.startsWith("delta-"))
              .map(_.getPath.getName)
          require(stagedDirs.nonEmpty,
            s"publishReleaseDelta: release at $path has no commit marker and no staged " +
              "snapshot — an interrupted publishRelease (or an out-of-band mutation), " +
              "not a crashed delta apply; applying a delta would certify the broken " +
              "tree. Republish from scratch")
          val foreign = stagedDirs.filter(_ != s"delta-$key")
          require(foreign.isEmpty,
            s"publishReleaseDelta: release at $path has no commit marker and holds staged " +
              s"snapshot(s) ${foreign.mkString(", ")} from a crashed EARLIER apply — " +
              "applying a new delta over the half-mutated tree would certify it and sweep " +
              "the repair evidence; run repairRelease first (maintainRelease does so " +
              "automatically)")
        }
        d0.write.mode("overwrite").parquet(s"$path/_staged/delta-$key")
        (key, if (fp.isNullAt(1)) 0L else fp.getLong(1))
      } finally d0.unpersist()
    applyStagedDelta(spark, path, deltaKey, idCol, strataCol, Some(nTombstones))
  }

  /** The mutation core, reading ONLY a staged snapshot (the caller's
    * delta plan may read the very tree these mutations rewrite) —
    * shared by [[publishReleaseDelta]] and the crash-recovery path
    * [[repairRelease]], so "re-apply the staged delta" is one
    * implementation wherever it runs from.
    */
  private def applyStagedDelta(
      spark: org.apache.spark.sql.SparkSession,
      path: String, deltaKey: String, idCol: String, strataCol: String,
      nTombstonesKnown: Option[Long] = None): Unit = {
    val fs = releaseCommitPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val d = spark.read.parquet(s"$path/_staged/delta-$deltaKey")
    // the publish path already counted tombstones inside its
    // fingerprint aggregation — reuse it; only the repair path (no
    // caller-side pass) pays this count job
    val nTombstones = nTombstonesKnown.getOrElse(
      d.where(col("kind") === "tombstone").count())
    if (fs.exists(releaseCommitPath(path))) fs.delete(releaseCommitPath(path), true): Unit
    d.where(col("kind") === "shard").drop("kind")
      .write.partitionBy(strataCol, "shard_id")
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite").parquet(path)
    def partDir(strata: Any, shard: Any): String = {
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils.getPartitionPathString
      s"$path/${getPartitionPathString(strataCol, String.valueOf(strata))}/" +
        getPartitionPathString("shard_id", String.valueOf(shard))
    }
    val drops = d.where(col("kind") === "drop_shard")
      .select(col(strataCol), col("shard_id")).collect()
    drops.foreach { r =>
      val p = new org.apache.hadoop.fs.Path(partDir(r.get(0), r.get(1)))
      require(fs.delete(p, true) || !fs.exists(p),
        s"publishReleaseDelta: failed to drop retired shard directory $p")
    }
    // a stratum whose LAST shard was dropped leaves an empty
    // partition dir behind — remove it so the tree mirrors the
    // manifest exactly
    drops.map(r => partDir(r.get(0), r.get(1)))
      .map(p => p.substring(0, p.lastIndexOf('/'))).distinct.foreach { dir =>
        val p = new org.apache.hadoop.fs.Path(dir)
        if (fs.exists(p) && fs.listStatus(p).isEmpty) fs.delete(p, true): Unit
      }
    if (nTombstones > 0L)
      d.where(col("kind") === "tombstone").select(col(idCol))
        .write.mode("overwrite").parquet(s"$path/_removed/delta-$deltaKey")
    spark.range(1).write.mode("overwrite").parquet(s"$path/$ReleaseCommitDir")
    // the staged snapshot has served its purpose once the marker is
    // back; a crash before this line leaves harmless hidden bytes a
    // re-apply overwrites
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_staged/delta-$deltaKey"), true): Unit
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/_staged")) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/_staged")).isEmpty)
      fs.delete(new org.apache.hadoop.fs.Path(s"$path/_staged"), true): Unit
  }

  /** CRASH RECOVERY for a release root whose commit marker is gone —
    * the operational answer to [[readRelease]]'s refusal that does
    * NOT need the original delta plan (which, in the
    * [[maintainRelease]] shape, derived from the very tree that is
    * now inconsistent and so cannot be re-derived): every
    * [[publishReleaseDelta]] stages its delta to parquet BEFORE the
    * marker is touched and cleans it only AFTER the marker returns,
    * so an unreadable root always holds the exact staged snapshot
    * whose re-apply repairs it. Returns false untouched when the root
    * is already consistent; repairs and returns true when exactly one
    * staged delta sits under `_staged/`; refuses loudly when the
    * state is ambiguous (no snapshot — the root predates staging, or
    * was mutilated out-of-band; several — deltas were published
    * WITHOUT repairing an already-broken root, and order is lost).
    */
  def repairRelease(
      spark: org.apache.spark.sql.SparkSession,
      path: String, idCol: String, strataCol: String): Boolean = {
    val fs = releaseCommitPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(releaseCommitPath(path))) {
      // consistent root: any _staged residue is a completed apply's
      // crashed cleanup — sweep it here too, so a later crash window
      // never inherits a second snapshot
      val residue = new org.apache.hadoop.fs.Path(s"$path/_staged")
      if (fs.exists(residue)) fs.delete(residue, true): Unit
      return false
    }
    val staged = new org.apache.hadoop.fs.Path(s"$path/_staged")
    val dirs =
      if (!fs.exists(staged)) Array.empty[String]
      else fs.listStatus(staged).filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("delta-"))
        .map(_.getPath.getName)
    require(dirs.length == 1,
      s"repairRelease: release at $path has no commit marker and ${dirs.length} staged " +
        "delta snapshot(s) — cannot repair " +
        (if (dirs.isEmpty) "(no snapshot: the root predates delta staging or was cleaned " +
          "out-of-band); republish from scratch"
         else s"(${dirs.mkString(", ")}: deltas were applied over an already-inconsistent " +
           "root and the order is lost); republish from scratch"))
    applyStagedDelta(spark, path, dirs.head.stripPrefix("delta-"), idCol, strataCol)
    true
  }

  /** Read the removed-documents record a release accumulates — one
    * `delta-<hash>` subdir per applied [[publishReleaseDelta]] that
    * carried tombstones, unioned. A release with no removals yet
    * yields an empty relation whose single column takes `idCol`'s
    * type from the published manifest itself, so downstream unions
    * and joins typecheck without a special case.
    */
  def readRemoved(
      spark: org.apache.spark.sql.SparkSession, path: String, idCol: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(s"$path/_removed")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries =
      if (!fs.exists(root)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(root)
    // a pre-delta-subdir `_removed/` (tombstones appended flat under
    // the root) must refuse loudly, not read back empty: silently
    // dropping a right-to-erasure audit record is the one failure mode
    // worse than crashing. One delta re-apply under the current layout
    // migrates nothing — rewrite the flat files into a delta-<name>
    // subdir by hand.
    val flat = entries.filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    require(flat.isEmpty,
      s"readRemoved: $path/_removed holds ${flat.length} flat parquet file(s) from a " +
        "pre-delta-subdir layout — move them under _removed/delta-legacy/ before reading")
    val dirs = entries.filter(s =>
      s.isDirectory && s.getPath.getName.startsWith("delta-")).map(_.getPath.toString)
    if (dirs.isEmpty) readRelease(spark, path).select(col(idCol)).limit(0)
    else spark.read.parquet(scala.collection.immutable.ArraySeq.unsafeWrapArray(dirs): _*)
  }

  /** ONE release maintenance round — the release twin of
    * `Retrieval.maintainIndex`: today's registry in, a drift-gated
    * incremental publish out. Composes the whole deployment sequence
    * behind a single entry point so the QA gate decides what ships,
    * not caller discipline:
    *
    *  1. yesterday's manifest = the PUBLISHED release at
    *     `releasePath` ([[readRelease]] — refuses an inconsistent
    *     tree up front);
    *  2. today's manifest derives once via
    *     [[releaseRegistryManifest]] (persisted for the round — the
    *     PSI pass and the delta both reference it);
    *  3. the drift gate: per-stratum PSI of the token-count
    *     distribution, yesterday's manifest vs today's
    *     ([[Stats.populationStabilityBy]] over the manifests' own
    *     `n_tokens`). Any stratum above `maxPsi` — including a
    *     brand-new stratum, whose baseline is empty and whose PSI is
    *     therefore large — REFUSES the round: nothing is written,
    *     the previous release keeps serving, and the report says why.
    *     A stratum with ZERO in-grid mass in both snapshots (every
    *     token count outside [0, psiHi)) reports `psi = NaN` and also
    *     refuses — a smoothed-zero grid scores 0 regardless of drift,
    *     so "can't see the stratum" must gate, not pass; raise psiHi
    *     to cover the stratum's length range.
    *  4. a passed gate ships [[releaseDelta]] via
    *     [[publishReleaseDelta]] — O(changed shards) bytes, in place.
    *
    * Returns the per-stratum gate report, one row per stratum:
    * `(strataCol, psi, published)` — `published` is the ROUND verdict
    * (true on every row, or false on every row), so the report reads
    * the same whether it gated or shipped. Cost shape: the gate is
    * two manifest-sized histogram aggregations plus a strata-count
    * driver collect (bounded: strata = languages); the publish is the
    * delta's own O(changed shards). A no-churn round ships an empty
    * delta and leaves the tree byte-identical.
    */
  def maintainRelease(
      spark: org.apache.spark.sql.SparkSession,
      releasePath: String,
      newRegistry: DataFrame,
      idCol: String,
      nTokensCol: String,
      strataCol: String,
      targetWeights: Map[String, Double],
      contextTokens: Int,
      nShards: Int,
      maxPsi: Double = 0.25,
      psiHi: Double = 4096,
      psiBins: Int = 16
  ): DataFrame = {
    import spark.implicits._
    // auto-heal first: a round that crashed mid-apply left the root
    // refusing reads AND left the staged delta snapshot whose
    // re-apply finishes the job — without this, the one-call entry
    // point would dead-end on its own crash (readRelease refuses, and
    // the delta cannot re-derive from an inconsistent tree)
    repairRelease(spark, releasePath, idCol, strataCol): Unit
    val prevM = readRelease(spark, releasePath)
    val newM = releaseRegistryManifest(newRegistry, idCol, nTokensCol, strataCol,
        targetWeights, contextTokens, nShards)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // a stratum whose token counts sit ENTIRELY outside [0, psiHi)
      // in BOTH snapshots has all-smoothed-zero bins and a PSI of 0 —
      // the gate would be blind to arbitrary drift in long-document
      // strata. Zero in-grid mass on both sides scores NaN instead
      // (NaN <= maxPsi is false, so the round refuses and the report
      // carries the why): the caller must raise psiHi to cover the
      // stratum, not silently skip it.
      val psiRows = Stats.populationStabilityBy(
          prevM.select(col(strataCol), col("n_tokens")),
          newM.select(col(strataCol), col("n_tokens")),
          "n_tokens", strataCol, lo = 0, hi = psiHi, bins = psiBins)
        .groupBy(col(strataCol))
        .agg(sum("psi_term").as("psi"),
          sum("n_base").as("__nb"), sum("n_cur").as("__nc"))
        .collect()
        .map(r => (r.getString(0),
          if (r.getLong(2) == 0L && r.getLong(3) == 0L) Double.NaN
          else r.getDouble(1)))
        .sortBy(_._1).toSeq
      val publish = psiRows.forall(_._2 <= maxPsi)
      if (publish)
        publishReleaseDelta(
          releaseDelta(prevM, newM, idCol, strataCol), idCol, strataCol, releasePath)
      psiRows.map { case (stratum, psi) => (stratum, psi, publish) }
        .toDF(strataCol, "psi", "published")
    } finally newM.unpersist()
  }

  def applyReleaseDelta(
      prevManifest: DataFrame, delta: DataFrame, strataCol: String): DataFrame = {
    val touched = delta.where(col("kind").isin("shard", "drop_shard"))
      .select(col(strataCol), col("shard_id")).distinct()
    prevManifest
      .join(touched, Seq(strataCol, "shard_id"), "left_anti")
      .unionByName(delta.where(col("kind") === "shard").drop("kind"))
      // restore the manifest's column ORDER: the USING-key join floats
      // (stratum, shard_id) to the front, and a downstream positional
      // compare (exceptAll) against a from-scratch manifest must not
      // see a reshuffled schema
      .select(prevManifest.columns.map(col): _*)
  }
}
