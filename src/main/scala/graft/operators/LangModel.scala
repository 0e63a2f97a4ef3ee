package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus n-gram language model for perplexity-based quality scoring —
  * the CCNet-style signal a training-data pipeline uses to rank crawl
  * text by fluency (gibberish, boilerplate, and OCR noise score high
  * perplexity; clean prose scores low). Beyond the reference, which has
  * no LM tier; the model here is a word-bigram model with stupid
  * backoff (Brants et al. 2007: score, not probability —
  * `S(w2|w1) = c(w1 w2)/c(w1)` when the bigram was seen, else
  * `alpha * c(w2)/N`), the standard web-scale choice because it needs
  * no discounting state beyond raw counts.
  *
  * Scale shape: training is two hash aggregations over the exploded
  * token stream (map-side combinable, no window, no driver state —
  * count tables grow with vocabulary, not corpus); scoring is a
  * left join of the document's bigram stream against the count tables
  * (Catalyst broadcasts them when small, shuffles when not) followed by
  * a per-doc aggregate. Nothing collects.
  *
  * Determinism stance (the DuckDB-oracle recipe shared with
  * text_entropy): every log term is log2 OF AN INTEGER COUNT and the
  * backoff constant is a power of two (alpha = 0.25, exactly -2 in
  * log2), so both engines compute identical doubles before the final
  * round.
  */
object LangModel {

  private def bigramStream(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      // contains-a-space ≡ "split yields >= 2 tokens" for the single-
      // space separator (every space adds one element, trailing empties
      // kept) without allocating the token array a second time just to
      // count it; the pair generator is the native codegen'd
      // graft_adjacent_pairs — the transform(sequence(...)) form it
      // replaces was a CodegenFallback lambda interpreted per token on
      // every LM-tier corpus scan
      .where(col(textCol).isNotNull && col(textCol).contains(" "))
      .select(col(idCol), explode(
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.AdjacentPairs(
            org.apache.spark.sql.graftbridge.Bridge.expression(
              split(col(textCol), " "))))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** (w1, w2, c) bigram counts — one hash aggregation over the token
    * stream. Docs with fewer than two tokens contribute nothing; null
    * texts are dropped.
    */
  def bigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    bigramStream(docs, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))

  /** (w, c) unigram counts over all tokens of non-null texts. */
  def unigramCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .where(col(textCol).isNotNull)
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))

  /** Per-document log2-perplexity under a stupid-backoff bigram model:
    * output (id, n_bigrams, log2_ppl) where
    * `log2_ppl = -mean over bigram positions of log2 S(w2|w1)`
    * (perplexity = 2^log2_ppl; kept in the log domain so every emitted
    * value is a rounded sum of log2-of-integer terms). Backoff for an
    * unseen bigram is `0.25 * c(w2)/N` with c(w2) floored at 1 for
    * out-of-vocabulary words — the score stays finite on any input.
    * Docs with no bigram (null text or fewer than two tokens) emit no
    * row: they carry zero evidence, and the quality-gate tier already
    * owns the too-short signal.
    *
    * `bigrams`/`unigrams` usually come from [[bigramCounts]] /
    * [[unigramCounts]] over a REFERENCE corpus (score crawl text
    * against a clean LM — the CCNet deployment); training and scoring
    * on the same corpus is the self-perplexity variant used for
    * outlier detection.
    */
  def perplexityScore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bigrams: DataFrame,
      unigrams: DataFrame
  ): DataFrame = {
    // The stream joins the count tables DIRECTLY — measured (r21)
    // against the distinct-bigram-proxy rewrite (enrich the distinct
    // (w1,w2) relation with the model, rejoin the stream once): the
    // proxy form is ~30% slower here because the count tables are
    // vocabulary-sized and AQE converts every one of these joins to a
    // broadcast at runtime — the stream is then never shuffled at all,
    // while the proxy form forces two stream shuffles (distinct +
    // rejoin) to save shuffles the broadcast regime never pays. The
    // proxy shape only wins when the model tables exceed broadcast
    // reach; at that scale pass pre-aggregated tables and revisit.
    val total = unigrams.agg(sum("c").as("n_total"))
    bigramStream(docs, idCol, textCol)
      .join(bigrams.select(col("w1"), col("w2"), col("c").as("c_bg")), Seq("w1", "w2"), "left")
      .join(unigrams.select(col("w").as("w1"), col("c").as("c_w1")), Seq("w1"), "left")
      .join(unigrams.select(col("w").as("w2"), col("c").as("c_w2")), Seq("w2"), "left")
      .crossJoin(total)
      .select(col(idCol),
        when(col("c_bg").isNotNull && col("c_w1").isNotNull,
          log2(col("c_bg")) - log2(col("c_w1")))
          .otherwise(lit(-2.0) + log2(coalesce(col("c_w2"), lit(1L))) - log2(col("n_total")))
          .as("lp"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("bigint").as("n_bigrams"),
        round(lit(0.0) - avg(col("lp")), 6).as("log2_ppl"))
  }
}
