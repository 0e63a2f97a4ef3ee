package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID heuristics
  * and document fingerprinting. All column-expression based (whole-stage
  * codegen, no UDFs) so they scale to 100 TB document corpora: every
  * function is a narrow per-row transform — no shuffle — and composes
  * with Catalyst pushdown/pruning.
  *
  * The reference's string surface is regex-only
  * (reference: src/helpers/regex.rs); everything beyond that is the
  * beyond-parity training-pipeline tier.
  */
object TextFunctions {

  /** Single-space tokens — the DELIBERATE contract shared with every
    * DuckDB oracle (`string_split(text, ' ')`), which is what makes the
    * cross-engine hash compare exact. Consequences a caller must know:
    * consecutive spaces yield empty tokens, "" tokenizes to [""], and
    * tabs/newlines do not split. Corpora here are single-spaced by
    * construction; for free-form whitespace use [[bpeishTokens]], whose
    * regex extraction never emits empties.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish word/punct tokenization: words, numbers, or single
    * non-space symbols — closer to how a subword pre-tokenizer chunks.
    */
  def bpeishTokens(text: Column): Column =
    // regexp_extract_all is available as a SQL function in Spark 3.4+
    call_function("regexp_extract_all", text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Type-token ratio (distinct/total tokens) — a standard quality
    * signal: boilerplate/spammy documents repeat tokens heavily.
    */
  def typeTokenRatio(text: Column): Column = {
    val t = tokens(text)
    round(size(array_distinct(t)).cast("double") / size(t).cast("double"), 6)
  }

  /** Ratio of tokens found in `stopwords` — language-ID/quality
    * heuristic building block.
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    val hits = size(filter(t, x => x.isInCollection(stopwords)))
    round(hits.cast("double") / size(t).cast("double"), 6)
  }

  /** n-gram-free language guess from a stopword hit-ratio threshold.
    * A real pipeline would score per-language stopword sets; the shape
    * (narrow map, no shuffle) is identical. For multi-language gating
    * use [[langIdNgram]].
    */
  def langGuess(text: Column, stopwords: Seq[String], threshold: Double): Column =
    when(stopwordRatio(text, stopwords) > threshold, lit("en")).otherwise(lit("other"))

  /** Character-n-gram language profiles (Cavnar & Trenkle's n-gram
    * method, reduced to a fixed high-signal gram set per language so
    * scoring stays EXACT integer arithmetic): the most frequent
    * trigrams of each language's running text — function-word cores
    * and bound morphology that occur in any domain — plus top
    * single-character grams for Chinese, where words are characters.
    * Deterministic and engine-neutral by construction: a score is a
    * plain substring count, so a DuckDB oracle replays it with
    * length/replace arithmetic.
    */
  val defaultLangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "ein", "ich", "sch", "und"),
    "en" -> Seq("the", " th", "he ", "and", "ing"),
    "es" -> Seq(" de", " la", "os ", "ión", "nte"),
    "fr" -> Seq(" le", "les", " et", "que", "ent"),
    "zh" -> Seq("的", "是", "了", "不", "在"))

  /** Exact occurrence count of each profile gram summed per language:
    * count(g) = (len(text) - len(replace(text, g, ''))) / len(g) —
    * non-overlapping left-to-right occurrences, the same answer every
    * engine's plain `replace` gives. Served by the native
    * [[graft.expressions.GramCountSum]] scan: the composed
    * length/replace form materializes a document-sized replaced COPY
    * per gram per row (25 allocations/row under the default 5-language
    * profiles — the dominant cost and GC load of the language-ID
    * projection), where the expression is the same non-overlapping
    * find-and-skip walk replace() does internally, minus the copy.
    */
  def langNgramScore(text: Column, grams: Seq[String]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.GramCountSum(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), grams))

  /** Multi-language character-n-gram language ID — the gate a
    * multilingual curation run actually branches on, replacing the
    * single-language stopword heuristic: per-language profile scores
    * ([[langNgramScore]] over [[defaultLangProfiles]] or a custom
    * set), argmax with a deterministic first-in-profile-order
    * tiebreak, `"und"` (BCP 47 undetermined) when every score is zero.
    * One narrow codegen'd projection — no shuffle, no UDF, and exact
    * integer scores, so the prediction is bit-identical across engines
    * and replayable by the oracle.
    */
  def langIdNgram(
      text: Column,
      profiles: Seq[(String, Seq[String])] = defaultLangProfiles): Column = {
    require(profiles.nonEmpty, "langIdNgram needs at least one language profile")
    langIdFromScores(profiles.map { case (l, gs) => (l, langNgramScore(text, gs)) })
  }

  /** FIT the language profiles from a labeled corpus instead of using
    * the hand-picked [[defaultLangProfiles]] — the train-then-serve
    * split every model tier here follows (BPE merges, DSIR term
    * tables, quality-classifier weights): character trigrams explode
    * once, count per (lang, gram) and per gram globally, and each
    * language keeps its `gramsPerLang` most DISCRIMINATIVE grams —
    * ranked by the integer share (c_lang · 10^6) div c_all (the
    * fraction of a gram's occurrences owned by this language; raw
    * frequency would hand every language the same corpus-common soup),
    * ties broken by higher count then gram order, so the fit is
    * deterministic and replayable cross-engine. One explode + two
    * hash aggregates + one bounded per-lang top-k window — the 100 TB
    * shape; output (lang, gram, c_lang, c_all, rank) is languages ×
    * gramsPerLang rows.
    */
  def langProfileFit(
      docs: DataFrame, textCol: String, langCol: String,
      gramsPerLang: Int = 5): DataFrame = {
    require(gramsPerLang > 0, "gramsPerLang must be positive")
    import org.apache.spark.sql.expressions.Window
    // gram extraction is the native codegen'd graft_char_trigrams
    // expression, NOT transform(sequence(...), i -> substring(...)):
    // higher-order functions are CodegenFallback (interpreted per
    // element, one boxed array per doc — benched 6x the replaying
    // oracle), and the explode-the-positions rewrite copies the whole
    // document string into every generated row. The expression also
    // owns the sub-3-char emptiness (Spark's sequence(1, 0) DESCENDS
    // instead of returning empty, which would fabricate grams).
    val grams = docs
      .where(col(textCol).isNotNull && col(langCol).isNotNull)
      .select(col(langCol).as("lang"),
        explode(org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.CharTrigrams(
            org.apache.spark.sql.graftbridge.Bridge.expression(col(textCol))))).as("gram"))
    val cl = grams.groupBy("lang", "gram").agg(count(lit(1)).as("c_lang"))
    val ca = cl.groupBy("gram").agg(sum("c_lang").as("c_all"))
    // integral DIV, not float division + floor: exact at any count
    // magnitude (a 100 TB corpus's gram counts would exceed a double's
    // 2^53 integer range)
    val d = expr("c_lang * CAST(1000000 AS BIGINT) DIV c_all")
    cl.join(ca, "gram")
      .withColumn("rank", row_number().over(Window.partitionBy("lang")
        .orderBy(d.desc, col("c_lang").desc, col("gram").asc)))
      .where(col("rank") <= gramsPerLang)
      .select(col("lang"), col("gram"), col("c_lang"), col("c_all"), col("rank"))
  }

  /** Collect a [[langProfileFit]] relation into the profile shape
    * [[langIdNgram]] serves from — a bounded model collect (languages
    * × gramsPerLang rows), the [[graft.operators.BpeTokenizer]]
    * stance: fit distributed, model small, serve codegen'd.
    */
  def collectLangProfiles(profileRel: DataFrame): Seq[(String, Seq[String])] =
    profileRel.select(col("lang"), col("gram"), col("rank"))
      .collect()
      .map(r => (r.getString(0), r.getInt(2), r.getString(1)))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (l, rows) => (l, rows.sortBy(_._2).map(_._3).toSeq) }

  /** The argmax half of [[langIdNgram]] on ALREADY-COMPUTED score
    * columns. Use this staged form when the scores are also emitted as
    * output columns (or the text is long): the when-chain references
    * each score ~7 times, and handing it attribute REFERENCES instead
    * of score expressions keeps Catalyst from inlining the whole
    * substring-count tree into every branch — project the scores
    * first (CollapseProject leaves multiply-referenced non-trivial
    * aliases staged), then call this on the columns.
    */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    require(scores.nonEmpty, "langIdFromScores needs at least one language score")
    val m = scores.map(_._2).reduceLeft((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, sc), acc) =>
      when(m > 0 && sc === m, lit(l)).otherwise(acc)
    }
  }

  /** Duplicate word-bigram fraction: 1 - distinct/total 2-grams — the
    * Gopher-style repetition rule (boilerplate, keyword stuffing and
    * decoding loops repeat n-grams far above natural text). Docs with
    * fewer than two tokens have no bigrams and score 0.
    *
    * A native one-pass expression
    * ([[graft.expressions.BigramRepetitionRatio]]): the composed
    * transform/array_distinct form is CodegenFallback, and the quality
    * gate's `keep` predicate inlines this signal — pushed through a
    * join into a scan filter, the fallback dropped the filter out of
    * whole-stage codegen at ~1 ms/doc interpreted.
    */
  def bigramRepetitionRatio(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.BigramRepetitionRatio(
        org.apache.spark.sql.graftbridge.Bridge.expression(tokens(text))))

  /** Unicode NFC canonical normalization (native codegen'd
    * [[graft.expressions.NormalizeNfc]]) — run this BEFORE content
    * hashing or shingling: precomposed and decomposed spellings of the
    * same visible text otherwise hash apart and survive exact dedup as
    * distinct documents. Cross-engine replayable (UAX #15 is a
    * standard mapping).
    */
  def normalizeNfc(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.NormalizeNfc(
        org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** Accent stripping (NFD + combining-mark removal, native
    * [[graft.expressions.StripAccents]]) — the looser normalization a
    * fuzzy-matching or search pipeline applies so 'café' blocks with
    * 'cafe'.
    */
  def stripAccents(text: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.StripAccents(
        org.apache.spark.sql.graftbridge.Bridge.expression(text)))

  /** HTML/boilerplate text extraction — the corpus FRONT DOOR of a
    * web-crawl curation run: every quality signal, dedup fingerprint,
    * and token count downstream assumes prose, and raw crawl payloads
    * are markup. One codegen'd chain of `regexp_replace` passes (the
    * [[graft.operators.Curation.redactPii]] stance — RE2-compatible
    * patterns, no UDF, replayable verbatim by the oracle engine):
    *
    *  1. `<script>`/`<style>` elements drop WITH their content (code
    *     and CSS are not prose; lazy `.*?` bodies keep the match
    *     linear), then comments, then every remaining tag — each
    *     replaced by a space so `a<br>b` cannot weld into `ab`;
    *  2. the universal named entities decode (`&lt; &gt; &quot;
    *     &#39; &apos; &nbsp;`), with `&amp;` decoded LAST — the
    *     standard order that keeps a literal `&amp;lt;` from
    *     double-decoding into `<`;
    *  3. whitespace collapses to single spaces and trims.
    *
    * Truncated or malformed markup degrades gracefully: an unclosed
    * tag's remainder reads as text, never an error — crawl payloads
    * are routinely cut mid-tag.
    */
  def extractText(html: Column): Column = {
    val unScripted = regexp_replace(
      regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " "),
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val unTagged = regexp_replace(
      regexp_replace(unScripted, "(?s)<!--.*?-->", " "),
      "(?s)<[^>]+>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&apos;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&"
    ).foldLeft(unTagged) { case (c, (entity, plain)) =>
      regexp_replace(c, entity, plain)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** The lowercased host of a URL — userinfo (`user:pass@`) skipped,
    * port dropped, bracketed IPv6 literals kept whole — the grouping
    * key for per-domain caps
    * ([[graft.operators.Curation.capPerGroup]]), domain mixes, and
    * crawl politeness stats. Empty string for anything without a
    * `scheme://` prefix.
    */
  def urlHost(url: Column): Column =
    lower(regexp_replace(
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)", 1),
      ":[0-9]*$", ""))

  /** The RFC 3986 §6.2.2 percent-encoding normalization table, exposed
    * so the DuckDB oracle can be GENERATED from the same data: first
    * every hex escape's digits uppercase (`%2f` → `%2F`; two plain
    * substring passes — first digit, then second digit behind the
    * now-uppercase first), then every UNRESERVED character's escape
    * decodes (`%41` → `A`, `%7E` → `~`). Reserved escapes (`%2F`,
    * `%3A`, UTF-8 multibyte) survive — decoding those would change
    * which URL the string names. Plain `replace` pairs, applied left
    * to right: no regex at all, so Spark and a replaying engine cannot
    * disagree on syntax. DELIBERATE tradeoff: a `%` is always treated
    * as starting an escape, so a MALFORMED sequence (`%ax`, second
    * char not a hex digit) still gets its leading `%a` uppercased — a
    * bare `%` in a URL is invalid per RFC 3986 anyway, and uniform
    * treatment keeps the table kind (plain substring pairs) replayable
    * by any engine, where strict valid-triplet matching would need
    * lookahead or replacement backreferences, both banned here. The
    * same tradeoff means decodes can CASCADE on malformed input: in
    * `%7%45`, the `%45` pair decodes to `E`, synthesizing a `%7E` the
    * original never spelled, which a LATER pair then decodes to `~`;
    * in `%3%34`, the `%34` pair re-synthesizes an occurrence of its
    * OWN pattern, which survives the pass (no pair ordering can fix a
    * self-cascade, so applying the table twice can decode further) —
    * for a malformed-`%` string the result is not always a single-pass
    * decode of the original escapes, nor always a fixed point. This
    * only ever fires behind an invalid bare `%`; it is deterministic
    * (fixed pair order) and engine-consistent (the oracle replays the
    * same pairs in the same order), and on WELL-FORMED input — every
    * `%` starting a valid hex triplet — normalization is idempotent
    * (PropertySpec pins the law, plus golden outputs for the
    * malformed cascades).
    */
  def pctNormalizePairs: Seq[(String, String)] = {
    val hex = "0123456789ABCDEF"
    val upperFirst = ('a' to 'f').map(c => (s"%$c", s"%${c.toUpper}"))
    val upperSecond = for (x <- hex; c <- 'a' to 'f') yield (s"%$x$c", s"%$x${c.toUpper}")
    val unreserved = (('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9') ++ Seq('-', '.', '_', '~'))
      .map(ch => (f"%%${ch.toInt}%02X", ch.toString))
    upperFirst ++ upperSecond ++ unreserved
  }

  /** Percent-encoding normalization ([[pctNormalizePairs]] applied in
    * order): `%7E` and `%7e` both become `~`, `%2f` becomes `%2F` —
    * the RFC 3986 §6.2.2 step that stops two spellings of one page
    * surviving as distinct dedup keys. Escapes never produce `%`, `?`,
    * `&`, or `#` (those are reserved and kept encoded), so this is
    * safe to run on a path+query string before separator-based
    * surgery.
    */
  def normalizePctEncoding(s: Column): Column =
    pctNormalizePairs.foldLeft(s) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }

  /** Crawl-URL canonicalization — the dedup key a web pipeline uses so
    * `HTTP://Example.COM:80/a?utm_source=x#top` and
    * `http://example.com/a` count as ONE page. Scheme and host
    * lowercase (path/query case is significant and kept), userinfo
    * (`user:pass@`) drops (it never identifies a distinct page, and a
    * dedup key should not embed credentials), default ports drop
    * (:80 for http, :443 for https — bracketed IPv6 hosts included),
    * the fragment drops, `utm_*` tracking parameters drop FROM THE
    * QUERY ONLY (the path is split off first, so a literal `&utm_` in
    * a path segment survives; a `utm_` inside another parameter's
    * VALUE is the one ambiguity a regex normalizer cannot resolve
    * without full parsing), percent-encoding normalizes per RFC 3986
    * §6.2.2 ([[normalizePctEncoding]]: unreserved escapes decode —
    * `%7E` → `~` — and surviving escapes uppercase their hex digits,
    * so `a%2fb` and `a%2Fb` share one key), and an empty path becomes
    * `/` whether or not a query follows. Non-URL strings pass through
    * unchanged. All steps are RE2-compatible extract/replace chains
    * with NO replacement backreferences — Spark (`$1`) and RE2 (`\1`)
    * disagree on backreference syntax, so avoiding them is what keeps
    * the operator replayable verbatim by an RE2-based engine.
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(
      url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    // percent-encoding normalizes BEFORE the path/query split: escapes
    // never encode to `?`/`&`/`#` (reserved stays encoded), so the
    // split is unaffected and one replace chain covers both halves
    val restN = normalizePctEncoding(rest)
    // path/query split BEFORE any utm surgery: the tracking passes
    // must never see the path, where `?` and `&` are ordinary chars
    val path = regexp_extract(restN, "^([^?]*)", 1)
    val query = regexp_extract(restN, "^[^?]*(\\?.*)$", 1)
    // tracking-parameter removal in separator-safe passes: `&utm_...`
    // drops wherever it sits, then a LEADING utm with a successor
    // donates its `?` to that successor, then a lone leading utm and
    // any dangling separator drop
    val cleanedQuery = regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      query, "&utm_[A-Za-z0-9_]*=[^&]*", ""),
      "^\\?utm_[A-Za-z0-9_]*=[^&]*&", "?"),
      "^\\?utm_[A-Za-z0-9_]*=[^&]*$", ""),
      "[?&]$", "")
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host,
        when(path === "", lit("/")).otherwise(path), cleanedQuery))
  }

  /** Fraction of characters that are ASCII letters or spaces — a cheap
    * symbol-soup / binary-junk detector (low alpha ratio -> likely not
    * prose). Empty strings score 0.
    */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      round(length(regexp_replace(text, "[^A-Za-z ]", "")).cast("double")
        / length(text).cast("double"), 6))

  /** Per-document Shannon entropy (bits) of the word distribution:
    * log2(n) - sum(c*log2(c))/n over word counts. Low entropy = heavy
    * repetition; high entropy ~ natural prose. This is the one text
    * signal that needs per-document token COUNTS, so it is an
    * explode + two-level hash aggregate over (doc, word) — map-side
    * combinable, state O(distinct words per doc), the distributed shape
    * that survives a 100 TB corpus (a per-row higher-order-function
    * scan would be interpreted, quadratic in distinct words, and
    * codegen-hostile).
    */
  def wordEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(idCol, "w")
      .agg(count(lit(1)).as("c"))
      .groupBy(idCol)
      .agg(
        round(
          log2(sum("c")) - sum(col("c").cast("double") * log2(col("c"))) / sum("c"),
          6).as("entropy"))

  /** Context-length chunking: split each document into consecutive
    * `chunkTokens`-token pieces — the step before tokenization in a
    * training pipeline. One narrow explode per doc (ceil(n/chunk) rows),
    * no shuffle: output carries (id, chunk_id, n_tokens, chunk_text)
    * with chunk_id dense from 0 so (id, chunk_id) is a stable global
    * key for downstream shuffles/writes. The final chunk keeps the
    * remainder (no padding, no drop).
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String, chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val c = chunkTokens
    val out = docs
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("chunk_id",
        explode(sequence(lit(0L), ceil(size(col("tk")) / lit(c.toDouble)).cast("long") - 1)))
    val piece = slice(col("tk"), (col("chunk_id") * c + 1).cast("int"), lit(c))
    out.select(
      col(idCol), col("chunk_id"),
      size(piece).as("n_tokens"),
      concat_ws(" ", piece).as("chunk_text"))
  }

  /** Overlapping (STRIDED) chunking — the retrieval/packing
    * convention [[chunkTokens]] cannot express: windows of
    * `chunkTokens` tokens start every `stride` tokens, so consecutive
    * chunks share `chunkTokens - stride` tokens of context and no
    * sentence is ever orphaned at a hard boundary. Window k covers
    * tokens [k·stride, k·stride + chunkTokens); the window count is 1
    * for documents that fit one window, else
    * ceil((n - chunkTokens) / stride) + 1 — the smallest set that
    * covers every token, with the LAST window always contributing
    * tokens no predecessor carried (its start is the first stride
    * multiple ≥ n - chunkTokens). `stride = chunkTokens` degenerates
    * to exactly [[chunkTokens]]' disjoint pieces. Same execution
    * shape: one narrow explode per doc, no shuffle, (id, chunk_id)
    * dense from 0 as a stable global key.
    */
  def chunkTokensStrided(
      docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens]; got stride=$stride, chunkTokens=$chunkTokens")
    val c = chunkTokens
    val n = size(col("tk"))
    val nChunks = when(n <= c, lit(1L))
      .otherwise(ceil((n - c).cast("double") / lit(stride.toDouble)).cast("long") + 1L)
    val out = docs
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .withColumn("chunk_id", explode(sequence(lit(0L), nChunks - 1)))
    val piece = slice(col("tk"), (col("chunk_id") * stride + 1).cast("int"), lit(c))
    out.select(
      col(idCol), col("chunk_id"),
      size(piece).as("n_tokens"),
      concat_ws(" ", piece).as("chunk_text"))
  }

  /** Stable content fingerprint (md5 hex) for exact dedup. */
  def fingerprint(text: Column): Column = md5(text.cast("binary"))

  /** Rolling-hash document fingerprint over word 2-shingles: md5 of the
    * lexicographically smallest shingle hash — stable under word order
    * permutations only when content matches, cheap to compute.
    */
  def shingleFingerprint(text: Column): Column = {
    val t = tokens(text)
    when(size(t) < 2, md5(text.cast("binary"))).otherwise(
      array_min(transform(
        sequence(lit(1), size(t) - 1),
        i => md5(concat_ws(" ", element_at(t, i), element_at(t, i + 1)).cast("binary"))
      ))
    )
  }
}
