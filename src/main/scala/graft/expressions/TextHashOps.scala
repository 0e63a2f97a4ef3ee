package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the per-row text-hash expressions.
  *
  * MessageDigest is not thread-safe and expression instances are shared
  * across an executor's task threads (whole-stage codegen keeps them in
  * the plan's references array), so digests live in a ThreadLocal.
  */
private[expressions] object TextHash {
  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** A reset, thread-confined MD5 instance. */
  def md5(): MessageDigest = { val d = digests.get(); d.reset(); d }
}

/** MinHash signature of a token array, computed in one pass per row.
  *
  * Semantics match the SQL form the DuckDB oracle uses: ONE md5 per
  * word 2-shingle, split into two unsigned 32-bit halves `h1`/`h2`
  * (hex digits 1-8 and 9-16), from which signature i is
  * `min((h1 + i*h2) mod 2^32)` over the doc's shingles — the classic
  * Kirsch-Mitzenmacher double-hashing family: k independent-enough
  * hash functions for the price of one strong digest. Duplicate
  * shingles cannot change a min, so no distinct pass is needed. Rows
  * with fewer than two tokens have no shingles and yield an EMPTY
  * array — callers filter `size(...) > 0` to reproduce the
  * explode+groupBy behavior of dropping such docs.
  *
  * Exists because the compositional plan (HOF shingle transform →
  * explode → k-way min/md5 hash aggregate) allocates an exploded row
  * per shingle and a per-doc aggregation buffer — at corpus scale that
  * is GC pressure and a shuffle for what is per-row arithmetic. Here
  * the whole signature is a narrow projection: no explode, no shuffle,
  * one digest per shingle (the earlier salted form paid k digests per
  * shingle — at 100 TB the hash pass IS the corpus scan, so k-fold
  * fewer digests is a k-fold cheaper scan), and numeric signatures so
  * downstream band keys shuffle as longs, not 32-char hex strings.
  *
  * Reference behavior: minhash over shingles with k salted hash
  * functions (reference: src/combiners/distinct.rs zero-seeded hashing
  * stance; LSH pipeline in SURVEY §2 pipeline tier).
  */
case class MinHashSignatures(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var any = false
    // a null token yields null shingles (concat-with-null semantics in
    // the composed form), which min() ignores — skip them here too
    var prev = if (input.isNullAt(0)) null else input.getUTF8String(0).getBytes
    var k = 1
    while (k < n) {
      val cur = if (input.isNullAt(k)) null else input.getUTF8String(k).getBytes
      if (prev != null && cur != null) {
        val d = TextHash.md5()
        d.update(prev)
        d.update(' '.toByte)
        d.update(cur)
        val dig = d.digest()
        // unsigned 32-bit halves of the first 8 digest bytes, exactly
        // the oracle's CAST('0x' || substr(md5(sh), 1|9, 8) AS BIGINT)
        val h1 = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) | ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
        val h2 = ((dig(4) & 0xFFL) << 24) | ((dig(5) & 0xFFL) << 16) | ((dig(6) & 0xFFL) << 8) | (dig(7) & 0xFFL)
        any = true
        var i = 0
        var v = h1
        while (i < numHashes) {
          val m = v & 0xFFFFFFFFL
          if (m < mins(i)) mins(i) = m
          v += h2
          i += 1
        }
      }
      prev = cur
      k += 1
    }
    // all shingles null -> no signature; treat like a <2-token doc
    if (!any) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](numHashes)
    var i = 0
    while (i < numHashes) { out(i) = mins(i); i += 1 }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhash", this, classOf[MinHashSignatures].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All character trigrams of a string, in order — the gram generator
  * behind [[graft.functions.TextFunctions.langProfileFit]]'s
  * per-language counting. Exists because the compositional form
  * (`transform(sequence(...), i -> substring(t, i, 3))`) is a
  * CodegenFallback higher-order function — interpreted per element —
  * and the explode-the-positions rewrite copies the WHOLE document
  * string into every generated row; both benched several times slower
  * than the replaying DuckDB oracle on the corpus-wide fit. One pass
  * records each character's byte offset, then every trigram is a
  * zero-walk byte-slice view — O(n) per document, codegen'd. Fewer
  * than three characters yields an empty array (matching
  * `generate_series(1, n-2)` emptiness, never a descending sequence).
  */
case class CharTrigrams(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_char_trigrams expects string, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_char_trigrams"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    // ONE pass records every character's byte offset (UTF-8 aware, so
    // CJK profile grams count as single characters exactly like
    // substr/length in both engines); offs is sized to the byte count
    // — bounded, transient — to avoid a separate counting walk
    val offs = new Array[Int](bytes.length + 1)
    var pos = 0
    var nChars = 0
    while (pos < bytes.length) {
      offs(nChars) = pos
      pos += UTF8String.numBytesForFirstByte(bytes(pos))
      nChars += 1
    }
    offs(nChars) = bytes.length
    if (nChars < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nChars - 2)
    var i = 0
    while (i < nChars - 2) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + 3) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("charTrigrams", this, classOf[CharTrigrams].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Adjacent token pairs of a token array as (w1, w2) structs — the
  * word-bigram generator behind [[graft.operators.LangModel]]'s
  * training counts and scoring stream. Matches
  * `transform(sequence(0, size(toks) - 2), i -> struct(toks[i], toks[i + 1]))`
  * exactly (null tokens pass through as null struct fields; fewer than
  * two tokens yields an empty array). Exists because that composed
  * form is a CodegenFallback higher-order function — an interpreted
  * lambda per TOKEN on every corpus scan of the LM tier — where this
  * is one codegen'd pass building slice views.
  */
case class AdjacentPairs(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_adjacent_pairs expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(
    DataTypes.createStructType(Array(
      DataTypes.createStructField("w1", StringType, true),
      DataTypes.createStructField("w2", StringType, true))),
    containsNull = false)
  override def prettyName: String = "graft_adjacent_pairs"

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: UTF8String = if (input.isNullAt(0)) null else input.getUTF8String(0)
    var i = 1
    while (i < n) {
      val cur = if (input.isNullAt(i)) null else input.getUTF8String(i)
      out(i - 1) = org.apache.spark.sql.catalyst.InternalRow(prev, cur)
      prev = cur
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adjacentPairs", this, classOf[AdjacentPairs].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Summed non-overlapping occurrence count of a fixed gram set in a
  * string — the language-profile score
  * `sum over grams of (length(text) - length(replace(text, g, ''))) / len(g)`
  * without materializing a replaced COPY of the document per gram:
  * the composed form allocates grams-many document-sized strings per
  * row (25 per row for the 5-language default profiles — the dominant
  * cost and GC load of the language-ID projection), where this is
  * grams-many allocation-free scans. Semantics are exactly the
  * replace-count recipe the DuckDB oracle replays: non-overlapping
  * left-to-right matches (indexOf-then-skip-gram-length ≡ what
  * replace() removes), gram length in code points, null text -> null.
  */
case class GramCountSum(child: Expression, grams: Seq[String])
    extends UnaryExpression {
  require(grams.nonEmpty && grams.forall(_.nonEmpty),
    "graft_gram_count_sum needs a non-empty gram set of non-empty grams")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_count_sum expects string, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_gram_count_sum"

  // precomputed once per plan: the UTF8String needles. The scan mirrors
  // UTF8String.replace byte for byte: find() at byte positions, skip by
  // the needle's BYTE length on a match — the same non-overlapping
  // left-to-right matches replace() removes.
  @transient private lazy val needles: Array[UTF8String] =
    grams.map(UTF8String.fromString).toArray

  def compute(s: UTF8String): Long = {
    var sum = 0L
    var i = 0
    while (i < needles.length) {
      val g = needles(i)
      val gBytes = g.numBytes()
      var found = s.find(g, 0)
      while (found >= 0) {
        sum += 1L
        found = s.find(g, found + gBytes)
      }
      i += 1
    }
    sum
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramCountSum", this, classOf[GramCountSum].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Duplicate word-bigram fraction of a token array — `round(1 -
  * distinct_bigrams / total_bigrams, 6)`, 0.0 for fewer than two
  * tokens — the Gopher-style repetition quality signal, in ONE pass
  * per row with a single hash set.
  *
  * Exists because the compositional form (`transform(sequence(...))`
  * building a bigram string array, then `array_distinct` over it) is
  * CodegenFallback: any filter referencing it — and the quality gate's
  * `keep` predicate is exactly that, once Catalyst pushes it through a
  * join into the scan — drops the whole Filter out of whole-stage
  * codegen and evaluates per-row interpreted lambdas. Measured on the
  * sf0.1 curation capstone that made the pushed quality predicate
  * ~30x slower than the projection form (the predicate dominates the
  * chain: ~1 ms/doc interpreted vs ~30 us/doc here). Semantics match
  * the composed form exactly, including `concat_ws` null-skipping and
  * Spark's HALF_UP `round`.
  */
object BigramRepetitionRatio {
  // hoisted per-JVM: the expression exists to take per-row cost out of
  // the corpus-wide quality predicate, so it must not allocate the
  // constant separator per row itself
  private val Space: UTF8String = UTF8String.fromString(" ")
}

case class BigramRepetitionRatio(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_rep expects array<string>, got $t")
  }
  override def dataType: DataType = DataTypes.DoubleType
  override def prettyName: String = "graft_bigram_rep"

  def compute(input: ArrayData): Double = {
    val n = input.numElements()
    if (n < 2) return 0.0
    // concat_ws(" ", a, b) SKIPS null arguments: a bigram with a null
    // side degenerates to the other token alone (or "" for two nulls)
    val seen = new java.util.HashSet[UTF8String]()
    val space = BigramRepetitionRatio.Space
    val empty = UTF8String.EMPTY_UTF8
    var k = 1
    var prev = if (input.isNullAt(0)) null else input.getUTF8String(0)
    while (k < n) {
      val cur = if (input.isNullAt(k)) null else input.getUTF8String(k)
      val gram =
        if (prev != null && cur != null) UTF8String.concat(prev, space, cur)
        else if (prev != null) prev
        else if (cur != null) cur
        else empty
      seen.add(gram): Unit
      prev = cur
      k += 1
    }
    val total = (n - 1).toDouble
    java.math.BigDecimal.valueOf(1.0 - seen.size / total)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramRep", this, classOf[BigramRepetitionRatio].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash fingerprint of a token array, computed in one pass per row.
  *
  * Bit j of the fingerprint is set iff, summing +1/-1 per token
  * according to whether hex digit j of the token's md5 is in 8..f
  * (i.e. nibble >= 8), the sum is >= 0 — exactly the SQL the DuckDB
  * oracle runs (`substr(md5(tok), j+1, 1) IN ('8'..'f')`). Every token
  * occurrence counts (no dedup), matching explode-then-sum semantics.
  *
  * Replaces an explode + 16-column conditional-sum hash aggregate
  * (one exploded row and 16 string substrings per token, plus a
  * shuffle) with a narrow projection doing nibble math on the raw
  * digest bytes.
  */
case class SimHashFingerprint(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 32, s"simhash bits must be in 1..32, got $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_simhash"

  def compute(input: ArrayData): Int = {
    val counts = new Array[Int](bits)
    val n = input.numElements()
    var k = 0
    while (k < n) {
      if (input.isNullAt(k)) {
        // composed form: md5(null) -> null nibble test -> otherwise(-1)
        var j = 0
        while (j < bits) { counts(j) -= 1; j += 1 }
      } else {
        val d = TextHash.md5()
        d.update(input.getUTF8String(k).getBytes)
        val dig = d.digest()
        var j = 0
        while (j < bits) {
          val nib = if ((j & 1) == 0) (dig(j >> 1) >> 4) & 0xF else dig(j >> 1) & 0xF
          counts(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      }
      k += 1
    }
    var fp = 0
    var j = 0
    while (j < bits) {
      if (counts(j) >= 0) fp |= 1 << j
      j += 1
    }
    fp
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHashFingerprint].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hashed unigram+bigram feature buckets of a token array — the DSIR
  * feature sketch ([[graft.operators.Dsir]]) in ONE pass per row:
  * every non-empty token and every adjacent token pair (joined by a
  * single space) maps to `unsigned32(md5[0..3]) % numBuckets`, exactly
  * the oracle's `CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) %
  * numBuckets`, so the native path and the SQL replica bucket
  * identically byte for byte.
  *
  * Exists because the compositional form (filter + transform + concat
  * building a gram STRING array, then md5 → 32-hex-char string →
  * substring → conv base-16 parse per gram) materializes two strings
  * and a radix parse per feature — on a corpus scan the feature hash
  * IS the scan, and this expression does one thread-confined digest
  * per feature with the bigram digested as (tok, ' ', tok) updates,
  * no concat, no hex, no parse. Bigrams keep empty tokens (split()
  * artifacts) exactly like the composed form: only UNIGRAM empties are
  * dropped, so "a  b" still yields both degenerate bigrams.
  */
case class NgramFeatureBuckets(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets >= 2, s"numBuckets must be >= 2, got $numBuckets")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_buckets expects array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_ngram_buckets"

  private def bucketOf(d: MessageDigest): Int = {
    val dig = d.digest()
    val h = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
      ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
    (h % numBuckets).toInt
  }

  def compute(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](2 * n)
    // unigrams: non-empty tokens only (split() never emits nulls, but a
    // caller-built array might — skip nulls like the filtered form)
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val t = input.getUTF8String(i)
        if (t.numBytes() > 0) {
          val d = TextHash.md5()
          d.update(t.getBytes)
          out += bucketOf(d)
        }
      }
      i += 1
    }
    // bigrams: every adjacent pair, empties included (concat semantics)
    i = 1
    while (i < n) {
      if (!input.isNullAt(i - 1) && !input.isNullAt(i)) {
        val d = TextHash.md5()
        d.update(input.getUTF8String(i - 1).getBytes)
        d.update(' '.toByte)
        d.update(input.getUTF8String(i).getBytes)
        out += bucketOf(d)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramBuckets", this, classOf[NgramFeatureBuckets].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document DSIR score over the hashed unigram+bigram features, in
  * ONE pass per row: `struct(n_feats, score)` where score is the sum of
  * the precomputed per-bucket log-ratio table at each feature's bucket
  * ([[NgramFeatureBuckets]]'s md5-compatible bucketing, shared code).
  * The term table ships with the plan (numBuckets doubles — bounded
  * model state, the classifier-weights stance), so scoring a corpus is
  * a narrow codegen'd projection: no explode, no join, no shuffle.
  */
case class NgramLogRatioScore(child: Expression, term: Array[Double])
    extends UnaryExpression {
  require(term.length >= 2, s"term table must have >= 2 buckets, got ${term.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_score expects array<string>, got $t")
  }
  override def dataType: DataType = DataTypes.createStructType(Array(
    DataTypes.createStructField("n_feats", LongType, false),
    DataTypes.createStructField("score", DataTypes.DoubleType, false)))
  override def prettyName: String = "graft_ngram_score"

  private def bucketOf(d: MessageDigest): Int = {
    val dig = d.digest()
    val h = ((dig(0) & 0xFFL) << 24) | ((dig(1) & 0xFFL) << 16) |
      ((dig(2) & 0xFFL) << 8) | (dig(3) & 0xFFL)
    (h % term.length).toInt
  }

  def compute(input: ArrayData): Any = {
    val n = input.numElements()
    var cnt = 0L
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val t = input.getUTF8String(i)
        if (t.numBytes() > 0) {
          val d = TextHash.md5()
          d.update(t.getBytes)
          acc += term(bucketOf(d)); cnt += 1
        }
      }
      i += 1
    }
    i = 1
    while (i < n) {
      if (!input.isNullAt(i - 1) && !input.isNullAt(i)) {
        val d = TextHash.md5()
        d.update(input.getUTF8String(i - 1).getBytes)
        d.update(' '.toByte)
        d.update(input.getUTF8String(i).getBytes)
        acc += term(bucketOf(d)); cnt += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(cnt, acc)
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramScore", this, classOf[NgramLogRatioScore].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.compute($c);")
  }

  // the term table is semantic state, not identity: equal CONTENT must
  // canonicalize equal or subexpression elimination and exchange reuse
  // silently stop seeing through this node (same stance as PQOps)
  override def equals(other: Any): Boolean = other match {
    case that: NgramLogRatioScore =>
      child == that.child && java.util.Arrays.equals(term, that.term)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.hashCode(term)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
