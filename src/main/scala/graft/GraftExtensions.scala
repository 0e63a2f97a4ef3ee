package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions.{BigramRepetitionRatio, CharTrigrams, CutSpannedTokens, FloatDotProduct, HyperplaneBuckets, MinHashSignatures, NgramFeatureBuckets, NormalizeNfc, RollingTokenHashes, SimHashFingerprint, SortedIntersectSize, StripAccents}

/** SparkSessionExtensions entry point: registers graft's native SQL
  * functions so they resolve by name in `spark.sql(...)` / `expr(...)`.
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}

object GraftFunctions {

  private type Builder = Seq[Expression] => Expression
  private type FunctionDesc = (FunctionIdentifier, ExpressionInfo, Builder)

  /** Arity-checked builder: a wrong argument count reports the function
    * name and expected arity instead of an opaque IndexOutOfBounds from
    * `children(1)` during analysis.
    */
  private def checked(name: String, arity: Int)(build: Builder): Builder = { children =>
    if (children.length != arity)
      throw new IllegalArgumentException(
        s"$name requires $arity arguments, got ${children.length}")
    build(children)
  }

  private def litInt(fn: String, arg: String)(e: Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: $arg must be an integer literal, got ${e.sql}")
    e.eval() match {
      // integral types only, within Int range — intValue on a Double or
      // oversized Long would silently truncate the sketch width
      case n: java.lang.Integer => n.intValue
      case n: java.lang.Short   => n.intValue
      case n: java.lang.Byte    => n.intValue
      case n: java.lang.Long if n.longValue == n.intValue.toLong => n.intValue
      case other =>
        throw new IllegalArgumentException(
          s"$fn: $arg must be an integer literal in Int range, got $other")
    }
  }

  private def desc(name: String, clazz: Class[_], arity: Int)(build: Builder): FunctionDesc = (
    FunctionIdentifier(name),
    new ExpressionInfo(clazz.getName, name),
    checked(name, arity)(build)
  )

  val dotFunction: FunctionDesc =
    desc("graft_dot", classOf[FloatDotProduct], 2)(c => FloatDotProduct(c(0), c(1)))

  val sortedIntersectSizeFunction: FunctionDesc =
    desc("graft_sorted_intersect_size", classOf[SortedIntersectSize], 2)(c =>
      SortedIntersectSize(c(0), c(1)))

  val minhashFunction: FunctionDesc =
    desc("graft_minhash", classOf[MinHashSignatures], 2)(c =>
      MinHashSignatures(c(0), litInt("graft_minhash", "numHashes")(c(1))))

  val simhashFunction: FunctionDesc =
    desc("graft_simhash", classOf[SimHashFingerprint], 2)(c =>
      SimHashFingerprint(c(0), litInt("graft_simhash", "bits")(c(1))))

  val hyperplaneBucketFunction: FunctionDesc =
    desc("graft_hyperplane_bucket", classOf[HyperplaneBuckets], 2)(c =>
      HyperplaneBuckets(c(0), litInt("graft_hyperplane_bucket", "numPlanes")(c(1))))

  val bigramRepFunction: FunctionDesc =
    desc("graft_bigram_rep", classOf[BigramRepetitionRatio], 1)(c =>
      BigramRepetitionRatio(c(0)))

  val cutSpansFunction: FunctionDesc =
    desc("graft_cut_spans", classOf[CutSpannedTokens], 3)(c =>
      CutSpannedTokens(c(0), c(1), litInt("graft_cut_spans", "spanTokens")(c(2))))

  val rollingSpanHashesFunction: FunctionDesc =
    desc("graft_rolling_span_hashes", classOf[RollingTokenHashes], 2)(c =>
      RollingTokenHashes(c(0), litInt("graft_rolling_span_hashes", "spanTokens")(c(1))))

  val ngramBucketsFunction: FunctionDesc =
    desc("graft_ngram_buckets", classOf[NgramFeatureBuckets], 2)(c =>
      NgramFeatureBuckets(c(0), litInt("graft_ngram_buckets", "numBuckets")(c(1))))

  val nfcFunction: FunctionDesc =
    desc("graft_nfc", classOf[NormalizeNfc], 1)(c => NormalizeNfc(c(0)))

  val stripAccentsFunction: FunctionDesc =
    desc("graft_strip_accents", classOf[StripAccents], 1)(c => StripAccents(c(0)))

  val charTrigramsFunction: FunctionDesc =
    desc("graft_char_trigrams", classOf[CharTrigrams], 1)(c => CharTrigrams(c(0)))

  /** Every graft function description — the single source both
    * registration paths share, so the SQL-extension and programmatic
    * routes cannot diverge.
    */
  val all: Seq[FunctionDesc] = Seq(
    dotFunction, sortedIntersectSizeFunction, minhashFunction,
    simhashFunction, hyperplaneBucketFunction, bigramRepFunction,
    cutSpansFunction, rollingSpanHashesFunction, ngramBucketsFunction,
    nfcFunction, stripAccentsFunction, charTrigramsFunction)

  /** Register on an already-built session (tests, spark-shell). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
}
