package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training + application — the learned
  * subword layer a training-data pipeline uses for REAL token budgets
  * and sequence packing (the whitespace/regex counts in
  * [[graft.functions.TextFunctions]] are the cheap upper bound; model
  * context windows are measured in BPE tokens). Beyond the reference,
  * which has no tokenizer tier.
  *
  * The trainer is the classic Sennrich et al. 2016 procedure: words
  * become character sequences with an end-of-word marker, and the most
  * frequent adjacent symbol pair is merged repeatedly, each merge
  * recorded in rank order. Training runs driver-side over a BOUNDED
  * id-ordered sample — the industry stance (production tokenizers train
  * on a corpus sample, never the full crawl) and the same bounded-
  * collect contract as [[Similarity.trainCentroids]]. APPLICATION is
  * where corpus scale lives, and that is a narrow per-row native
  * expression ([[graft.expressions.BpeEncodeTokens]]) — no shuffle, no
  * state, embarrassingly parallel.
  *
  * Determinism: pair counts are exact integers; ties on the max count
  * break to the lexicographically smallest pair, so the merge list is a
  * pure function of the sample multiset.
  */
object BpeTokenizer {

  /** End-of-word marker appended to each word's final symbol sequence —
    * the standard `</w>` sentinel, letting a decoder recover word
    * boundaries from the flat token stream.
    */
  val EndOfWord = "</w>"

  /** Learn `numMerges` merges from a bounded id-ordered sample of the
    * corpus. Returns the ordered merge list (rank = position). Stops
    * early when no pair occurs at least twice — merging singletons
    * would just memorize the tail of the sample.
    */
  def train(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      sampleN: Int = 10000
  ): Array[(String, String)] = {
    require(numMerges >= 0, s"numMerges must be >= 0, got $numMerges")
    val texts = docs
      .where(col(textCol).isNotNull)
      .orderBy(col(idCol))
      .limit(sampleN)
      .select(col(textCol))
      .collect()
      .map(_.getString(0))

    // word frequencies over the sample
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(_.split(" ").foreach { w =>
      if (w.nonEmpty) wordFreq.updateWith(w)(c => Some(c.getOrElse(0L) + 1L))
    })

    // each distinct word as a mutable symbol sequence (chars + </w>)
    val words: Array[(scala.collection.mutable.ArrayBuffer[String], Long)] =
      wordFreq.toArray.sortBy(_._1).map { case (w, f) =>
        val syms = scala.collection.mutable.ArrayBuffer.from(w.map(_.toString))
        syms += EndOfWord
        (syms, f)
      }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      // exact adjacent-pair counts, weighted by word frequency
      val pairCount = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          pairCount.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      if (pairCount.isEmpty) done = true
      else {
        // max count, ties to the lexicographically smallest pair
        // order-independent despite HashMap iteration: strict-max with a
        // lexicographic-min tiebreak has one fixed point
        val (best, bestN) = pairCount.foldLeft(((("", "")), 0L)) {
          case ((bp, bn), (p, n)) =>
            if (n > bn || (n == bn && ordLt(p, bp))) (p, n) else (bp, bn)
        }
        if (bestN < 2L) done = true
        else {
          merges += best
          val joined = best._1 + best._2
          words.foreach { case (syms, _) =>
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == best._1 && syms(i + 1) == best._2) {
                syms(i) = joined
                syms.remove(i + 1)
                // a new merge can immediately chain with the previous
                // symbol; step back one so the scan sees it
                if (i > 0) i -= 1
              } else i += 1
            }
          }
          step += 1
        }
      }
    }
    merges.toArray
  }

  private def ordLt(a: (String, String), b: (String, String)): Boolean =
    if (a._1 != b._1) a._1 < b._1 else a._2 < b._2

  /** Persist a trained merge list as a tiny (rank, left, right) parquet
    * relation — the artifact a deployment trains once and every
    * batch/stream job loads, the same train-once/serve-everywhere shape
    * as [[Similarity.pqIndex]]. Rank order IS merge priority, so the
    * roundtrip must preserve it exactly ([[load]] re-sorts by rank).
    */
  def save(merges: Array[(String, String)], spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    import spark.implicits._
    merges.zipWithIndex
      .map { case ((l, r), rank) => (rank, l, r) }.toSeq
      .toDF("rank", "left", "right")
      .repartition(1)
      .write.parquet(path)
  }

  /** Load a merge list persisted by [[save]], in rank order. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Array[(String, String)] =
    spark.read.parquet(path)
      .orderBy(col("rank"))
      .collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right")))

  /** BPE token stream for a text column (array<string>; `</w>`-suffixed
    * symbols mark word ends) — the native per-row
    * [[graft.expressions.BpeEncodeTokens]] application of a trained
    * merge list.
    */
  def encode(text: Column, merges: Array[(String, String)]): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expressions.BpeEncodeTokens(
        org.apache.spark.sql.graftbridge.Bridge.expression(text), merges))

  /** Learned-subword token count per row — `size(encode(...))`, the
    * column a token-budget or packing stage feeds on when the budget is
    * denominated in MODEL tokens rather than whitespace words.
    */
  def tokenCount(text: Column, merges: Array[(String, String)]): Column =
    size(encode(text, merges))
}
