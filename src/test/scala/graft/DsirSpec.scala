package graft

import org.apache.spark.sql.functions._
import graft.operators.Dsir

/** DSIR importance-resampling tier: hashed n-gram likelihood-ratio
  * weights and both selection rules on crafted corpora.
  */
class DsirSpec extends SparkTestBase {
  import spark.implicits._

  // raw corpus: 0-1 read like the target, 2-3 diverge, 4 is empty-ish
  private val raw = Seq(
    (0L, "spark engines process data with spark pipelines"),
    (1L, "data pipelines process spark data"),
    (2L, "zzz qqq vvv kkk jjj xxx"),
    (3L, "qqq zzz kkk vvv xxx jjj"),
    (4L, " ")
  ).toDF("doc_id", "text")

  private val target = Seq(
    (100L, "spark pipelines process data"),
    (101L, "spark data engines process pipelines"),
    (102L, "process data with spark")
  ).toDF("doc_id", "text")

  test("feature counts: unigrams plus bigrams, split artifacts dropped, bucket-bounded") {
    val counts = Dsir.hashedFeatureCounts(raw, "doc_id", "text", numBuckets = 64)
    val total = counts.agg(sum("c")).collect()(0).getLong(0)
    // docs 0-3: n tokens -> n unigrams + (n-1) bigrams; doc 4 splits to
    // two empty strings -> 0 non-empty unigrams BUT 1 bigram (" " -> one
    // bigram of two empties is produced from the 2-element array)
    val expected = Seq(7, 5, 6, 6).map(n => n + (n - 1)).sum + 0 + 1
    assert(total == expected, s"total $total != $expected")
    assert(counts.count() <= 64)
  }

  test("importance weights rank target-like docs above divergent ones") {
    val tgt = Dsir.hashedFeatureCounts(target, "doc_id", "text", numBuckets = 1024)
    val rawC = Dsir.hashedFeatureCounts(raw, "doc_id", "text", numBuckets = 1024)
    val w = Dsir.importanceWeights(raw, "doc_id", "text", tgt, rawC, numBuckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(0L) > w(2L) && w(1L) > w(3L),
      s"target-like docs must outscore divergent ones: $w")
    // weights are finite even for docs whose features the target never saw
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("selectTopK equals the weight relation's (log2_w desc, id) prefix") {
    val tgt = Dsir.hashedFeatureCounts(target, "doc_id", "text", numBuckets = 1024)
    val rawC = Dsir.hashedFeatureCounts(raw, "doc_id", "text", numBuckets = 1024)
    val byWeight = Dsir.importanceWeights(raw, "doc_id", "text", tgt, rawC, numBuckets = 1024)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
      .sortBy { case (id, w) => (-w, id) }
      .map(_._1).take(3).toSeq
    val sel = Dsir.selectTopK(raw, "doc_id", "text", target, k = 3, numBuckets = 1024)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(sel.map(_._2).toSeq == Seq(1, 2, 3), s"ranks must be contiguous: ${sel.toSeq}")
    assert(sel.map(_._1).toSeq == byWeight,
      s"bounded top-k must equal the sorted-weights prefix: ${sel.toSeq} vs $byWeight")
    val again = Dsir.selectTopK(raw, "doc_id", "text", target, k = 3, numBuckets = 1024)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(sel.toSeq == again.toSeq, "selection must be run-deterministic")
  }

  test("native bucket expression matches the composed md5/conv form, multibyte included") {
    val docs = Seq(
      (0L, "the quick brown fox the quick"),
      (1L, "héllo wörld ünïcode tæxt héllo"),   // multibyte UTF-8 tokens
      (2L, "a  b"),                              // doubled space: empty-token artifacts
      (3L, "solo"),
      (4L, " ")
    ).toDF("doc_id", "text")
    val nb = 64
    val native = Dsir.hashedFeatureCounts(docs, "doc_id", "text", nb)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val toks = docs.where(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val composed = toks.select(explode(concat(
        filter(col("toks"), t => length(t) > 0),
        when(size(col("toks")) >= 2,
          expr("transform(sequence(0, size(toks) - 2), i -> concat(toks[i], ' ', toks[i + 1]))"))
          .otherwise(expr("CAST(array() AS ARRAY<STRING>)")))).as("g"))
      .select((conv(substring(md5(col("g").cast("binary")), 1, 8), 16, 10).cast("long") % nb).cast("int").as("b"))
      .groupBy("b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(native == composed, s"native $native vs composed $composed")
  }

  test("gumbelResample is retry-deterministic and weight-biased") {
    val a = Dsir.gumbelResample(raw, "doc_id", "text", target, k = 3, numBuckets = 1024)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val b = Dsir.gumbelResample(raw, "doc_id", "text", target, k = 3, numBuckets = 1024)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(a == b, "hash-seeded gumbel draw must be reproducible")
    assert(a.length == 3 && a.map(_._2) == Seq(1, 2, 3))
    // with weight gaps this large the perturbation cannot promote the
    // divergent docs past BOTH target-like ones
    assert(a.map(_._1).toSet.intersect(Set(0L, 1L)).nonEmpty)
  }
}
