package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTokenizer

/** Learned-subword (BPE) tokenizer: training procedure and native
  * encoder, checked against a hand-computed merge sequence.
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the hand-computed merge sequence on the classic corpus") {
    // words: low x3, lower x2. Hand-run of Sennrich's procedure with
    // the lexicographic-min tiebreak:
    //   counts (l,o)=5 (o,w)=5 (w,</w>)=3 (w,e)=2 (e,r)=2 (r,</w>)=2
    //   -> (l,o) by tiebreak, then (lo,w), (low,</w>), then the 2-count
    //   tier resolves lexicographically: (e,r), (er,</w>), (low,er</w>)
    val d = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(d, "doc_id", "text", numMerges = 10)
    assert(merges.toSeq == Seq(
      ("l", "o"), ("lo", "w"), ("low", "</w>"),
      ("e", "r"), ("er", "</w>"), ("low", "er</w>")),
      s"got ${merges.toSeq}")
    // early stop: after every repeated pair is merged, no pair occurs
    // twice — the trainer must not pad to numMerges with singletons
    assert(merges.length == 6)
  }

  test("encode applies merges greedily by rank; unseen chars stay open-vocabulary") {
    val d = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(d, "doc_id", "text", numMerges = 10)
    val toks = Seq("low lower lowest").toDF("text")
      .select(BpeTokenizer.encode(col("text"), merges))
      .head().getSeq[String](0)
    // "low" and "lower" collapse to single learned tokens; "lowest"
    // reuses the "low" prefix merge and falls back to characters for
    // the unseen suffix — no OOV, ever
    assert(toks == Seq("low</w>", "lower</w>", "low", "e", "s", "t", "</w>"), s"got $toks")
    // token counting for budget/packing surfaces
    val n = Seq("low lower lowest").toDF("text")
      .select(BpeTokenizer.tokenCount(col("text"), merges)).head().getInt(0)
    assert(n == 7)
    // null text: null out, not a crash or empty stream
    val nullRow = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
      .select(BpeTokenizer.encode(col("text"), merges)).head()
    assert(nullRow.isNullAt(0))
  }

  test("training is deterministic and the encoder roundtrips the real corpus") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.where(col("doc_id") % 2 === 0)
    val m1 = BpeTokenizer.train(ref, "doc_id", "text", numMerges = 100)
    val m2 = BpeTokenizer.train(ref, "doc_id", "text", numMerges = 100)
    assert(m1.toSeq == m2.toSeq, "same sample produced different merge lists")
    assert(m1.length == 100, s"corpus should support 100 merges, got ${m1.length}")
    // lossless segmentation: tokens concatenate back to the word stream
    val bad = docs.where(col("text").isNotNull)
      .select(col("doc_id"),
        concat_ws("", BpeTokenizer.encode(col("text"), m1)).as("joined"),
        concat_ws("", expr("transform(filter(split(text, ' '), w -> w != ''), w -> concat(w, '</w>'))")).as("expected"))
      .where(col("joined") =!= col("expected"))
      .count()
    assert(bad == 0, s"$bad docs failed the BPE roundtrip")
    // and merges genuinely compress: learned-token count strictly below
    // the character-fallback count on the corpus
    val counts = docs.where(col("text").isNotNull)
      .agg(
        sum(size(BpeTokenizer.encode(col("text"), m1))).as("bpe"),
        sum(size(BpeTokenizer.encode(col("text"), Array.empty[(String, String)]))).as("chars"))
      .head()
    assert(counts.getLong(0) < counts.getLong(1) / 2,
      s"100 merges should at least halve the char-level stream: ${counts.toSeq}")
  }

  test("budget and packing compose with BPE-denominated token counts") {
    import graft.operators.Curation
    // 3 docs per stratum; with the learned merges each "low low ..."
    // doc costs far fewer BPE tokens than characters, so a budget in
    // BPE units admits docs a char-level budget would reject
    val d = Seq(
      (1L, "low low low low", "en"),
      (2L, "low lower low lower", "en"),
      (3L, "lower lower lower lower", "en")
    ).toDF("doc_id", "text", "lang")
    val merges = BpeTokenizer.train(d, "doc_id", "text", numMerges = 10)
    val bpeCount: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      BpeTokenizer.tokenCount(_, merges)
    // each doc = 4 words = 4 single learned tokens -> budget 8 admits 2
    val kept = Curation.tokenBudgetSample(d, "doc_id", "text", "lang", 8L, bpeCount)
      .collect()
    assert(kept.length == 2, s"got ${kept.toSeq}")
    assert(kept.forall(_.getInt(2) == 4), s"learned tokens per doc should be 4: ${kept.toSeq}")
    // packing in the same denomination: gapless prefix sums of the
    // BPE counts, cut at a 5-token context
    val packed = Curation.packSequences(d, "doc_id", "text", "lang", 5, bpeCount)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getLong(3))).toMap
    assert(packed.values.map(_._1).sum == 12)
    val starts = packed.values.map(_._2).toSeq.sorted
    assert(starts == Seq(0L, 4L, 8L), s"stream not gapless in BPE units: $packed")
  }

  test("trained artifacts roundtrip through parquet: merges and classifier model") {
    import org.apache.spark.sql.functions.col
    // BPE merges: rank order IS priority — the roundtrip must encode
    // identically, including multi-char learned symbols
    val d = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = BpeTokenizer.train(d, "doc_id", "text", numMerges = 10)
    val mPath = java.nio.file.Files.createTempDirectory("graft_bpe").resolve("merges").toString
    BpeTokenizer.save(merges, spark, mPath)
    val reloaded = BpeTokenizer.load(spark, mPath)
    assert(reloaded.toSeq == merges.toSeq)
    val before = Seq("low lower lowest").toDF("text")
      .select(BpeTokenizer.encode(col("text"), merges)).head().getSeq[String](0)
    val after = Seq("low lower lowest").toDF("text")
      .select(BpeTokenizer.encode(col("text"), reloaded)).head().getSeq[String](0)
    assert(after == before)

    // classifier model: scores after reload are bit-identical
    import graft.operators.QualityClassifier
    val train = Seq((1L, "good clean text", 1), (2L, "spam spam spam", 0)).toDF("doc_id", "text", "label")
    val model = QualityClassifier.train(train, "doc_id", "text", "label", numFeatures = 64)
    val cPath = java.nio.file.Files.createTempDirectory("graft_clf").resolve("model").toString
    QualityClassifier.save(model, spark, cPath)
    val back = QualityClassifier.load(spark, cPath)
    assert(back.bias == model.bias && back.weights.sameElements(model.weights))
    val texts = Seq("good clean text", "spam spam spam", "never seen words").toDF("text")
    val s1 = texts.select(QualityClassifier.score(col("text"), model)).collect().map(_.getDouble(0)).toSeq
    val s2 = texts.select(QualityClassifier.score(col("text"), back)).collect().map(_.getDouble(0)).toSeq
    assert(s1 == s2)
  }

  test("supplementary-plane characters stay whole symbols") {
    val emoji = new String(Character.toChars(0x1F600))
    val toks = Seq(s"$emoji$emoji ok").toDF("text")
      .select(BpeTokenizer.encode(col("text"), Array.empty[(String, String)]))
      .head().getSeq[String](0)
    assert(toks == Seq(emoji, emoji, "</w>", "o", "k", "</w>"), s"got $toks")
  }
}
