package graft

import graft.operators.Curation

/** Corpus-curation tier: quality gating, token budgets, mix rebalance. */
class CurationSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today", "en"),   // 10 tokens, clean
    (2L, "spam spam spam spam spam spam spam spam spam spam", "en"),   // repetitive
    (3L, "too short", "en"),                                           // below min tokens
    (4L, "$$ %% ## !! ?? ++ == ~~ ^^ || {} [] () << >> :: ;;", "en"),  // symbol soup
    (5L, "ein ganz normaler deutscher satz mit genau zehn kurzen woertern", "de")
  ).toDF("doc_id", "text", "lang")

  test("qualityFilter reports the first failing rule and keeps clean docs") {
    val out = Curation.qualityFilter(docs, "doc_id", "text", minTokens = 10, maxBigramRep = 0.2, minAlphaRatio = 0.8)
      .collect().map(r => r.getLong(0) -> (r.getLong(5), r.getString(4))).toMap
    assert(out(1L) == (1L, null))
    assert(out(2L) == (0L, "repetitive"))
    assert(out(3L) == (0L, "too_short"))
    assert(out(4L) == (0L, "symbol_soup"))
    assert(out(5L) == (1L, null))
  }

  test("langIdNgram predicts from char-n-gram profiles and composes with qualityFilter") {
    import org.apache.spark.sql.functions.col
    val texts = Seq(
      (1L, "the king stands at the bridge and the thing was singing"),
      (2L, "der schnelle hund und ein kleines licht in der nacht sich"),
      (3L, "en la casa de los grandes amigos de la montana"),
      (4L, "les amis et le jour sont arrives avant que la nuit lente"),
      (5L, "的是了不在的是了不在"),
      (6L, "zzz qqq xxx www")  // no profile gram at all -> undetermined
    ).toDF("doc_id", "text")
    val preds = texts
      .select(col("doc_id"),
        graft.functions.TextFunctions.langIdNgram(col("text")).as("lang_pred"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(preds == Map(1L -> "en", 2L -> "de", 3L -> "es", 4L -> "fr",
      5L -> "zh", 6L -> "und"), s"got $preds")
    // the multilingual gate a curation run branches on: quality signals
    // AND the language decision in one composed plan — keep clean
    // English rows only
    val gated = Curation.qualityFilter(docs, "doc_id", "text",
        minTokens = 10, maxBigramRep = 0.2, minAlphaRatio = 0.8)
      .join(docs.select(col("doc_id"),
        graft.functions.TextFunctions.langIdNgram(col("text")).as("lang_pred")), "doc_id")
      .where(col("keep") === 1 && col("lang_pred") === "en")
      .collect().map(_.getLong(0)).toSet
    // doc 1 is clean English; doc 5 is clean but predicts de (ein/und/
    // satz grams); 2-4 fail quality before language even matters
    assert(gated == Set(1L), s"got $gated")
  }

  test("langProfileFit learns discriminative trigrams and the learned profiles serve") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    // shared filler dominates RAW frequency in every language; only
    // the ownership-share ranking should surface the distinctive grams
    val corpus = Seq(
      (1L, "the king went to the market in the morning zzz", "en"),
      (2L, "the queen and the king at the harbour zzz", "en"),
      (3L, "der hund und der wagen in der nacht zzz", "de"),
      (4L, "der schnelle wind und der regen zzz", "de")
    ).toDF("doc_id", "t", "lang")
    val rel = TextFunctions.langProfileFit(corpus, "t", "lang", gramsPerLang = 3)
    val profiles = TextFunctions.collectLangProfiles(rel)
    assert(profiles.map(_._1) == Seq("de", "en"), s"langs: $profiles")
    val de = profiles.toMap.apply("de")
    val en = profiles.toMap.apply("en")
    // ownership share filters the shared ' zz'/'zzz' filler out of the
    // top ranks: every learned gram is exclusive to its language
    assert((de ++ en).forall(g => !g.contains("z")),
      s"shared filler leaked into the learned profiles: de=$de en=$en")
    // the learned profiles drive the serve path and recover the labels
    val preds = corpus.select(col("doc_id"), col("lang"),
        TextFunctions.langIdNgram(col("t"), profiles).as("p"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(preds.forall { case (_, (lang, p)) => lang == p }, s"got $preds")
    // rank determinism: the relation carries dense 1..k ranks per lang
    val ranks = rel.collect().map(r => (r.getString(0), r.getInt(4))).groupBy(_._1)
      .map { case (l, rs) => l -> rs.map(_._2).sorted.toSeq }
    assert(ranks == Map("de" -> Seq(1, 2, 3), "en" -> Seq(1, 2, 3)), s"got $ranks")
  }

  test("tokenBudgetSample keeps docs while the per-stratum running total fits") {
    // 3 docs of 4 tokens each in one stratum, budget 8 -> exactly 2 kept,
    // and WHICH two is fixed by md5 priority, not input order
    val d = Seq(
      (1L, "a b c d", "en"), (2L, "e f g h", "en"), (3L, "i j k l", "en"),
      (4L, "m n o p", "de")
    ).toDF("doc_id", "text", "lang")
    val kept = Curation.tokenBudgetSample(d, "doc_id", "text", "lang", 8L).collect()
    val byLang = kept.groupBy(_.getString(1))
    assert(byLang("en").length == 2)
    assert(byLang("de").length == 1)
    assert(kept.forall(_.getLong(3) <= 8L), "cumulative tokens exceed budget")
    // determinism: same selection when input order is reversed
    val keptRev = Curation.tokenBudgetSample(
      d.orderBy($"doc_id".desc), "doc_id", "text", "lang", 8L)
      .collect().map(_.getLong(0)).toSet
    assert(keptRev == kept.map(_.getLong(0)).toSet)
  }

  test("rebalanceMixByTokens budgets tokens, not documents") {
    // en: 6 docs x 10 tokens = 60; de: 4 docs x 5 tokens = 20
    // 50/50 target -> de binds: 20-token budget each -> all 4 de docs,
    // exactly 2 en docs
    val d = ((1L to 6L).map(i => (i, Seq.fill(10)("w").mkString(" "), "en")) ++
      (7L to 10L).map(i => (i, Seq.fill(5)("w").mkString(" "), "de")))
      .toDF("doc_id", "text", "lang")
    val out = Curation.rebalanceMixByTokens(d, "doc_id", "text", "lang",
      Map("en" -> 0.5, "de" -> 0.5)).collect()
    val tokensByLang = out.groupBy(_.getString(1)).view.mapValues(_.map(_.getInt(2)).sum).toMap
    assert(tokensByLang == Map("en" -> 20, "de" -> 20), s"got $tokensByLang")
    assert(out.count(_.getString(1) == "en") == 2)
    assert(out.count(_.getString(1) == "de") == 4)
  }

  test("redactPii replaces emails and IPv4 literals and counts removals") {
    val d = Seq(
      (1L, "contact bob@example.com or alice@test.org at 10.0.0.1"),
      (2L, "nothing sensitive here"),
      (3L, "server 192.168.1.100 responded")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L) == ("contact <EMAIL> or <EMAIL> at <IP>", 2, 1))
    assert(out(2L) == ("nothing sensitive here", 0, 0))
    assert(out(3L) == ("server <IP> responded", 0, 1))
  }

  test("decontaminate flags docs sharing n-grams with the benchmark") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over fences"),  // shares "the quick brown"+
      (2L, "completely unrelated text about engines"),
      (3L, "short one"),                              // too short for 3-grams
      (4L, "quick brown fox appears here too")        // shares "quick brown fox"
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the quick brown fox sentence")).toDF("bid", "btext")
    val out = Curation.decontaminate(corpus, "doc_id", "text", bench, "btext", n = 3, minHits = 1)
    val flagged = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flagged.keySet == Set(1L, 4L), s"got $flagged")
    assert(flagged(1L) == 2L, "doc 1 shares 'the quick brown' and 'quick brown fox'")
    // the benchmark gram set must be broadcast, never shuffled against the corpus
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"benchmark side not broadcast:\n$plan")
  }

  test("packSequences lays out a gapless per-stratum token stream cut at the context size") {
    val docs = Seq(
      (1L, "en", "a " * 299 + "end"),   // 300 tokens
      (2L, "en", "b " * 99 + "end"),    // 100 tokens
      (3L, "en", "c " * 499 + "end"),   // 500 tokens
      (4L, "zh", "d " * 49 + "end")     // 50 tokens, separate stratum
    ).toDF("doc_id", "lang", "text")
    val packed = graft.operators.Curation.packSequences(docs, "doc_id", "text", "lang", 256)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    // the stream is gapless: per stratum, sorted starts are the prefix
    // sums of the preceding docs (no padding, no overlap)
    val en = packed.collect { case (id, (l, n, start, _, _)) if l == "en" => (start, n, id) }.toSeq.sorted
    assert(en.head._1 == 0L)
    en.sliding(2).foreach {
      case Seq((s1, n1, _), (s2, _, _)) => assert(s2 == s1 + n1, "gap or overlap in the packed stream")
      case _ => ()
    }
    // bins: a doc spans exactly the context windows its token range covers
    packed.values.foreach { case (_, n, start, bin, nBins) =>
      assert(bin == start / 256)
      assert(nBins == (start + n - 1) / 256 - bin + 1)
    }
    // straddling happens (total 900 en tokens over 256-token contexts)
    assert(packed.values.exists(v => v._5 > 1), "expected at least one straddling doc")
    // strata pack independently: zh starts at its own zero
    assert(packed(4L)._3 == 0L && packed(4L)._4 == 0L)
  }

  test("packManifest slices straddling docs exactly across context windows") {
    val docs = Seq(
      (1L, "en", "a " * 299 + "end"),   // 300 tokens
      (2L, "en", "b " * 99 + "end"),    // 100 tokens
      (3L, "en", "c " * 499 + "end"),   // 500 tokens
      (4L, "zh", "d " * 49 + "end")     // 50 tokens, separate stratum
    ).toDF("doc_id", "lang", "text")
    val packed = Curation.packSequences(docs, "doc_id", "text", "lang", 256)
    val manifest = Curation.packManifest(packed, 256).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin_id"),
        r.getAs[Long]("offset_in_bin"), r.getAs[Long]("len_in_bin"), r.getAs[String]("lang")))
    val starts = packed.collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getInt(2))).toMap // id -> (start, n)
    // slices partition each doc: lengths sum to n_tokens, one row per bin
    starts.foreach { case (id, (_, n)) =>
      val slices = manifest.filter(_._1 == id)
      assert(slices.map(_._4).sum == n, s"doc $id slices don't cover it: $slices")
      assert(slices.map(_._2).distinct.length == slices.length, s"doc $id repeated a bin")
    }
    // a straddling doc's slices are contiguous across the boundary:
    // first slice runs to the end of its bin, later slices start at 0
    val straddlers = manifest.groupBy(_._1).filter(_._2.length > 1)
    assert(straddlers.nonEmpty, "expected at least one straddling doc")
    straddlers.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.init.foreach { case (_, _, off, len, _) => assert(off + len == 256,
        s"doc $id: non-final slice must fill its bin to the boundary") }
      sorted.tail.foreach { case (_, _, off, _, _) => assert(off == 0L,
        s"doc $id: continuation slice must start at bin offset 0") }
      assert(sorted.head._3 == starts(id)._1 % 256, s"doc $id: first slice offset wrong")
    }
    // bins fill completely except each stratum's last: en has 900 tokens
    // over 256-token bins -> 256/256/256/132; zh has 50 -> one 50 bin
    val binFill = manifest.groupBy(m => (m._5, m._2)).view.mapValues(_.map(_._4).sum).toMap
    assert(binFill == Map(
      ("en", 0L) -> 256L, ("en", 1L) -> 256L, ("en", 2L) -> 256L, ("en", 3L) -> 132L,
      ("zh", 0L) -> 50L), s"got $binFill")
  }

  test("assignShards cuts each stratum's bins into contiguous shards within one bin of equal") {
    // en: 10 full 256-token docs -> 10 bins; zh: 3 docs -> 3 bins;
    // fr: 2 docs -> 2 bins. nShards=4: en shards hold {3,2,3,2}
    // contiguous bins (b*4 DIV 10); small strata (T < nShards) emit
    // DENSE ids via b*min(T,4) DIV T — zh fills 0,1,2 and fr fills
    // 0,1 with no gaps (the plain b*4 DIV T formula would scatter fr
    // into {0,2}) — ranges stay contiguous and sizes within 1
    val docs = ((1L to 10L).map(i => (i, "en", "w " * 255 + "end")) ++
      (11L to 13L).map(i => (i, "zh", "z " * 255 + "end")) ++
      (14L to 15L).map(i => (i, "fr", "f " * 255 + "end"))).toDF("doc_id", "lang", "text")
    val sharded = Curation.assignShards(
      Curation.packManifest(
        Curation.packSequences(docs, "doc_id", "text", "lang", 256), 256),
      "lang", nShards = 4)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("bin_id"), r.getAs[Int]("shard_id")))
    for (lang <- Seq("en", "zh", "fr")) {
      val byBin = sharded.filter(_._1 == lang).map(t => t._2 -> t._3).distinct.sortBy(_._1)
      // contiguity: shard ids are non-decreasing along the bin order
      assert(byBin.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        s"$lang shards not contiguous: ${byBin.toSeq}")
      // balance: occupied shard sizes differ by at most one bin
      val sizes = byBin.groupBy(_._2).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"$lang unbalanced: ${byBin.toSeq}")
    }
    val enShards = sharded.filter(_._1 == "en").map(t => t._2 -> t._3).distinct.toMap
    assert(enShards == Map(0L -> 0, 1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 2, 8L -> 3, 9L -> 3), s"got $enShards")
    // density: every small stratum's populated shards are 0..T-1
    val zhShards = sharded.filter(_._1 == "zh").map(_._3).distinct.sorted.toSeq
    assert(zhShards == Seq(0, 1, 2), s"zh shards not dense: $zhShards")
    val frShards = sharded.filter(_._1 == "fr").map(_._3).distinct.sorted.toSeq
    assert(frShards == Seq(0, 1), s"fr shards not dense: $frShards")
    intercept[IllegalArgumentException] {
      Curation.assignShards(docs.limit(0), "lang", 0): Unit
    }
  }

  test("splitByHash assigns deterministic, roughly-proportional split labels") {
    val d = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Curation.splitByHash(d, "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // every row labeled with a declared split
    assert(out.size == 2000)
    assert(out.values.toSet == Set("train", "val", "test"))
    // proportions approximately honored (hash buckets, not exact quotas)
    val counts = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 100, s"train share off: $counts")
    assert(math.abs(counts("val") - 200) < 60, s"val share off: $counts")
    // determinism: a re-run and a repartitioned run assign identically
    val again = Curation.splitByHash(d.repartition(7), "doc_id", splits)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(again == out)
    // loud failures on bad fractions
    intercept[IllegalArgumentException] {
      Curation.splitByHash(d, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)): Unit
    }
    intercept[IllegalArgumentException] {
      Curation.splitByHash(d, "doc_id", Seq("a" -> 1.5, "b" -> -0.5)): Unit
    }
    // a null id gets a NULL split, not a silent ride on the last label
    val withNull = Seq(Some(7L), None).map(id => (id, "text"))
      .toDF("doc_id", "text")
    val nullOut = Curation.splitByHash(withNull, "doc_id", splits)
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) -> r.getString(2)).toMap
    assert(nullOut(-1L) == null, s"null id must not be labeled, got $nullOut")
    assert(nullOut(7L) != null)
  }

  test("capPerGroup keeps a deterministic hash-priority subset per group") {
    val d = (1L to 100L).map(i => (i, s"doc $i", s"src${i % 4}")).toDF("doc_id", "text", "source")
    val out = Curation.capPerGroup(d, "doc_id", "source", maxPerGroup = 5)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    // cap honored per group, full schema preserved
    assert(out.length == 20)
    assert(out.groupBy(_._2).forall(_._2.length == 5), s"got ${out.groupBy(_._2)}")
    // partitioning-independent: same survivors from a repartitioned input
    val again = Curation.capPerGroup(d.repartition(7), "doc_id", "source", maxPerGroup = 5)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    assert(again.sorted.sameElements(out.sorted))
    // null ids dropped (no deterministic tiebreak), null groups capped as a group
    val withNull = Seq((Some(1L), "g"), (None, "g"), (Some(2L), null.asInstanceOf[String]))
      .map { case (id, g) => (id, "text", g) }.toDF("doc_id", "text", "source")
    val survivors = Curation.capPerGroup(withNull, "doc_id", "source", maxPerGroup = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(survivors == Set(1L, 2L), s"got $survivors")
    intercept[IllegalArgumentException] {
      Curation.capPerGroup(d, "doc_id", "source", maxPerGroup = 0): Unit
    }
  }

  test("splitByHash is decorrelated from content-hash keep-priority sampling") {
    // tokenBudgetSample keeps each stratum's LOW-bare-md5 prefix; the
    // split bucket must not be a function of that same order, or a
    // sampled corpus collapses to all-train
    val d = (1L to 2000L).map(i => (i, "alpha beta gamma delta", "en")).toDF("doc_id", "text", "lang")
    // 4 tokens per doc, budget 4000 -> exactly half the stratum kept
    val kept = Curation.tokenBudgetSample(d, "doc_id", "text", "lang", 4000L)
    val counts = Curation.splitByHash(kept, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test"),
      s"sampled corpus lost splits (bucket correlated with keep-priority): $counts")
    assert(math.abs(counts("val") - 100) < 50 && math.abs(counts("test") - 100) < 50,
      s"val/test shares skewed after sampling: $counts")
  }

  test("rebalanceMix downsamples to target proportions without upsampling") {
    val d = (1L to 80L).map(i => (i, "t", if (i <= 60) "en" else "de")).toDF("doc_id", "text", "lang")
    // target 50/50 but only 20 de docs -> de binds: keep 20 de + 20 en
    val out = Curation.rebalanceMix(d, "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.5))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang == Map("en" -> 20, "de" -> 20), s"got $byLang")
    // dropped domains: weights not mentioning a lang exclude it
    val onlyEn = Curation.rebalanceMix(d, "doc_id", "lang", Map("en" -> 1.0))
      .collect().map(_.getString(1)).toSet
    assert(onlyEn == Set("en"))
  }

  test("distilled quality classifier separates crafted spam from clean text on held-out docs") {
    import graft.operators.QualityClassifier
    // 40 clean docs (fluent token pool, 12 tokens) and 40 spam docs
    // (repetitive 3-token spam pool, tripping the repetition rule) —
    // the heuristic gate labels the even-id training half, the
    // classifier must transfer to the UNSEEN odd half
    val cleanPool = Seq("data", "spark", "table", "query", "join", "scan",
      "merge", "window", "batch", "stream", "filter", "sort")
    val d = (0L until 80L).map { i =>
      val text =
        if (i % 2 == 0) (0 until 12).map(j => cleanPool(((i + j * 7) % 12).toInt)).mkString(" ")
        else "buy now " + Seq.fill(6)("spam").mkString(" ") + " click click"
      (i, text)
    }.toDF("doc_id", "text")
    // class = i % 2, train split = i % 4 < 2: both classes appear in
    // both halves, so the held-out check is a real transfer test
    val scores = QualityClassifier.distillQualityScore(
      d, "doc_id", "text", trainSplit = org.apache.spark.sql.functions.col("doc_id") % 4 < 2,
      minTokens = 5, maxBigramRep = 0.2, minAlphaRatio = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val holdout = (0L until 80L).filter(i => i % 4 >= 2)
    val misclassified = holdout.count { i =>
      val clean = i % 2 == 0
      val p = scores(i)
      if (clean) p < 0.5 else p >= 0.5
    }
    assert(misclassified == 0,
      s"$misclassified of ${holdout.size} held-out docs misclassified: ${holdout.map(i => i -> scores(i))}")
    // determinism: same input, same model, same scores
    val again = QualityClassifier.distillQualityScore(
      d, "doc_id", "text", trainSplit = org.apache.spark.sql.functions.col("doc_id") % 4 < 2,
      minTokens = 5, maxBigramRep = 0.2, minAlphaRatio = 0.8)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == scores, "training is not deterministic")
  }

  test("lmGate keeps reference-like docs and rejects high-perplexity ones") {
    // reference corpus: repeated fluent phrasing -> its bigrams dominate
    // the model; the gibberish doc's bigrams are all unseen, so its
    // backoff-scored perplexity sits far above any in-domain doc
    val ref = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the dog sat on the mat")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (4L, "the dog sat on the rug"),          // in-domain recombination
      (5L, "zx qv wq jj kx vb pz"),            // out-of-domain gibberish
      (6L, "one"),                             // no bigram: no evidence -> not kept
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val scored = graft.operators.LangModel.perplexityScore(
        corpus, "doc_id", "text",
        graft.operators.LangModel.bigramCounts(ref, "doc_id", "text"),
        graft.operators.LangModel.unigramCounts(ref, "doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // gate exactly between the in-domain band and the gibberish score
    val cut = (scored.filterNot(_._1 == 5L).values.max + scored(5L)) / 2
    val kept = Curation.lmGate(corpus, "doc_id", "text", ref, maxLog2Ppl = cut)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 4L), s"got $kept (scores: $scored, cut $cut)")
  }

  test("decontaminateByEmbedding drops cosine-close rows, keeps orthogonal and NaN-norm ones") {
    val bench = Seq((100L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (0L, Array(1.0f, 0.0f)),   // identical -> dropped
      (1L, Array(0.0f, 1.0f)),   // orthogonal -> kept
      (2L, Array(0.9f, 0.1f)),   // cosine ~0.99 -> dropped
      (3L, Array(-1.0f, 0.0f)),  // opposite -> kept
      (4L, Array(0.0f, 0.0f))    // zero norm: NaN cosine matches nothing -> kept
    ).toDF("vec_id", "embedding")
    val kept = Curation.decontaminateByEmbedding(corpus, bench, "vec_id", "embedding", 30)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L), s"got $kept")
  }

  test("releaseDelta ships ONLY the churned shards, tombstones removals, and applies back to the from-scratch manifest") {
    import org.apache.spark.sql.functions.col
    // two strata, en BINDING for the budget (en_tokens/0.5 < de_tokens/0.5)
    // and untouched by the churn — so en's budget, packing, and shards
    // are literally identical across releases, and the delta must NOT
    // ship them. de holds the churn: one retire, one token change, one
    // new doc (its total stays above the constant budget, so the scale
    // never moves).
    val prevReg = ((1L to 10L).map(i => (i, "en", 50)) ++
      (101L to 112L).map(i => (i, "de", 50))).toDF("doc_id", "lang", "n_tokens")
    val newReg = prevReg.where(col("doc_id") =!= 101L)
      .withColumn("n_tokens",
        org.apache.spark.sql.functions.when(col("doc_id") === 103L, 60)
          .otherwise(col("n_tokens")))
      .unionByName(Seq((201L, "de", 55)).toDF("doc_id", "lang", "n_tokens"))
    val weights = Map("en" -> 0.5, "de" -> 0.5)
    def manifestOf(reg: org.apache.spark.sql.DataFrame) =
      Curation.releaseRegistryManifest(reg, "doc_id", "n_tokens", "lang", weights,
        contextTokens = 64, nShards = 2)
    val prevM = manifestOf(prevReg)
    val newM = manifestOf(newReg)
    val delta = Curation.releaseDelta(prevM, newM, "doc_id", "lang")
    // the law: prev manifest + delta == from-scratch manifest
    val applied = Curation.applyReleaseDelta(prevM, delta, "lang")
    assert(applied.exceptAll(newM).isEmpty && newM.exceptAll(applied).isEmpty,
      "delta-applied manifest diverged from the from-scratch release")
    // minimality: the untouched stratum ships nothing
    assert(delta.where(col("kind").isin("shard", "drop_shard") && col("lang") === "en")
      .count() == 0, "delta shipped shards of the untouched stratum")
    // the shipped shard set is EXACTLY the differing shard set
    val differing = prevM.exceptAll(newM).select("lang", "shard_id")
      .unionByName(newM.exceptAll(prevM).select("lang", "shard_id"))
      .distinct().collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val shipped = delta.where(col("kind").isin("shard", "drop_shard"))
      .select("lang", "shard_id").distinct()
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(shipped == differing, s"shipped $shipped != differing $differing")
    assert(shipped.nonEmpty, "fixture must actually churn at least one shard")
    // tombstones: exactly the docs that left the release (101 retired;
    // budget churn in de may push others out — derive from the manifests)
    val expectTs = prevM.select("doc_id").distinct()
      .join(newM.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val gotTs = delta.where(col("kind") === "tombstone")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotTs == expectTs, s"tombstones $gotTs != expected $expectTs")
    assert(gotTs.contains(101L), "the retired doc must be tombstoned")
  }

  test("releaseRegistryManifest excludes non-positive counts; releaseDelta is type-agnostic over ids") {
    import org.apache.spark.sql.functions.col
    // zero/NULL counts are outside the text-fed chain's domain and
    // would duplicate the budget cut's last-row totals selection —
    // they must leave up front, not corrupt the manifest
    val reg = Seq((1L, "en", Option(50)), (2L, "en", Option(30)),
      (3L, "en", Option(0)), (4L, "en", Option.empty[Int]))
      .toDF("doc_id", "lang", "n_tokens")
    val m = Curation.releaseRegistryManifest(reg, "doc_id", "n_tokens", "lang",
      Map("en" -> 1.0), contextTokens = 64, nShards = 2)
    assert(m.select("doc_id").distinct().collect().map(_.getLong(0)).toSet == Set(1L, 2L),
      "zero/NULL-count rows must be excluded")
    assert(m.count() == m.dropDuplicates().count(), "manifest emitted duplicate rows")
    // a STRING-keyed, LONG-counted registry (a content-hash-addressed
    // corpus) must flow through the delta's null-padded union branches
    val prevS = Seq(("a", "en", 50L), ("b", "en", 40L), ("c", "en", 30L))
      .toDF("key", "lang", "toks")
    val newS = prevS.where(col("key") =!= "b")
    def mOf(r: org.apache.spark.sql.DataFrame) = Curation.releaseRegistryManifest(
      r, "key", "toks", "lang", Map("en" -> 1.0), contextTokens = 64, nShards = 2)
    val delta = Curation.releaseDelta(mOf(prevS), mOf(newS), "key", "lang")
    val applied = Curation.applyReleaseDelta(mOf(prevS), delta, "lang")
    assert(applied.exceptAll(mOf(newS)).isEmpty && mOf(newS).exceptAll(applied).isEmpty,
      "string-keyed delta-applied manifest diverged from the from-scratch release")
    assert(delta.where(col("kind") === "tombstone").select("key")
      .collect().map(_.getString(0)).toSet == Set("b"))
  }

  test("maintainRelease ships a gated round in place; a drift-tripped round publishes NOTHING") {
    import org.apache.spark.sql.functions.col
    val weights = Map("en" -> 0.5, "de" -> 0.5)
    val prevReg = ((1L to 10L).map(i => (i, "en", 50)) ++
      (101L to 112L).map(i => (i, "de", 50))).toDF("doc_id", "lang", "n_tokens")
    def mOf(r: org.apache.spark.sql.DataFrame) = Curation.releaseRegistryManifest(
      r, "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-release-maint").toString
    Curation.publishRelease(mOf(prevReg), "lang", root)
    def readBack() = Curation.readRelease(spark, root)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id").cast("int").as("shard_id"))
      .collect().map(_.toSeq).toSet
    // benign churn: one de doc retired — within the PSI gate, so the
    // round publishes and the tree equals the from-scratch release
    val newReg = prevReg.where(col("doc_id") =!= 101L)
    val report = Curation.maintainRelease(spark, root, newReg,
      "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2,
      maxPsi = 0.5)
    assert(report.collect().forall(_.getBoolean(2)), "benign churn must publish")
    assert(readBack() == mOf(newReg)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id"))
      .collect().map(_.toSeq).toSet,
      "maintained tree diverged from the from-scratch release")
    assert(Curation.readRemoved(spark, root, "doc_id")
      .collect().map(_.getLong(0)).toSet == Set(101L))
    // drift: every de doc's token count explodes — the stratum's PSI
    // trips the gate, and the round must refuse to touch the tree
    val before = fileListing(root)
    val drifted = newReg.select(col("doc_id"), col("lang"),
      org.apache.spark.sql.functions.when(col("lang") === "de", col("n_tokens") * 40)
        .otherwise(col("n_tokens")).as("n_tokens"))
    val report2 = Curation.maintainRelease(spark, root, drifted,
      "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2,
      maxPsi = 0.5)
    val rows2 = report2.collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows2.forall(!_._3), s"drifted round must refuse to publish: ${rows2.mkString}")
    assert(rows2.exists { case (s, psi, _) => s == "de" && psi > 0.5 },
      s"the drifted stratum must carry the tripping PSI: ${rows2.mkString}")
    assert(fileListing(root) == before,
      "a gated round must leave the release tree byte-identical")
    // CRASH DRILL through the one-call entry point: a round that died
    // between the marker delete and the first mutation leaves (marker
    // gone, delta staged, tree = previous state). The next
    // maintainRelease must auto-heal from the STAGED snapshot — the
    // delta plan itself derived from the now-refusing root and cannot
    // be re-derived — and then run its own round normally.
    val newReg2 = newReg.where(col("doc_id") =!= 102L)
    val m2 = Curation.releaseDelta(
      Curation.readRelease(spark, root), mOf(newReg2), "doc_id", "lang")
    m2.write.mode("overwrite").parquet(s"$root/_staged/delta-simcrash")
    val marker = java.nio.file.Paths.get(s"$root/_commit")
    val w = java.nio.file.Files.walk(marker)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(java.nio.file.Files.delete(_))
    finally w.close()
    assert(intercept[IllegalArgumentException] { Curation.readRelease(spark, root) }
      .getMessage.contains("commit marker missing"))
    // a THIRD registry churn through maintainRelease: the entry point
    // must first finish the crashed delta (tree -> newReg2's release),
    // then ship its own round on top
    val newReg3 = newReg2.where(col("doc_id") =!= 103L)
    val report3 = Curation.maintainRelease(spark, root, newReg3,
      "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2,
      maxPsi = 0.5)
    assert(report3.collect().forall(_.getBoolean(2)), "post-repair round must publish")
    assert(readBack() == mOf(newReg3)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id"))
      .collect().map(_.toSeq).toSet,
      "auto-healed tree diverged from the from-scratch release of the latest registry")
    assert(!new java.io.File(s"$root/_staged").exists,
      "repair + round must leave no staged residue")
    // an unreadable root with NO staged snapshot cannot be repaired —
    // the refusal must say so, not guess
    val bare = java.nio.file.Files.createTempDirectory("graft-release-bare").toString
    Curation.publishRelease(mOf(prevReg), "lang", bare)
    val w2 = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$bare/_commit"))
    try w2.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(java.nio.file.Files.delete(_))
    finally w2.close()
    val e = intercept[IllegalArgumentException] {
      Curation.repairRelease(spark, bare, "doc_id", "lang")
    }
    assert(e.getMessage.contains("republish from scratch"), e.getMessage)
    // and a consistent root is a no-op
    assert(!Curation.repairRelease(spark, root, "doc_id", "lang"))
    // STALE-RESIDUE drill: a completed apply whose FINAL cleanup
    // crashed leaves (marker present, _staged residue). Both a repair
    // probe and the next publish must sweep it — left behind, a later
    // crash window would hold TWO snapshots and repairRelease would
    // refuse a repairable root as ambiguous.
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/_staged/delta-stale"))
    assert(!Curation.repairRelease(spark, root, "doc_id", "lang"))
    assert(!new java.io.File(s"$root/_staged").exists,
      "repairRelease on a consistent root must sweep completed-apply residue")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$root/_staged/delta-stale2"))
    val newReg4 = newReg3.where(col("doc_id") =!= 104L)
    Curation.publishReleaseDelta(
      Curation.releaseDelta(Curation.readRelease(spark, root), mOf(newReg4),
        "doc_id", "lang"),
      "doc_id", "lang", root)
    assert(readBack() == mOf(newReg4)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id"))
      .collect().map(_.toSeq).toSet,
      "post-sweep publish diverged from the from-scratch release")
    assert(!new java.io.File(s"$root/_staged").exists,
      "publishReleaseDelta must sweep completed-apply residue before staging")
  }

  test("publishReleaseDelta rewrites ONLY the touched shard partitions on disk") {
    import org.apache.spark.sql.functions.col
    // same binding-stratum fixture as the delta test: en untouched, de churned
    val prevReg = ((1L to 10L).map(i => (i, "en", 50)) ++
      (101L to 112L).map(i => (i, "de", 50))).toDF("doc_id", "lang", "n_tokens")
    val newReg = prevReg.where(col("doc_id") =!= 101L)
      .unionByName(Seq((201L, "de", 55)).toDF("doc_id", "lang", "n_tokens"))
    val weights = Map("en" -> 0.5, "de" -> 0.5)
    def mOf(r: org.apache.spark.sql.DataFrame) = Curation.releaseRegistryManifest(
      r, "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2)
    def deltaOf(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Curation.releaseDelta(mOf(a), mOf(b), "doc_id", "lang")
    val root = java.nio.file.Files.createTempDirectory("graft-release-pub").toString
    Curation.publishRelease(mOf(prevReg), "lang", root)
    // a release with no removals yet reads back as an EMPTY typed relation
    assert(Curation.readRemoved(spark, root, "doc_id").isEmpty,
      "fresh release must have an empty removed-doc record")
    val enBefore = fileListing(s"$root/lang=en")
    val d1 = deltaOf(prevReg, newReg)
    Curation.publishReleaseDelta(d1, "doc_id", "lang", root)
    // the untouched stratum's files are BYTE-IDENTICAL — the delta
    // paid O(changed shards), not a full republish
    assert(fileListing(s"$root/lang=en") == enBefore,
      "publishing a de-only delta rewrote en shard files")
    // read-back (through the commit-marker gate) equals the
    // from-scratch release of the new registry
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "lang", "n_tokens", "bin_id", "offset_in_bin", "len_in_bin", "shard_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getInt(6))).toSet
    def readBack() = Curation.readRelease(spark, root)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id").cast("int").as("shard_id"))
    assert(rows(readBack()) == rows(mOf(newReg)),
      "delta-published release diverged from the from-scratch manifest")
    // the removed-doc record sits beside the shards, invisible to the read
    def removedIds() = Curation.readRemoved(spark, root, "doc_id")
      .collect().map(_.getLong(0)).toSeq.sorted
    val removedOnce = removedIds()
    assert(removedOnce.contains(101L))
    // the documented crash repair — re-applying the SAME delta — must
    // be idempotent for ALL THREE mutations: the removed-doc record
    // keeps its exact ROW COUNT (a set-compare would hide appended
    // duplicates), and the release content is unchanged
    Curation.publishReleaseDelta(d1, "doc_id", "lang", root)
    assert(removedIds() == removedOnce,
      s"re-applying a delta changed the removed-doc record: ${removedIds()} vs $removedOnce")
    assert(rows(readBack()) == rows(mOf(newReg)),
      "re-applying a delta changed the release content")
    // crash drill: kill the commit marker with NO staged snapshot in
    // place — indistinguishable from an interrupted publishRelease
    // (which deletes the marker first and never stages), so BOTH
    // readRelease and a delta apply must refuse; the operational
    // answer is a full republish, not a delta that would certify a
    // possibly half-written tree (r17 — previously the apply
    // silently "repaired" this state)
    def dropMarker(): Unit = {
      val m = java.nio.file.Paths.get(s"$root/_commit")
      val w = java.nio.file.Files.walk(m)
      try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(java.nio.file.Files.delete(_))
      finally w.close()
    }
    dropMarker()
    assert(intercept[IllegalArgumentException] { Curation.readRelease(spark, root) }
      .getMessage.contains("commit marker missing"))
    val eNoSnap = intercept[IllegalArgumentException] {
      Curation.publishReleaseDelta(d1, "doc_id", "lang", root)
    }
    assert(eNoSnap.getMessage.contains("Republish from scratch"), eNoSnap.getMessage)
    Curation.publishRelease(mOf(newReg), "lang", root)
    assert(rows(readBack()) == rows(mOf(newReg)), "full republish diverged")
    // a second delta that retires the whole de stratum drops its
    // partition directories physically
    val noDe = newReg.where(col("lang") =!= "de")
    Curation.publishReleaseDelta(deltaOf(newReg, noDe), "doc_id", "lang", root)
    assert(!new java.io.File(s"$root/lang=de").exists(),
      "dropped shards must leave the disk")
    assert(rows(readBack()) == rows(mOf(noDe)))
    // crash posture: a root whose commit marker is gone (an
    // interrupted publish/apply) refuses to serve instead of mixing
    // generations — the index tiers' manifest stance
    val marker = java.nio.file.Paths.get(s"$root/_commit")
    val walk = java.nio.file.Files.walk(marker)
    try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(java.nio.file.Files.delete(_))
    finally walk.close()
    val e = intercept[IllegalArgumentException] { Curation.readRelease(spark, root) }
    assert(e.getMessage.contains("commit marker missing"), e.getMessage)
  }

  test("publishReleaseDelta refuses a broken root holding ANOTHER delta's staged snapshot") {
    import org.apache.spark.sql.functions.col
    val weights = Map("en" -> 0.5, "de" -> 0.5)
    val prevReg = ((1L to 10L).map(i => (i, "en", 50)) ++
      (101L to 112L).map(i => (i, "de", 50))).toDF("doc_id", "lang", "n_tokens")
    def mOf(r: org.apache.spark.sql.DataFrame) = Curation.releaseRegistryManifest(
      r, "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-release-foreign").toString
    Curation.publishRelease(mOf(prevReg), "lang", root)
    // simulate delta A crashing mid-apply: its snapshot staged, marker gone
    val regA = prevReg.where(col("doc_id") =!= 101L)
    Curation.releaseDelta(Curation.readRelease(spark, root), mOf(regA), "doc_id", "lang")
      .write.parquet(s"$root/_staged/delta-crashedA")
    val m = java.nio.file.Paths.get(s"$root/_commit")
    val w = java.nio.file.Files.walk(m)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(java.nio.file.Files.delete(_))
    finally w.close()
    // a DIFFERENT delta pushed at the broken root must refuse (applying
    // it would certify a tree missing A's tail mutations and later
    // sweep A's snapshot — the only repair evidence) ...
    val regB = prevReg.where(col("doc_id") =!= 102L)
    val dB = Curation.releaseDelta(
      spark.read.parquet(root), mOf(regB), "doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      Curation.publishReleaseDelta(dB, "doc_id", "lang", root)
    }
    assert(e.getMessage.contains("repairRelease"), e.getMessage)
    assert(new java.io.File(s"$root/_staged/delta-crashedA").exists,
      "the refusal must leave the crashed delta's snapshot in place")
    // ... and after repairing, the same delta applies cleanly
    def treeRows() = Curation.readRelease(spark, root)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id").cast("int").as("shard_id"))
      .collect().map(_.toSeq).toSet
    def mRows(r: org.apache.spark.sql.DataFrame) = mOf(r)
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("bin_id"),
        col("offset_in_bin"), col("len_in_bin"), col("shard_id"))
      .collect().map(_.toSeq).toSet
    assert(Curation.repairRelease(spark, root, "doc_id", "lang"))
    assert(treeRows() == mRows(regA),
      "repair must finish the crashed delta: tree == regA's from-scratch release")
    Curation.publishReleaseDelta(
      Curation.releaseDelta(Curation.readRelease(spark, root), mOf(regB), "doc_id", "lang"),
      "doc_id", "lang", root)
    assert(treeRows() == mRows(regB),
      "post-repair publish must land regB's from-scratch release")
  }

  test("delta content keys fold the null bitmap: null-position variants don't collide") {
    import org.apache.spark.sql.functions.{col, lit}
    val weights = Map("en" -> 1.0)
    val prevReg = (1L to 6L).map(i => (i, "en", 50)).toDF("doc_id", "lang", "n_tokens")
    val m = Curation.releaseRegistryManifest(
      prevReg, "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 1)
    val root = java.nio.file.Files.createTempDirectory("graft-release-nullkey").toString
    Curation.publishRelease(m, "lang", root)
    // two deltas whose rows differ ONLY in which same-typed column is
    // null (bin_id vs offset_in_bin, both long): a value-only row hash
    // sees the identical non-null chain for both, collides the content
    // key, and the second apply's _removed overwrite would ERASE the
    // first delta's tombstone record. With the null bitmap folded in,
    // the keys are distinct and both erasure records survive.
    def deltaOf(tombId: Long, binNull: Boolean) = {
      val shard = m.limit(1).select(lit("shard").as("kind"), col("lang"),
        col("shard_id"), col("doc_id"), col("n_tokens"),
        (if (binNull) lit(null).cast("bigint") else lit(7L)).as("bin_id"),
        (if (binNull) lit(7L) else lit(null).cast("bigint")).as("offset_in_bin"),
        col("len_in_bin"))
      val ts = m.limit(1).select(lit("tombstone").as("kind"),
        lit(null).cast("string").as("lang"), lit(null).cast("bigint").as("shard_id"),
        lit(tombId).as("doc_id"), lit(null).cast("int").as("n_tokens"),
        lit(null).cast("bigint").as("bin_id"), lit(null).cast("bigint").as("offset_in_bin"),
        lit(null).cast("bigint").as("len_in_bin"))
      shard.unionByName(ts)
    }
    // align both deltas' shard row on everything except the null slot:
    // same tombstone SHAPE, different id so the two erasure records are
    // distinguishable in the read-back
    Curation.publishReleaseDelta(deltaOf(11L, binNull = true), "doc_id", "lang", root)
    Curation.publishReleaseDelta(deltaOf(11L, binNull = false), "doc_id", "lang", root)
    val removed = Curation.readRemoved(spark, root, "doc_id").collect().map(_.getLong(0))
    assert(removed.length == 2 && removed.toSet == Set(11L),
      s"both null-position variants must keep their own _removed record, got ${removed.toSeq}")
  }

  test("maintainRelease refuses a round it cannot SEE: all token mass beyond psiHi scores NaN") {
    import org.apache.spark.sql.functions.col
    val weights = Map("en" -> 1.0)
    // every doc's token count sits far above the tiny grid below
    val prevReg = (1L to 8L).map(i => (i, "en", 50)).toDF("doc_id", "lang", "n_tokens")
    def mOf(r: org.apache.spark.sql.DataFrame) = Curation.releaseRegistryManifest(
      r, "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-release-blind").toString
    Curation.publishRelease(mOf(prevReg), "lang", root)
    val before = fileListing(root)
    // arbitrary drift (every count doubled) that a [0, 4) grid cannot
    // see: a smoothed-zero PSI of 0 would silently publish — the gate
    // must instead report NaN and refuse the round untouched
    val drifted = prevReg.select(col("doc_id"), col("lang"),
      (col("n_tokens") * 2).as("n_tokens"))
    val report = Curation.maintainRelease(spark, root, drifted,
      "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2,
      maxPsi = 0.5, psiHi = 4)
    val rows = report.collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.forall(!_._3), s"a grid-blind round must refuse: ${rows.mkString}")
    assert(rows.exists { case (_, psi, _) => psi.isNaN },
      s"the blind stratum must report NaN, not 0: ${rows.mkString}")
    assert(fileListing(root) == before, "a refused round must leave the tree byte-identical")
  }

  test("MIXED drift: one drifting stratum refuses the WHOLE round — no partial publish") {
    import org.apache.spark.sql.functions.{col, when}
    val weights = Map("en" -> 0.5, "de" -> 0.5)
    val prevReg = ((1L to 10L).map(i => (i, "en", 50)) ++
      (101L to 112L).map(i => (i, "de", 50))).toDF("doc_id", "lang", "n_tokens")
    def mOf(r: org.apache.spark.sql.DataFrame) = Curation.releaseRegistryManifest(
      r, "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2)
    val root = java.nio.file.Files.createTempDirectory("graft-release-mixed").toString
    Curation.publishRelease(mOf(prevReg), "lang", root)
    val before = fileListing(root)
    // en churns BENIGNLY (one doc retired — well inside the gate on its
    // own) while de drifts wildly: the round must refuse EVERYTHING,
    // including en's otherwise-publishable shard changes — a partial
    // publish would ship a release no registry ever described
    val mixed = prevReg.where(col("doc_id") =!= 1L)
      .select(col("doc_id"), col("lang"),
        when(col("lang") === "de", col("n_tokens") * 40)
          .otherwise(col("n_tokens")).as("n_tokens"))
    val report = Curation.maintainRelease(spark, root, mixed,
      "doc_id", "n_tokens", "lang", weights, contextTokens = 64, nShards = 2,
      maxPsi = 0.5)
    val rows = report.collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    assert(rows.forall(!_._3), s"mixed-drift round must refuse on every row: ${rows.mkString}")
    assert(rows.exists { case (s, psi, _) => s == "en" && psi <= 0.5 },
      s"the benign stratum's own PSI must be under the gate (proving the refusal is " +
        s"round-wide, not per-stratum): ${rows.mkString}")
    assert(fileListing(root) == before,
      "a mixed-drift round must leave the ENTIRE tree byte-identical — en shards included")
  }
}
