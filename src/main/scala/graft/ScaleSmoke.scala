package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Scaling smoke for the curation pipeline: replicate the documents
  * table N times (each replica near-duplicated by a trailing marker
  * token, so duplication rate stays high like a web crawl) and run the
  * full capstone chain — quality gate -> LSH candidates -> Jaccard
  * verify -> connected components -> survivors -> decontaminate ->
  * domain rebalance -> token budget — at 1x AND Nx, printing a
  * per-stage growth table. The point is the GROWTH CURVE, not the
  * absolute numbers: candidate generation must scale ~linearly in
  * corpus size (bounded bucket sizes), clustering must converge in
  * O(log diameter) rounds (it throws loudly if it doesn't), and the
  * survivor count must stay FLAT as replicas grow (every replica is a
  * near-dup, so dedup should collapse them — survivors growing with N
  * means recall collapsed). Violations exit non-zero; this is the
  * 100 TB rehearsal, run before trusting any plan change.
  *
  * Also A/Bs the LSH candidate materialization strategies at Nx: the
  * cache-free ReusedExchange plan (production) vs persist+count.
  * Reading the result honestly: under this synthetic 100% duplication,
  * persist can win locally because AQE broadcasts the small cached
  * bands relation, whose probe parallelizes freely, while the
  * co-partitioned hash join concentrates each mega-bucket's quadratic
  * pair output in one task. Neither advantage transfers to a real
  * corpus at scale: bands don't fit a broadcast, the cache spends
  * executor memory, and the blocking count job stalls the pipeline —
  * the reuse plan computes the signature scan once with none of those
  * costs, and mega-buckets are what [[graft.operators.Dedup
  * .nearDuplicatesCollapsed]] exists to collapse.
  *
  * Replication modes (third arg = duplication cluster cap C):
  *   - C = 0 (default): ALL-DUP — every replica is a near-dup of its
  *     base doc, so duplication density grows with N and candidate
  *     pairs grow exactly N^2. The LSH worst case; right for stressing
  *     bounded buckets at moderate N, but its verify-stage shuffle is
  *     quadratic in N and outgrows any single box (measured: 100x
  *     all-dup = ~570M text-carrying pairs, which out-spills local
  *     disk). No real crawl behaves this way — duplication CLUSTER
  *     SIZE stays roughly constant as a corpus grows.
  *   - C > 0: BOUNDED — replicas are grouped into families of C;
  *     within a family replicas stay near-dups (trailing marker
  *     token), across families the text is rewritten (vowel-rotation
  *     translate / word-order reversal — every shingle changes) so
  *     families never collide in LSH. Duplication density is constant
  *     in N, candidates grow ~N*C (linear in N), and survivors must
  *     track CONTENT (the family count F = N/C), not corpus size —
  *     the realistic 100 TB growth law. Recall is asserted from counts
  *     (growth past 1.2*F = recall collapsed); precision is asserted
  *     DIRECTLY on the verified relation (zero cross-family pairs) and
  *     on per-family survivor balance, never from a count floor —
  *     replication legitimately shrinks per-family components below
  *     the 1x survivor count by handing LSH ~C^2 extra band-collision
  *     chances per missed true pair.
  *
  * Usage: runMain graft.ScaleSmoke [sfDir] [replicas] [clusterCap]
  */
object ScaleSmoke {

  /** 10 mutually-dissimilar text rewrites: identity plus 9 distinct
    * substitution ciphers (cyclic rotations of the 10 most frequent
    * letters). Each cipher changes every token containing any of those
    * letters — virtually every word — so cross-family TOKEN SETS are
    * near-disjoint, which is the property that matters: the engine's
    * Jaccard verifier is word-SET based, so an order-only rewrite
    * (e.g. word reversal, an earlier design) preserves the token set
    * and makes two "dissimilar" families genuine duplicates under the
    * engine's own semantics — the families merge and the precision
    * assertion misfires on a smoke artifact, not an engine bug.
    * Family members share a rewrite and differ only in a trailing
    * marker token, so within-family Jaccard stays near 1.
    */
  private val famAlphabet = "etaoinsrhl"

  private def familyText(text: org.apache.spark.sql.Column, f: Int): org.apache.spark.sql.Column = {
    val r = f % famAlphabet.length
    if (r == 0) text
    else translate(text, famAlphabet, famAlphabet.drop(r) + famAlphabet.take(r))
  }

  private def time[T](f: => T): (T, Double) = Sessions.timed(f)

  private val BudgetTokens = 100000L

  /** Direct-invariant diagnostics, measured on the chain's own
    * relations rather than inferred from row growth:
    * `crossFamilyVerified` — verified pairs whose endpoints lie in
    * different content families (exact precision: must be 0; inferring
    * precision from survivor counts misreads RECALL improvement —
    * replication gives every LSH-missed true pair ~C^2 extra
    * band-collision chances, so per-family components legitimately
    * DROP below the 1x survivor count as N grows);
    * `survivorsByFamily` — families carry isomorphic content (one
    * deterministic rewrite of the same base corpus), so their survivor
    * counts must be present and balanced;
    * `budgetTokensByStratum` — tokenBudgetSample's contract is a
    * per-stratum token ceiling, so the sharp assertion is on token
    * sums, not output-row growth (rows track whatever the upstream
    * stages admit until the budget binds).
    */
  private case class ChainDiag(
      crossFamilyVerified: Long,
      survivorsByFamily: Map[Long, Long],
      budgetTokensByStratum: Map[String, Long])

  /** Stage name -> (rows, seconds) for the full curated chain. */
  private def runChain(
      docs: DataFrame,
      benchmark: DataFrame,
      famOf: Option[org.apache.spark.sql.Column => org.apache.spark.sql.Column] = None
  ): (Seq[(String, Long, Double)], ChainDiag) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Double)]
    def stage[T](name: String)(f: => (Long, T)): T = {
      val ((n, v), s) = time(f)
      out += ((name, n, s))
      v
    }

    val quality = stage("quality gate") {
      val q = Curation.qualityFilter(docs, "doc_id", "text",
        minTokens = 10, maxBigramRep = 0.2, minAlphaRatio = 0.8)
        .where(col("keep") === 1).select("doc_id")
      val kept = docs.join(q, "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (kept.count(), kept)
    }
    val candidates = stage("lsh candidates") {
      val c = Dedup.lshCandidatePairs(quality, "doc_id", "text", 8, 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (c.count(), c)
    }
    val verified = stage("jaccard verify") {
      val v = Dedup.jaccardOnPairs(candidates, quality, "doc_id", "text", 40)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (v.count(), v)
    }
    val survivors = stage("cc + survivors") {
      val s = Dedup.dedupedCorpus(quality, "doc_id", verified)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (s.count(), s)
    }
    val clean = stage("decontaminate") {
      val flagged = Curation.decontaminate(survivors, "doc_id", "text", benchmark, "text", n = 3)
      val c = survivors.join(flagged, Seq("doc_id"), "left_anti")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (c.count(), c)
    }
    val balanced = stage("rebalance mix") {
      val b = clean.join(
        Curation.rebalanceMix(clean, "doc_id", "lang",
          Map("en" -> 0.4, "zh" -> 0.15, "es" -> 0.15, "de" -> 0.15, "fr" -> 0.15))
          .select("doc_id"),
        "doc_id")
      (b.count(), b)
    }
    val budget = stage("token budget") {
      val t = Curation.tokenBudgetSample(balanced, "doc_id", "text", "lang", budgetTokens = BudgetTokens)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      (t.count(), t)
    }
    val diag = ChainDiag(
      crossFamilyVerified = famOf.map(f =>
        verified.where(f(col("a_id")) =!= f(col("b_id"))).count()).getOrElse(0L),
      survivorsByFamily = famOf.map(f =>
        survivors.groupBy(f(col("doc_id")).as("fam")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap).getOrElse(Map.empty),
      // recomputed INDEPENDENTLY of the operator's own columns: join the
      // admitted ids back to the corpus and re-count tokens from text —
      // asserting max(cum_tokens) would ride on the very prefix sum
      // under test, keeping most window regressions vacuously green
      budgetTokensByStratum = budget.select("doc_id")
        .join(balanced, "doc_id")
        .groupBy("lang")
        .agg(sum(graft.functions.TextFunctions.tokenCount(col("text"))).as("toks"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    budget.unpersist()
    Seq(quality, candidates, verified, survivors, clean, balanced).foreach(_.unpersist())
    (out.toSeq, diag)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val clusterCap = args.lift(2).map(_.toInt).getOrElse(0)
    val families = if (clusterCap > 0) (replicas + clusterCap - 1) / clusterCap else 1
    require(families <= famAlphabet.length,
      s"bounded mode has ${famAlphabet.length} distinct family rewrites; " +
        s"$replicas replicas at cap $clusterCap needs $families")
    val spark = Sessions.get()

    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang")
    // replica ids offset by max(doc_id)+1, not a fixed constant — a
    // fixed offset silently collides (and corrupts dedup stats) once
    // the base corpus's ids reach it at a larger scale factor
    val stride = base.agg(max("doc_id")).head().getLong(0) + 1L
    val nBase = base.count()
    // a tiny "benchmark eval set": distinctive slices of base docs, so
    // decontamination has real n-gram hits to find at every scale —
    // ordered before the limit so the 1x and Nx chains (which each
    // re-execute this lazy plan) decontaminate against the SAME rows
    val benchmark = base.where(col("doc_id") % 97 === 0)
      .orderBy(col("doc_id")).limit(50).select(col("text"))

    def corpusOf(n: Int): DataFrame =
      SmokeFiles.replicated(spark, n, s"/tmp/graft_scale_${n}x") { r =>
        val fam = if (clusterCap > 0) r / clusterCap else 0
        val famText = if (fam == 0) col("text") else familyText(col("text"), fam)
        if (r == 0) base
        else base.select(
          (col("doc_id") + lit(r.toLong * stride)).as("doc_id"),
          concat(famText, lit(s" replica$r")).as("text"),
          col("lang"))
      }

    val modeDesc = if (clusterCap > 0) s"bounded duplication (cluster cap $clusterCap, $families families)"
                   else "all-dup (every replica near-dups its base)"
    println(s"[scale] base corpus: $nBase docs; replicating x1 and x$replicas, $modeDesc (id stride $stride)")
    // family of a doc id: replica index r = id/stride, family = r/C
    // (floor of double division — exact for the < 2^53 ids here)
    val famOf = if (clusterCap > 0)
      Some((id: org.apache.spark.sql.Column) =>
        floor(floor(id / lit(stride)) / lit(clusterCap)).cast("long"))
    else None
    val (at1, _) = runChain(corpusOf(1), benchmark)
    val (atN, diagN) = runChain(corpusOf(replicas), benchmark, famOf)

    println(f"[scale] ${"stage"}%-16s ${"rows@1x"}%12s ${"rows@Nx"}%12s ${"growth"}%8s ${"s@1x"}%8s ${"s@Nx"}%8s")
    val rows = at1.zip(atN).map { case ((name, n1, s1), (_, nN, sN)) =>
      val growth = if (n1 == 0) Double.NaN else nN.toDouble / n1
      println(f"[scale] $name%-16s $n1%12d $nN%12d $growth%8.2f $s1%8.2f $sN%8.2f")
      (name, n1, nN, growth)
    }

    // growth assertions — the properties that decide 100 TB viability
    def of(name: String) = rows.find(_._1 == name).get
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    val candGrowth = of("lsh candidates")._4
    // bucket-bounded candidate generation. All-dup: duplication
    // density grows with N, so the quadratic-within-cluster term makes
    // growth EXACTLY N^2 (measured 900.02x at 30x) — the bound is N^2
    // plus epsilon, beyond which buckets are unbounded (the classic
    // LSH failure). Bounded: cluster size is pinned at C, so each
    // doc's pair fan-out is ~C and growth is ~N*C — LINEAR in N, the
    // realistic crawl growth law
    // exact combinatorial ceiling, not the asymptotic one: a natural
    // cluster of size s replicated k-fold has C(k*s,2) = k^2*C(s,2) +
    // k(k-1)*s/2 pairs, so growth over the 1x pair count P carries a
    // linear term k(k-1)*D/(2P) (D = corpus docs) that dominates when
    // natural clusters are small. All-dup replicates every cluster
    // N-fold (k=N, one family); bounded replicates C-fold within each
    // of F families (k=C, summed F times)
    val pairs1x = of("lsh candidates")._2.toDouble
    val docs1x = of("quality gate")._2.toDouble
    val candBound =
      if (clusterCap > 0)
        families * (clusterCap.toDouble * clusterCap +
          clusterCap.toDouble * (clusterCap - 1) * docs1x / (2 * pairs1x)) * 1.3
      else
        (replicas.toDouble * replicas +
          replicas.toDouble * (replicas - 1) * docs1x / (2 * pairs1x)) * 1.1
    if (candGrowth > candBound)
      failures += f"candidate growth $candGrowth%.1fx exceeds the ${if (clusterCap > 0) "F*C^2 cluster-capped" else "N^2"} ceiling ($candBound%.0fx) at N=$replicas"
    val survGrowth = of("cc + survivors")._4
    // survivors must track CONTENT, not corpus: all-dup adds no new
    // content (1 family), bounded adds F dissimilar rewrites. Only an
    // UPPER bound is inferable from counts: replication legitimately
    // SHRINKS per-family survivor counts below the 1x baseline, because
    // every true pair LSH missed at 1x gets ~C^2 extra band-collision
    // chances from the replicas — better recall, fewer components. A
    // count-based lower floor misreads that as precision collapse, so
    // precision is asserted DIRECTLY on the verified relation below.
    if (survGrowth > families * 1.2)
      failures += f"survivors grew $survGrowth%.2fx vs $families content families — near-dup recall collapsed"
    if (clusterCap > 0) {
      // exact precision: a verified pair crossing families means the
      // set-Jaccard gate passed two docs with near-disjoint token sets
      if (diagN.crossFamilyVerified > 0)
        failures += s"${diagN.crossFamilyVerified} verified pairs cross content families — precision collapse"
      // families carry isomorphic content (deterministic rewrites of
      // one base corpus), so each must retain survivors, in balance;
      // the spread only reflects per-family LSH randomness
      val sf = diagN.survivorsByFamily
      if (sf.size != families)
        failures += s"only ${sf.size} of $families families have survivors: ${sf.keys.toSeq.sorted.mkString(",")}"
      else if (sf.values.min < 0.5 * sf.values.max)
        failures += s"per-family survivors imbalanced (min ${sf.values.min}, max ${sf.values.max}) across isomorphic families"
      else
        println(s"[scale] per-family survivors: ${sf.toSeq.sorted.map(_._2).mkString(" ")} (cross-family verified pairs: ${diagN.crossFamilyVerified})")
    }
    // the budget operator's contract is a per-stratum TOKEN ceiling —
    // assert it directly (row growth tracks upstream admission until
    // the budget binds, and so is not a stable invariant of this stage)
    diagN.budgetTokensByStratum.foreach { case (stratum, toks) =>
      if (toks > BudgetTokens)
        failures += s"token budget exceeded in stratum $stratum: $toks > $BudgetTokens"
    }
    println(s"[scale] budget tokens by stratum @Nx: ${diagN.budgetTokensByStratum.toSeq.sorted.map { case (k, v) => s"$k=$v" }.mkString(" ")} (ceiling $BudgetTokens)")
    // all-dup adds no content, so the budget stage's output rows must
    // stay flat with N (in bounded mode content grows with F and the
    // token contract above is the sharp check instead)
    val tokGrowth = of("token budget")._4
    if (clusterCap == 0 && tokGrowth > 1.2)
      failures += f"token-budget output grew $tokGrowth%.2fx with zero content growth — budget no longer binding"

    // A/B: production cache-free ReusedExchange plan vs persist+count
    // (one unbilled warmup each, then median of 3 — single-shot local
    // timings swing 2x from JIT alone)
    val docsN = corpusOf(replicas)
    def medianOf3(f: => Long): Double = {
      f // warmup
      (1 to 3).map { _ =>
        spark.sharedState.cacheManager.clearCache()
        time(f)._2
      }.sorted.apply(1)
    }
    val reuseSec = medianOf3(Dedup.lshCandidatePairs(docsN, "doc_id", "text", 8, 2).count())
    val skewSafeSec = medianOf3(
      Dedup.lshCandidatePairsSkewSafe(docsN, "doc_id", "text", 8, 2, nGroups = 8).count())
    val persistSec = medianOf3 {
      val sigs = Dedup.minhashSignatures(docsN, "doc_id", "text", 8)
      val stackArgs = (0 until 4).flatMap(b => b.toString +: (0 until 2).map(r => s"sig${b * 2 + r}"))
      val bands = sigs
        .select(col("doc_id"), expr(s"stack(4, ${stackArgs.mkString(", ")}) AS (band, s0, s1)"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      bands.count()
      val a = bands.select(col("doc_id").as("a_id"), col("band"), col("s0"), col("s1"))
      val b = bands.select(col("doc_id").as("b_id"), col("band"), col("s0"), col("s1"))
      val n = a.join(b, Seq("band", "s0", "s1"))
        .where(col("a_id") < col("b_id")).select("a_id", "b_id").distinct().count()
      bands.unpersist()
      n
    }
    println(f"[scale] candidate plan A/B at x$replicas: reuse(one-scan, co-partitioned) $reuseSec%.2f s vs skew-safe(triangle blocks, G=8) $skewSafeSec%.2f s vs persist(cache + AQE broadcast) $persistSec%.2f s — see scaladoc for why the persist edge does not transfer to cluster scale")

    // exact span dedup growth: output rows are OCCURRENCES of repeated
    // windows — bounded by corpus windows (linear in corpus size), not
    // by within-cluster pairs (quadratic in duplication). Under this
    // all-dup replication the pair-based chain grows ~N^2 while span
    // occurrences grow toward N x total-windows: the contrast is the
    // operator's scale story and is printed for the record.
    // ONE span-width literal drives both the repeatedSpans calls and the
    // window-count ceiling: diverging literals would silently make the
    // duplicate-emission gate measure the wrong bound
    val spanTokens = 8
    val (span1, spanSec1) = time(Dedup.repeatedSpans(corpusOf(1), "doc_id", "text", spanTokens, 2).count())
    val (spanN, spanSecN) = time(Dedup.repeatedSpans(docsN, "doc_id", "text", spanTokens, 2).count())
    val windowsN = docsN
      .select(sum(greatest(size(split(col("text"), " ")) - (spanTokens - 1), lit(0))))
      .head().getLong(0)
    println(f"[scale] repeated spans: $span1%d occ @1x ($spanSec1%.2f s) -> $spanN%d occ @x$replicas ($spanSecN%.2f s), at/under the $windowsN%d-window linear ceiling; candidate pairs grew $candGrowth%.1fx (${if (clusterCap > 0) "linear — cluster-capped" else "quadratic in duplication"}) alongside")
    if (spanN > windowsN)
      failures += s"span occurrences $spanN exceed the corpus window count $windowsN — duplicate emission"

    // span CUT: with the native merge scan the per-row cost is
    // O(tokens + spans), so cut wall-time must track corpus size
    // ~linearly even though replication makes EVERY window a repeated
    // span (the all-distinct-spans worst case that degraded the old
    // exists() probe toward O(tokens^2) per doc)
    val (cut1, cutSec1) = time(
      Dedup.cutRepeatedSpans(corpusOf(1), "doc_id", "text", spanTokens, 2)
        .agg(sum("n_cut")).head().getLong(0))
    val (cutN, cutSecN) = time(
      Dedup.cutRepeatedSpans(docsN, "doc_id", "text", spanTokens, 2)
        .agg(sum("n_cut")).head().getLong(0))
    println(f"[scale] span cut: $cut1%d tokens cut @1x ($cutSec1%.2f s) -> $cutN%d @x$replicas ($cutSecN%.2f s); time grew ${cutSecN / cutSec1}%.1fx for ${replicas}x docs (merge scan — linear per row)")
    if (cutSecN > cutSec1 * replicas * 3)
      failures += f"span-cut time grew ${cutSecN / cutSec1}%.1fx at ${replicas}x — per-row bound no longer linear"

    failures.foreach(f => System.err.println(s"[scale] FAIL $f"))
    spark.stop()
    if (failures.nonEmpty) sys.exit(4)
  }
}
