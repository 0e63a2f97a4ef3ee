package graft

import graft.combiners._

/** Property-style tests (deterministic generated cases) for the
  * combiner laws the reference's contract demands (reference:
  * is_associative_commutative, src/collection.rs:343-359) and
  * partitioning-invariance — the seq == par oracle
  * (src/runner.rs:11-14): results must be a pure function of the input
  * multiset, independent of how Spark splits it.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private def randomStrings(n: Int): List[String] =
    List.fill(n)(rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString)

  test("crash-injection over the nightly swap state machine: 120 random kill schedules all heal") {
    // The marker/recover/snapshot drills in NightlySpec are
    // example-based; this drives the same post-gate protocol —
    // marker -> flip x N -> snapshot -> marker-clear — through RANDOM
    // kill points and asserts the deployment invariant every time:
    //   (A) a snapshot reader sees yesterday's deployment or
    //       tonight's, NEVER a mix;
    //   (B) one recover() call converges the crashed round to
    //       tonight's roots on every pointer AND the snapshot, and
    //       clears the marker;
    //   (C) a second recover() is a no-op (convergence, not progress).
    // A kill is a PREFIX of the step sequence (a thrown exception
    // inside Nightly.run takes its in-process ROLLBACK path, which is
    // a different — already-drilled — state), executed over prebuilt
    // immutable generations so a schedule costs file metadata, not
    // Spark jobs; every 10th schedule then runs the REAL Nightly.run
    // on top of the healed state to prove the protocol replayed here
    // is the one run() speaks.
    import graft.operators.{DeploymentSnapshot, Nightly, ServePointer, SideIndex}
    import org.apache.spark.sql.functions.col
    val docs = (1L to 10L).map(i => (i, i * 2)).toDF("doc_id", "v")
    val base = java.nio.file.Files.createTempDirectory("graft-swap-prop").toString
    val prnd = new scala.util.Random(20260816L)
    // gen chain per tier family: gen(k+1) = gen(k) minus doc (k+2) —
    // immutable, shared by every schedule (pointer files are the only
    // per-schedule state)
    val tierNames = Seq("a", "b", "c")
    val gens: Map[String, IndexedSeq[String]] = tierNames.map { tn =>
      SideIndex.build(docs, "doc_id", tn, s"$base/$tn-g0")
      val chain = (1 to 3).scanLeft(s"$base/$tn-g0") { (cur, k) =>
        SideIndex.maintain(spark, cur, Some(Seq(k + 1L).toDF("doc_id")), None,
          "doc_id", tn, s"$base/$tn-g$k", maxMaskedRatio = 1.0)
      }
      tn -> chain.toIndexedSeq
    }.toMap
    def hfsDelete(path: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, false): Unit
    }
    def snapGen(snap: Map[String, String], tiers: Seq[String]): Option[Int] =
      (0 to 3).find(g => tiers.forall(tn => snap.get(tn).exists(_.endsWith(
        gens(tn)(g).stripPrefix(base)))))
    for (schedule <- 1 to 120) {
      val nTiers = 2 + prnd.nextInt(2)
      val tiers = tierNames.take(nTiers)
      val rounds = 1 + prnd.nextInt(2)
      val dir = s"$base/s$schedule"
      val snapPath = s"$dir/DEPLOYMENT"
      val marker = s"$dir/round"
      val ptr = tiers.map(tn => tn -> s"$dir/PTR-$tn").toMap
      tiers.foreach(tn => ServePointer.publish(spark, ptr(tn), gens(tn)(0), tn))
      DeploymentSnapshot.publish(spark, snapPath, tiers.map(tn => tn -> gens(tn)(0)))
      for (round <- 1 to rounds) {
        val (from, to) = (round - 1, round)
        // the post-gate swap sequence, killed after a random prefix:
        // k=0 nothing landed; k=1 marker only; k=1+j j tiers flipped;
        // k=nTiers+2 snapshot republished; k=nTiers+3 completed round
        val kill = prnd.nextInt(nTiers + 4)
        def steps(upTo: Int): Unit = {
          if (upTo >= 1) Nightly.writeMarker(spark, marker,
            tiers.map(tn => (tn, ptr(tn), gens(tn)(to), gens(tn)(from))),
            snapshot = Some(snapPath))
          tiers.zipWithIndex.foreach { case (tn, j) =>
            if (upTo >= 2 + j) ServePointer.publish(spark, ptr(tn), gens(tn)(to), tn)
          }
          if (upTo >= nTiers + 2)
            DeploymentSnapshot.publish(spark, snapPath, tiers.map(tn => tn -> gens(tn)(to)))
          if (upTo >= nTiers + 3) hfsDelete(marker)
        }
        steps(kill)
        // (A) reader atomicity at the crash point: the one snapshot
        // read resolves a SINGLE generation across every tier
        val seen = snapGen(DeploymentSnapshot.read(spark, snapPath), tiers)
        assert(seen.contains(from) || seen.contains(to),
          s"schedule $schedule round $round kill $kill: mixed reader view $seen")
        // (B) one heal converges — to tonight when the round's intent
        // landed (marker written), to yesterday when it never did
        Nightly.recover(spark, marker, Some(snapPath)): Unit
        val expected = if (kill >= 1) to else from
        tiers.foreach(tn => assert(
          ServePointer.read(spark, ptr(tn)).endsWith(gens(tn)(expected).stripPrefix(base)),
          s"schedule $schedule round $round kill $kill: pointer $tn not converged"))
        assert(snapGen(DeploymentSnapshot.read(spark, snapPath), tiers).contains(expected),
          s"schedule $schedule round $round kill $kill: snapshot not converged")
        assert(!new java.io.File(marker).exists,
          s"schedule $schedule round $round kill $kill: marker survived the heal")
        // (C) convergence: a second recover has nothing to do
        assert(Nightly.recover(spark, marker, Some(snapPath)).isEmpty)
        // a never-started round replays in full before the next one
        if (kill == 0) steps(nTiers + 3)
      }
      // every 10th schedule: the REAL Nightly.run on the healed state —
      // the protocol above must compose with the actual scheduler path
      if (schedule % 10 == 0) {
        val from = rounds
        val registry = docs.where(!col("doc_id").isin((2L to from + 2L): _*))
          .select("doc_id")
        val (report, _) = Nightly.run(spark,
          tiers.map(tn => Nightly.Tier(tn, registry, "doc_id", ptr(tn),
            () => gens(tn)(from + 1),
            p => SideIndex.read(spark, p, "doc_id", tn).select(col("doc_id")))),
          markerPath = Some(marker), snapshotPath = Some(snapPath))
        assert(report.collect().forall(_.getAs[Boolean]("published")),
          s"schedule $schedule: the post-heal nightly must publish")
        assert(snapGen(DeploymentSnapshot.read(spark, snapPath), tiers).contains(from + 1))
      }
    }
  }

  test("KMV merge is associative+commutative and order-independent") {
    for (trial <- 1 to 8) {
      val xs = randomStrings(20 + trial * 15)
      val parts = 1 + rnd.nextInt(7)
      val agg = new KmvAggregator(16)
      val direct = xs.foldLeft(agg.zero)(agg.reduce)
      val (l, r) = xs.splitAt(xs.length / 2)
      val lBuf = l.foldLeft(agg.zero)(agg.reduce)
      val rBuf = r.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(direct) == agg.finish(agg.merge(lBuf, rBuf)))
      assert(agg.finish(agg.merge(lBuf, rBuf)) == agg.finish(agg.merge(rBuf, lBuf)))

      val once = spark.createDataset(xs).repartition(1)
        .select(new KmvAggregator(16).toColumn.name("e")).as[Double].head()
      val many = spark.createDataset(xs).repartition(parts)
        .select(new KmvAggregator(16).toColumn.name("e")).as[Double].head()
      assert(once == many, s"trial $trial: $once != $many over $parts partitions")
    }
  }

  test("Reservoir sample is a pure function of the input multiset") {
    for (trial <- 1 to 5) {
      val xs = randomStrings(40 + trial * 20)
      val parts = 2 + rnd.nextInt(6)
      def run(p: Int): Seq[String] =
        spark.createDataset(xs).repartition(p)
          .select(new ReservoirAggregator(8, 7L).toColumn.name("s"))
          .as[Array[String]].head().toSeq
      assert(run(1) == run(parts), s"trial $trial not partition-invariant")
    }
  }

  test("TopK merge equals global sort-take") {
    for (_ <- 1 to 10) {
      val xs = List.fill(50)(rnd.nextInt(2001) - 1000)
      val agg = new TopKAggregator[Int](5)
      val viaAgg = xs.foldLeft(agg.zero)(agg.reduce).toSeq
      assert(viaAgg == xs.sorted(Ordering[Int].reverse).take(5))
      val (l, r) = xs.splitAt(xs.length / 2)
      val viaMerge = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(viaMerge.toSeq == viaAgg)
    }
  }

  test("t-digest preserves total weight; quantiles bounded by extrema") {
    for (_ <- 1 to 5) {
      val xs = List.fill(200)(rnd.nextDouble() * 2e6 - 1e6)
      val agg = new TDigestAggregator(50)
      val done = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      assert(math.abs(done.weights.sum - xs.size) < 1e-9)
      assert(TDigest.quantile(done, 0.0) >= xs.min - 1e-9)
      assert(TDigest.quantile(done, 1.0) <= xs.max + 1e-9)
    }
  }

  test("salted aggregation equals direct aggregation") {
    import org.apache.spark.sql.functions._
    val df = Seq.fill(2000)(("hot", rnd.nextInt(100).toLong)) ++ Seq.tabulate(100)(i => (s"k$i", i.toLong))
    val data = df.toDF("k", "v")
    val direct = data.groupBy("k").agg(sum("v").as("s")).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val salted = graft.operators.Skew.saltedSum(data, "k", col("v"), 8, "s")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(direct == salted)
  }

  test("duplicateClusters equals a local union-find on random graphs") {
    for (trial <- 1 to 5) {
      val n = 30 + trial * 25
      val m = n + rnd.nextInt(2 * n)
      val pairs = List.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      // local ground truth: union-find with min-root union
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = parent.keys.map(v => v -> find(v)).toMap
      val got = graft.operators.Dedup.duplicateClusters(pairs.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth, s"trial $trial (n=$n m=${pairs.size})")
    }
  }

  test("updateClusters on a random pair split equals clustering the whole graph") {
    // the incremental merge must be indistinguishable from a full
    // recompute for ANY split of the pair graph into yesterday/today —
    // including empty sides, bridges, and pure-new components
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val m = n + rnd.nextInt(2 * n)
      val pairs = List.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val (oldPairs, newPairs) = pairs.partition(_ => rnd.nextBoolean())
      val truth = graft.operators.Dedup.duplicateClusters(pairs.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val merged = graft.operators.Dedup.updateClusters(
          graft.operators.Dedup.duplicateClusters(oldPairs.toDF("a_id", "b_id")),
          newPairs.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged == truth,
        s"trial $trial (old=${oldPairs.size} new=${newPairs.size}): merge diverged")
    }
  }

  test("removeFromClusters on a random removal set equals clustering the surviving graph") {
    // deletion maintenance must be indistinguishable from a full
    // recompute over (pairs minus removed endpoints) for ANY removal
    // set — including bridge removals that split clusters, removals
    // that dissolve clusters entirely, and empty removal sets
    for (trial <- 1 to 5) {
      val n = 30 + trial * 20
      val m = n + rnd.nextInt(2 * n)
      val pairs = List.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val removedSet = (0L until n).filter(_ => rnd.nextInt(4) == 0).toSet
      val surviving = pairs.filterNot { case (a, b) => removedSet(a) || removedSet(b) }
      val truth = graft.operators.Dedup.duplicateClusters(surviving.toDF("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = graft.operators.Dedup.removeFromClusters(
          graft.operators.Dedup.duplicateClusters(pairs.toDF("a_id", "b_id")),
          pairs.toDF("a_id", "b_id"),
          removedSet.toSeq.toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == truth,
        s"trial $trial (removed=${removedSet.size} of $n): removal maintenance diverged")
    }
  }

  test("incremental fingerprint pairing equals the batch pairs touching the increment") {
    for (trial <- 1 to 5) {
      val n = 40 + trial * 20
      // cluster fingerprints around a few prototypes so near-pairs and
      // exact collisions both occur; full 64-bit domain incl. sign bit
      val protos = Array.fill(4)(rnd.nextLong())
      val fps = (0L until n).map { id =>
        val base = protos(rnd.nextInt(protos.length))
        val flips = rnd.nextInt(4)
        val fp = (0 until flips).foldLeft(base)((f, _) => f ^ (1L << rnd.nextInt(64)))
        (id, fp)
      }
      val incIds = fps.map(_._1).filter(_ % 3 == 0).toSet
      val inc = fps.filter(f => incIds(f._1))
      val corpus = fps.filterNot(f => incIds(f._1))
      val batch = graft.operators.Dedup.fingerprintNearDuplicates(
          fps.toDF("id", "fp"), "id", "fp", bits = 64, maxHamming = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .filter { case (a, b, _) => incIds(a) || incIds(b) }.toSet
      val incr = graft.operators.Dedup.fingerprintNearDuplicatesIncremental(
          inc.toDF("id", "fp"), corpus.toDF("id", "fp"), "id", "fp",
          bits = 64, maxHamming = 3)
        .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)), r.getInt(2))).toSet
      assert(incr == batch, s"trial $trial: incremental diverged "
        + s"(${(incr -- batch).take(3)} extra, ${(batch -- incr).take(3)} missing)")
    }
  }

  test("incremental semantic pairing equals the batch pairs touching the increment, and chains into updateClusters") {
    for (trial <- 1 to 3) {
      val n = 30 + trial * 15
      val dims = 6
      // vectors clustered around a few prototypes so near-dups occur;
      // the prototypes double as the FROZEN coarse centroids (the
      // trained-model stance the operator contracts)
      val protos = Array.fill(4)(Array.fill(dims)(rnd.nextFloat() * 2f - 1f))
      val vecs = (0L until n).map { id =>
        val base = protos(rnd.nextInt(protos.length))
        (id, base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.1f))
      }
      val incIds = vecs.map(_._1).filter(_ % 3 == 0).toSet
      val inc = vecs.filter(v => incIds(v._1))
      val corpus = vecs.filterNot(v => incIds(v._1))
      def norm(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)), r.getDouble(2))).toSet
      val batchPairs = graft.operators.Similarity.semanticDuplicatePairs(
          vecs.toDF("id", "vec"), "id", "vec", protos, thresholdPct = 90)
      val batch = norm(batchPairs.collect())
        .filter { case (a, b, _) => incIds(a) || incIds(b) }
      val incrPairs = graft.operators.Similarity.semanticDuplicatePairsIncremental(
          inc.toDF("id", "vec"), corpus.toDF("id", "vec"), "id", "vec",
          protos, thresholdPct = 90)
      // a_id is contractually the increment-side endpoint
      incrPairs.collect().foreach(r => assert(incIds(r.getLong(0)),
        s"trial $trial: a_id ${r.getLong(0)} is not an increment id"))
      val incr = norm(incrPairs.collect())
      assert(incr == batch, s"trial $trial: incremental diverged "
        + s"(${(incr -- batch).take(3)} extra, ${(batch -- incr).take(3)} missing)")
      // the daily-delta chain: clusters maintained from yesterday's
      // corpus-only pairs + today's incremental pairs must equal a
      // from-scratch clustering of the full pair graph
      val corpusPairs = graft.operators.Similarity.semanticDuplicatePairs(
        corpus.toDF("id", "vec"), "id", "vec", protos, thresholdPct = 90)
      val merged = graft.operators.Dedup.updateClusters(
          graft.operators.Dedup.duplicateClusters(corpusPairs.select("a_id", "b_id")),
          incrPairs.select("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = graft.operators.Dedup.duplicateClusters(batchPairs.select("a_id", "b_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(merged == truth, s"trial $trial: daily-delta cluster chain diverged")
    }
  }

  test("percent-encoding normalization is idempotent on well-formed input; malformed cascades pin") {
    import org.apache.spark.sql.functions.col
    // normalize(normalize(s)) == normalize(s) whenever every '%' in s
    // starts a valid hex triplet (RFC 3986 well-formed input): after
    // one pass nothing decodable remains. TRUE idempotence for
    // arbitrary malformed %-soup is impossible for ANY replace-pair
    // chain — a digit decode can re-synthesize an occurrence of its
    // OWN pattern ('%3%34' -> '%34'), which no pair ordering fixes —
    // so the malformed contract is instead pinned by golden outputs
    // below, per the operator's DELIBERATE-tradeoff scaladoc.
    val hexChars = "0123456789abcdefABCDEF"
    val safe = "~._-/?=&xyzXYZ059AfF"
    val strings = (1 to 200).map { _ =>
      val len = 1 + rnd.nextInt(12)
      (1 to len).map { _ =>
        if (rnd.nextBoolean()) safe(rnd.nextInt(safe.length)).toString
        else s"%${hexChars(rnd.nextInt(hexChars.length))}${hexChars(rnd.nextInt(hexChars.length))}"
      }.mkString
    } :+ "%7e%7E%41%2f%2F" :+ "" :+ "%7%45"
    // two separate single-pass plans (one composed 336-replace column
    // tree overflows the column-converter stack — the operator itself
    // is one pass deep by construction)
    val once = strings.toDF("s")
      .select(graft.functions.TextFunctions.normalizePctEncoding(col("s")).as("a"))
      .collect().map(_.getString(0)).toSeq
    val twice = once.toDF("s")
      .select(graft.functions.TextFunctions.normalizePctEncoding(col("s")).as("b"))
      .collect().map(_.getString(0)).toSeq
    once.zip(twice).foreach { case (a, b) =>
      assert(a == b, s"not idempotent: '$a' -> '$b'") }
    // malformed-% behavior is deterministic and pinned: bare-% strings
    // normalize to a fixed value, including the self-cascade case
    // where one application leaves a synthesized escape behind
    val malformed = Seq("%a%b%", "%%41%", "%7%45", "%3%34")
      .toDF("s")
      .select(graft.functions.TextFunctions.normalizePctEncoding(col("s")).as("a"))
      .collect().map(_.getString(0)).toSeq
    assert(malformed == Seq("%A%B%", "%A%", "~", "%34"), s"got $malformed")
  }

  test("snapshotDiff statuses partition the id union; identical snapshots read all-unchanged") {
    import org.apache.spark.sql.functions.col
    // random base corpus with nulls; random successor built by random
    // drop / rewrite / insert — the labels must partition the id union
    // and invert the construction exactly
    val baseRows = (0L until 120L).map(i =>
      (i, if (rnd.nextInt(10) == 0) null else s"doc $i ${randomStrings(3).mkString(" ")}"))
    val removed = baseRows.filter(_ => rnd.nextInt(4) == 0).map(_._1).toSet
    val rewritten = baseRows.filter(r => !removed(r._1) && r._2 != null && rnd.nextInt(4) == 0).map(_._1).toSet
    val added = (1000L until 1020L).map(i => (i, s"new doc $i"))
    val curRows = baseRows.filterNot(r => removed(r._1))
      .map { case (i, t) => (i, if (rewritten(i)) t + " v2" else t) } ++ added
    val got = graft.operators.Stats.snapshotDiff(
        baseRows.toDF("doc_id", "text"), curRows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet == baseRows.map(_._1).toSet ++ added.map(_._1),
      "statuses must cover exactly the id union")
    baseRows.foreach { case (i, _) =>
      val want = if (removed(i)) "removed" else if (rewritten(i)) "changed" else "unchanged"
      assert(got(i) == want, s"id $i: got ${got(i)}, want $want")
    }
    added.foreach { case (i, _) => assert(got(i) == "added") }
    // identity: diffing a snapshot against itself is all-unchanged
    val self = graft.operators.Stats.snapshotDiff(
        baseRows.toDF("doc_id", "text"), baseRows.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(_.getString(1)).toSet
    assert(self == Set("unchanged"), s"got $self")
  }

  test("PSI is symmetric under snapshot swap and exactly zero on identical snapshots") {
    import org.apache.spark.sql.functions.col
    // (q-p)·ln(q/p) is invariant under p <-> q, so swapping baseline
    // and current must preserve every per-bin term (with the count
    // columns exchanged); identical snapshots score exactly 0.0
    val a = List.fill(300)(rnd.nextInt(100)).toDF("v")
    val b = List.fill(200)(rnd.nextInt(100) + rnd.nextInt(40)).toDF("v")
    def terms(base: org.apache.spark.sql.DataFrame, cur: org.apache.spark.sql.DataFrame) =
      graft.operators.Stats.populationStability(base, cur, "v", lo = 0, hi = 140, bins = 14)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val ab = terms(a, b)
    val ba = terms(b, a)
    assert(ab.keySet == ba.keySet)
    ab.foreach { case (bin, (nb, nc, t)) =>
      val (nb2, nc2, t2) = ba(bin)
      assert(nb2 == nc && nc2 == nb && t2 == t, s"bin $bin asymmetric: $t vs $t2")
    }
    val self = terms(a, a)
    assert(self.nonEmpty && self.values.forall(_._3 == 0.0))
  }

  test("full-coverage reranked ANN serve equals brute force on random embeddings") {
    import org.apache.spark.sql.functions.col
    // shortlist >= corpus and every cell probed: the compressed stage
    // passes every candidate through, so exact re-ranking must undo
    // ALL quantization error regardless of codebook quality
    val dim = 16
    val emb = (0L until 60L).map(i =>
      (i, Array.fill(dim)((rnd.nextInt(2000) - 1000) / 997.0f).toSeq))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val coarse = graft.operators.Similarity.trainCentroids(emb, "vec_id", "embedding", 4)
    val cb = graft.operators.Similarity.trainProductCodebooks(emb, "vec_id", "embedding", 4, 8)
    val index = graft.operators.Similarity.pqIndex(emb, "vec_id", "embedding", coarse, cb)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val q = emb.where(col("vec_id") < 8)
    val exact = ids(graft.operators.Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 4))
    val rr = ids(graft.operators.Similarity.ivfPqTopKReranked(
      q, index, emb, "vec_id", "embedding", 4, 60, coarse, 4, cb))
    assert(rr == exact, "full-coverage rerank diverged from brute force on random data")
  }

  test("rolling window fingerprints equal a direct per-window recomputation") {
    // the O(1) rolling update (subtract outgoing, multiply, add
    // incoming) must produce the SAME key a from-scratch polynomial
    // fold over each window produces — the update algebra is where a
    // bug would silently merge or split span candidates. Reference
    // recomputation mirrors the expression's constants exactly.
    import org.apache.spark.sql.functions.col
    import org.apache.spark.unsafe.types.UTF8String
    val B = 0x100000001b3L
    def fmix64(v: Long): Long = {
      var x = v
      x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
      x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
      x ^= x >>> 33
      x
    }
    def tokenHash(s: String): Long = {
      val bytes = UTF8String.fromString(s).getBytes
      var h = 0xcbf29ce484222325L
      bytes.foreach(b => { h ^= (b & 0xffL); h *= B })
      fmix64(h)
    }
    for (trial <- 1 to 10) {
      val span = 1 + rnd.nextInt(6)
      // small vocab so windows genuinely repeat; include multi-byte and
      // empty-adjacent shapes via short tokens
      val vocab = Vector("a", "bb", "c", "é", "dd", "e")
      val toks = Vector.fill(span + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length)))
      val expected = (0 to toks.length - span).map { i =>
        toks.slice(i, i + span).foldLeft(0L)((k, t) => k * B + tokenHash(t))
      }
      val got = Seq(toks.mkString(" ")).toDF("text")
        .select(org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expressions.RollingTokenHashes(
            org.apache.spark.sql.graftbridge.Bridge.expression(
              org.apache.spark.sql.functions.split(col("text"), " ")), span)))
        .head().getSeq[Long](0)
      assert(got == expected, s"trial $trial span=$span toks=${toks.take(12)}...")
    }
  }

  test("windowed funnel with an uncuttable window equals the unbounded funnel") {
    // when the window exceeds the log's whole span, the reachable-set
    // recursion and greedy-min must agree exactly (greedy-earliest is
    // optimal precisely when the window cannot strand anything)
    import graft.operators.EventAnalytics
    for (trial <- 1 to 5) {
      val evs = (1 to 150).map { _ =>
        (rnd.nextInt(7).toLong,
          if (rnd.nextBoolean()) "A" else "B",
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(86400) * 1000L))
      }
      val df = evs.toDF("user_id", "event_type", "ts")
      def counts(w: Option[Long]): Map[Int, Long] =
        EventAnalytics.funnel(df, "user_id", "event_type", "ts", Seq("A", "B", "B"), w)
          .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      val unbounded = counts(None)
      val huge = counts(Some(365L * 24 * 3600))
      assert(huge == unbounded, s"trial $trial: windowed $huge != unbounded $unbounded")
    }
  }

  test("sessionStats partitions the event log and agrees with sessionize") {
    import graft.operators.EventAnalytics
    for (trial <- 1 to 5) {
      val evs = (1 to 120).map { i =>
        (i.toLong, rnd.nextInt(5).toLong,
          new java.sql.Timestamp(1700000000000L + rnd.nextInt(7200) * 1000L))
      }
      val df = evs.toDF("event_id", "user_id", "ts")
      val stats = EventAnalytics.sessionStats(df, "user_id", "ts", "event_id", gapSeconds = 300L)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
      // every event lands in exactly one session
      assert(stats.values.map(_._1).sum == evs.length, s"trial $trial: counts don't partition")
      assert(stats.values.forall(_._2 >= 0L), s"trial $trial: negative span")
      // the session set equals sessionize's assignment, per user
      val seqs = EventAnalytics.sessionize(df, "user_id", "ts", "event_id", gapSeconds = 300L)
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      assert(seqs.toSet == stats.keySet, s"trial $trial: session keys diverge")
      // per-session event counts agree between the two views
      val countsFromSeqs = seqs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      assert(countsFromSeqs == stats.map { case (k, v) => k -> v._1 }, s"trial $trial")
    }
  }

  test("integer outlier flags equal an exact BigInt reference, any partitioning") {
    import graft.operators.Stats
    for (trial <- 1 to 5) {
      val xs = List.fill(30 + rnd.nextInt(40))(rnd.nextInt(1000).toLong) :+
        (5000L + rnd.nextInt(5000)) // guarantee one far spike
      val n = BigInt(xs.length)
      val sx = xs.map(BigInt(_)).sum
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
      def ref(x: Long): Long = {
        val dev = BigInt(x) * n - sx
        if (dev > 0 && dev * dev > BigInt(9) * (n * sxx - sx * sx)) 1L else 0L
      }
      val parts = 1 + rnd.nextInt(6)
      val got = Stats.flagIntegerOutliers(
        xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("id", "n").repartition(parts),
        "n", z = 3)
        .collect().map(r => r.getLong(1) -> r.getLong(2))
      assert(got.forall { case (x, f) => f == ref(x) },
        s"trial $trial: ${got.filter { case (x, f) => f != ref(x) }.take(3).toSeq}")
      assert(got.exists(_._2 == 1L), s"trial $trial: the planted spike must flag")
    }
  }
}
