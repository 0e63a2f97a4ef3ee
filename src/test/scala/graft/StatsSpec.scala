package graft

import org.apache.spark.sql.functions._
import graft.operators.Stats

/** Profiling tier: profile, histogram, and exact-sufficient-statistics
  * correlation on crafted data.
  */
class StatsSpec extends SparkTestBase {
  import spark.implicits._

  test("profile reports rows, nulls, and exact distincts per column") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b")))
      .map { case (i, s) => (i, s.orNull) }.toDF("id", "v")
    val got = Stats.profile(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got("id") == ((4L, 0L, 4L)))
    assert(got("v") == ((4L, 1L, 2L))) // countDistinct ignores nulls
  }

  test("profileBy stratifies the card per group, NULL group included") {
    val df = Seq(("en", "a"), ("en", "a"), ("en", null), ("de", "b"), (null, "c"))
      .toDF("lang", "v")
    val got = Stats.profileBy(df, "lang", Seq("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      "en" -> ((3L, 1L, 1L)),
      "de" -> ((1L, 0L, 1L)),
      (null: String) -> ((1L, 0L, 1L))), s"got $got")
  }

  test("histogram bins fixed-width ranges, drops out-of-range, omits empty bins") {
    val df = Seq(0.5, 1.0, 1.5, 4.9, 5.0, 9.9, 10.0, 11.0).toDF("x")
    // [1, 10) in 3 bins of width 3: [1,4) [4,7) [7,10)
    val got = Stats.histogram(df, "x", lo = 1, hi = 10, bins = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 2L, 1 -> 2L, 2 -> 1L), s"got $got")
  }

  test("corrExact matches hand-computed Pearson r on integer data") {
    val rows = Seq((1L, 2L), (2L, 4L), (3L, 5L), (4L, 4L), (5L, 5L))
    val df = rows.toDF("x", "y")
    val got = Stats.corrExact(df, col("x"), col("y")).collect()(0)
    val n = rows.length.toDouble
    val (sx, sy) = (rows.map(_._1).sum.toDouble, rows.map(_._2).sum.toDouble)
    val sxx = rows.map(r => r._1 * r._1).sum.toDouble
    val syy = rows.map(r => r._2 * r._2).sum.toDouble
    val sxy = rows.map(r => r._1 * r._2).sum.toDouble
    val want = (n * sxy - sx * sy) / (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val rounded = BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.getLong(0) == 5L && got.getDouble(1) == rounded,
      s"got ${got.getDouble(1)}, want $rounded")
    // perfectly correlated data hits exactly 1
    val perfect = Stats.corrExact(Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y"),
      col("x"), col("y")).collect()(0).getDouble(1)
    assert(perfect == 1.0, s"got $perfect")
  }

  test("corrExact widens IntegerType inputs before products (no 2^31 wrap)") {
    // 48000^2 > Int.MaxValue: without the internal long cast the product
    // wraps (non-ANSI) and the correlation silently corrupts
    val df = Seq((46000, 46001), (47000, 47001), (48000, 48001)).toDF("x", "y")
    val got = Stats.corrExact(df, col("x"), col("y")).collect()(0).getDouble(1)
    assert(got == 1.0, s"shifted-copy columns must correlate exactly 1: $got")
  }

  test("flagIntegerOutliers flags exactly the rows above mean + z*stddev") {
    // nine 10s and one 50: mean=14, sigma=12, z=2 threshold 38 -> only
    // the 50 flags (a below-mean row never does; dev must be positive)
    val df = ((1 to 9).map(i => (s"k$i", 10L)) :+ ("spike", 50L)).toDF("k", "n")
    val got2 = Stats.flagIntegerOutliers(df, "n", z = 2)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got2 == ((1 to 9).map(i => s"k$i" -> 0L).toMap + ("spike" -> 1L)), s"got $got2")
    // uniform data flags nothing (dev = 0 is not > 0)
    val uniform = Stats.flagIntegerOutliers(
      Seq(("a", 7L), ("b", 7L)).toDF("k", "n"), "n", z = 2)
      .collect().map(_.getLong(2)).toSet
    assert(uniform == Set(0L), s"got $uniform")
  }

  test("corrExact rejects fractional columns instead of silently truncating them") {
    val df = Seq((19.99, 1L), (29.99, 2L)).toDF("price", "n")
    val e = intercept[IllegalArgumentException] {
      Stats.corrExact(df, col("price"), col("n"))
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }

  test("histogram clamps the float-edge bin into bins-1, never out of contract") {
    // w = 1.0/3 is inexact; the largest double below 1.0 floors to bin 3
    // unclamped — an out-of-contract index the clamp folds into bin 2
    val df = Seq(0.1, 0.5, math.nextAfter(1.0, 0.0)).toDF("x")
    val got = Stats.histogram(df, "x", lo = 0, hi = 1, bins = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == Map(0 -> 1L, 1 -> 1L, 2 -> 1L), s"got $got")
  }

  test("populationStability: identical snapshots score zero, a shifted bin scores positive") {
    val base = Seq(1, 1, 2, 5, 9, 9).toDF("v")
    // identical snapshots: every term is exactly 0 (p = q bin by bin)
    val same = Stats.populationStability(base, base, "v", lo = 0, hi = 10, bins = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(same.nonEmpty && same.forall(_._4 == 0.0), s"got ${same.toSeq}")
    // mass moved from bin 0 to bin 2: both touched bins contribute > 0,
    // the untouched bin 4 contributes 0, and hand-replay matches
    val cur = Seq(1, 4, 5, 5, 9, 9).toDF("v")
    val got = Stats.populationStability(base, cur, "v", lo = 0, hi = 10, bins = 5)
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def term(nb: Long, nc: Long): Double = {
      val p = (nb + 1).toDouble / (6 + 5); val q = (nc + 1).toDouble / (6 + 5)
      math.round((q - p) * math.log(q / p) * 1e6) / 1e6
    }
    assert(got(0) == ((2L, 1L, term(2, 1))), s"got $got")
    assert(got(2) == ((1L, 3L, term(1, 3))), s"got $got")
    assert(got(4) == ((2L, 2L, 0.0)), s"got $got")
    assert(got.values.map(_._3).sum > 0.0)
    // fractional values refuse loudly (fixed-point contract)
    intercept[IllegalArgumentException] {
      Stats.populationStability(Seq(1.5).toDF("v"), base, "v", 0, 10, 5): Unit
    }
  }

  test("stratified PSI equals per-stratum runs of the global operator") {
    // each stratum's report must be exactly what populationStability
    // computes on that stratum's rows alone — strata never leak into
    // each other's shares or totals; NULL strata drop
    val base = Seq(("en", 1), ("en", 5), ("en", 9), ("de", 2), ("de", 2),
      (null.asInstanceOf[String], 7)).toDF("lang", "v")
    val cur = Seq(("en", 1), ("en", 4), ("de", 8), ("de", 9), ("fr", 3)).toDF("lang", "v")
    val got = Stats.populationStabilityBy(base, cur, "v", "lang", lo = 0, hi = 10, bins = 5)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet.map(_._1) == Set("en", "de", "fr"), s"strata: ${got.keySet.map(_._1)}")
    for (lang <- Seq("en", "de", "fr")) {
      val solo = Stats.populationStability(
          base.where($"lang" === lang).select($"v"),
          cur.where($"lang" === lang).select($"v"), "v", lo = 0, hi = 10, bins = 5)
        .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      (0 until 5).foreach { bin =>
        assert(got((lang, bin)) == solo(bin), s"$lang bin $bin: ${got((lang, bin))} vs ${solo(bin)}")
      }
    }
  }

  test("stratified PSI never goes silent: an all-out-of-grid stratum reports a full zero grid") {
    // 'xx' has rows in both snapshots, but every value sits outside
    // [0, 10) — the upstream-corruption shape. The report must carry
    // its full grid with n_base = n_cur = 0 (0 IS the alert), not drop
    // the stratum; same for a stratum whose values are all NULL
    val base = Seq(("en", java.lang.Integer.valueOf(1)),
      ("xx", java.lang.Integer.valueOf(99)),
      ("nn", null.asInstanceOf[java.lang.Integer])).toDF("lang", "v")
    val cur = Seq(("en", java.lang.Integer.valueOf(2)),
      ("xx", java.lang.Integer.valueOf(-5)),
      ("nn", null.asInstanceOf[java.lang.Integer])).toDF("lang", "v")
    val got = Stats.populationStabilityBy(base, cur, "v", "lang", lo = 0, hi = 10, bins = 5)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet.map(_._1) == Set("en", "xx", "nn"),
      s"corrupted strata vanished: ${got.keySet.map(_._1)}")
    for (lang <- Seq("xx", "nn"); bin <- 0 until 5)
      assert(got((lang, bin)) == ((0L, 0L, 0.0)), s"$lang bin $bin: ${got((lang, bin))}")
  }

  test("categorical PSI: identical zero, mix shift positive, vanished category still reports") {
    val base = Seq("en", "en", "en", "de", "de", "fr",
      null.asInstanceOf[String]).toDF("lang")
    val same = Stats.populationStabilityCat(base, base, "lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(same.length == 3 && same.forall(_._4 == 0.0), s"got ${same.toSeq}")
    // fr vanishes, es appears, de doubles — every category reports and
    // the terms hand-replay with the observed-domain (k=4) smoothing
    val cur = Seq("en", "en", "de", "de", "de", "de", "es").toDF("lang")
    val got = Stats.populationStabilityCat(base, cur, "lang")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    def term(nb: Long, nc: Long): Double = {
      val p = (nb + 1).toDouble / (6 + 4); val q = (nc + 1).toDouble / (7 + 4)
      math.round((q - p) * math.log(q / p) * 1e6) / 1e6
    }
    assert(got.keySet == Set("en", "de", "fr", "es"), s"categories: ${got.keySet}")
    assert(got("fr") == ((1L, 0L, term(1, 0))), s"got $got")
    assert(got("es") == ((0L, 1L, term(0, 1))), s"got $got")
    assert(got("de") == ((2L, 4L, term(2, 4))), s"got $got")
    assert(got.values.map(_._3).sum > 0.0)
    // swap symmetry: the term is symmetric in (p, q)
    val swapped = Stats.populationStabilityCat(cur, base, "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    got.foreach { case (lang, (_, _, t)) =>
      assert(math.abs(swapped(lang) - t) <= 1e-6, s"$lang: $t vs ${swapped(lang)}") }
  }

  test("scaleToLong is the sanctioned fixed-point escape hatch into the PSI contract") {
    import org.apache.spark.sql.functions.col
    // continuous quality scores refuse directly...
    val base = Seq(0.111, 0.256, 0.931).toDF("score")
    intercept[IllegalArgumentException] {
      Stats.populationStability(base, base, "score", 0, 1000, 4): Unit
    }
    // ...and pass once scaled; the binning then runs on exact integers
    // and hand-replays from round(score * 1000)
    val cur = Seq(0.112, 0.743, 0.930).toDF("score")
    def scaled(df: org.apache.spark.sql.DataFrame) =
      df.select(Stats.scaleToLong(col("score"), 1000L).as("v"))
    val got = Stats.populationStability(scaled(base), scaled(cur), "v",
        lo = 0, hi = 1000, bins = 4)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(0) == ((1L, 1L)), s"got $got") // 111 vs 112
    assert(got(1) == ((1L, 0L)), s"got $got") // 256
    assert(got(2) == ((0L, 1L)), s"got $got") // 743
    assert(got(3) == ((1L, 1L)), s"got $got") // 931 vs 930
    intercept[IllegalArgumentException] { Stats.scaleToLong(col("score"), 0L): Unit }
    // non-finite inputs FAIL explicitly in every cast mode — legacy
    // casting would silently turn NaN into 0L (a phantom low-bin count
    // in the drift grid) and saturate Infinity; neither may pass
    for (bad <- Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)) {
      val e = intercept[Exception] {
        Seq(0.5, bad).toDF("score")
          .select(Stats.scaleToLong(col("score"), 1000L)).collect()
      }
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).toSeq
      assert(msgs.exists(_.contains("non-finite")),
        s"$bad must raise the scaleToLong guard, got: $msgs")
    }
    // NULL is absent-not-broken and passes through as NULL
    val nullRow = Seq(Some(0.25), None).toDF("score")
      .select(Stats.scaleToLong(col("score"), 100L).as("v")).collect()
    assert(nullRow.map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).sorted.toSeq == Seq(-1L, 25L))
  }

  test("snapshotDiff labels added/removed/changed/unchanged; null text never reads changed") {
    val base = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val cur = Seq(
      (1L, "alpha"),                       // unchanged
      (2L, "beta v2"),                     // changed
      (4L, null.asInstanceOf[String]),     // null both sides: unchanged
      (5L, "delta")                        // added; 3 removed
    ).toDF("doc_id", "text")
    val got = Stats.snapshotDiff(base, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"), s"got $got")
  }
}
