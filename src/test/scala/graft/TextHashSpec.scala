package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins the native per-row minhash/simhash expressions to the
  * compositional SQL forms they replaced (explode + md5 aggregates) —
  * the DuckDB oracles compute exactly those forms, so any divergence
  * here is a correctness-gate failure waiting to happen.
  */
class TextHashSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "pack my box with five dozen liquor jugs"),
    (2L, "a a a repeated repeated tokens tokens tokens"),
    (3L, "unicode tøkens påss thrôugh ütf8 cleanly"),
    (4L, "two words"),
    (5L, "lone"),           // no shingles: dropped by minhash, kept by simhash
    (6L, ""),               // split("") = [""]: one empty token
    (7L, "x " * 200 + "y")  // long doc
  ).toDF("doc_id", "text")

  /** The pre-expression minhash plan: shingle HOF -> explode -> one md5
    * per shingle split into unsigned 32-bit halves -> 8-way
    * min(double-hash) aggregate. Kept here as the semantic reference —
    * it is exactly the SQL shape the DuckDB oracles compute.
    */
  private def minhashComposed(numHashes: Int) = {
    val toks = split(col("text"), " ")
    val shingles = when(size(toks) < 2, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
    val h = md5(col("sh").cast("binary"))
    val sh = docs.select(col("doc_id"), explode(shingles).as("sh"))
      .select(
        col("doc_id"),
        conv(substring(h, 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(h, 9, 8), 16, 10).cast("long").as("h2"))
    val sigCols = (0 until numHashes).map { i =>
      min((col("h1") + lit(i.toLong) * col("h2")) % lit(4294967296L)).as(s"sig$i")
    }
    sh.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
  }

  /** The pre-expression simhash plan: token explode -> 16 signed sums. */
  private def simhashComposed(bits: Int) = {
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val t = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .select(col("doc_id"), md5(col("tok").cast("binary")).as("h"))
    val sums = (0 until bits).map { j =>
      sum(when(substring(col("h"), j + 1, 1).isInCollection(hexHigh), lit(1)).otherwise(lit(-1))).as(s"s$j")
    }
    val agg = t.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
    val fp = (0 until bits).map(j => when(col(s"s$j") >= 0, lit(1 << j)).otherwise(lit(0))).reduce(_ + _)
    agg.select(col("doc_id"), fp.cast("int").as("simhash"))
  }

  test("native minhash matches the explode+groupBy reference, including dropped docs") {
    val native = Dedup.minhashSignatures(docs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    val composed = minhashComposed(8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(native == composed)
    assert(!native.contains(5L), "single-token doc must have no signature")
  }

  test("native minhash matches the composed form on randomized corpora") {
    // property check: arbitrary token arrays (unicode, repeats, empties,
    // single tokens) — the native expression and the explode+groupBy
    // reference must agree doc-for-doc, value-for-value
    val gen = new scala.util.Random(20260813L)
    val alphabets = Array("abcdefg", "xyz", "äöüß", "日本語テスト", "0123456789")
    def randToken(): String = {
      val a = alphabets(gen.nextInt(alphabets.length))
      (0 until 1 + gen.nextInt(6)).map(_ => a(gen.nextInt(a.length))).mkString
    }
    val randomDocs = (0 until 300).map { i =>
      (i.toLong, (0 until gen.nextInt(30)).map(_ => randToken()).mkString(" "))
    }
    val df = randomDocs.toDF("doc_id", "text")
    val native = Dedup.minhashSignatures(df, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    val toks = split(col("text"), " ")
    val shingles = when(size(toks) < 2, array().cast("array<string>")).otherwise(
      array_distinct(transform(
        sequence(lit(1), size(toks) - 1),
        i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))))
    val h = md5(col("sh").cast("binary"))
    val composed = df.select(col("doc_id"), explode(shingles).as("sh"))
      .select(
        col("doc_id"),
        conv(substring(h, 1, 8), 16, 10).cast("long").as("h1"),
        conv(substring(h, 9, 8), 16, 10).cast("long").as("h2"))
      .groupBy(col("doc_id"))
      .agg(
        min((col("h1") + lit(0L) * col("h2")) % lit(4294967296L)).as("sig0"),
        (1 until 8).map(i =>
          min((col("h1") + lit(i.toLong) * col("h2")) % lit(4294967296L)).as(s"sig$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong)).toMap
    assert(native == composed)
  }

  test("native simhash matches the explode+sum reference for all docs") {
    val native = Dedup.simhash(docs, "doc_id", "text", 16)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val composed = simhashComposed(16)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(native == composed)
    assert(native.contains(6L), "empty text is one empty token, not a dropped doc")
  }

  test("null tokens don't crash: minhash skips null shingles, simhash counts -1 per bit") {
    GraftFunctions.register(spark)
    val withNulls = Seq(
      (0L, Array[String]("alpha", "beta", "gamma")),
      (1L, Array[String]("alpha", null, "gamma")),  // both shingles involve the null
      (2L, Array[String](null, null)),              // all shingles null
      (3L, Array[String]("solo", null, "duo", "trio")) // one valid shingle remains
    ).toDF("doc_id", "toks")
    withNulls.createOrReplaceTempView("nulltok_docs")
    val rows = spark.sql(
      """SELECT doc_id, graft_minhash(toks, 8) AS sigs, graft_simhash(toks, 16) AS fp
         FROM nulltok_docs""").collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(0L).getSeq[Long](1).length == 8)
    assert(rows(1L).getSeq[Long](1).isEmpty, "no valid shingle -> empty signature")
    assert(rows(2L).getSeq[Long](1).isEmpty)
    assert(rows(3L).getSeq[Long](1).length == 8)
    // simhash: null tokens behave as the composed otherwise(-1) branch
    val allNullFp = spark.sql(
      "SELECT graft_simhash(array(cast(null as string), cast(null as string)), 16) AS fp").head().getInt(0)
    assert(allNullFp == 0, "all-null tokens -> every bit count negative -> fp 0")
    assert(rows.values.forall(r => r.getInt(2) >= 0 && r.getInt(2) < (1 << 16)))
  }

  test("native bigram repetition matches the composed transform/array_distinct form") {
    // the semantic reference: the HOF plan the native expression
    // replaced — exactly the SQL shape the DuckDB oracles compute
    def composed(text: org.apache.spark.sql.Column) = {
      val t = split(text, " ")
      val grams = transform(
        sequence(lit(1), size(t) - 1),
        i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
      when(size(t) < 2, lit(0.0)).otherwise(
        round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"), 6))
    }
    val both = docs.select(
      $"doc_id",
      graft.functions.TextFunctions.bigramRepetitionRatio($"text").as("native"),
      composed($"text").as("composed")
    ).collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    both.foreach { case (id, n, c) =>
      assert(n == c, s"doc $id: native $n != composed $c")
    }
    // repeated doc scores high, single-token doc scores 0
    val byId = both.map(t => t._1 -> t._2).toMap
    assert(byId(7L) == 0.99, s"201 tokens, 2 distinct of 200 bigrams -> 0.99: ${byId(7L)}")
    assert(byId(5L) == 0.0)
    // null-token bigrams follow concat_ws null-skipping, like the HOF form
    GraftFunctions.register(spark)
    val nullGram = spark.sql(
      """SELECT graft_bigram_rep(array('a', cast(null as string), 'a', cast(null as string))) AS r"""
    ).head().getDouble(0)
    // grams: [a] [a] [a] (nulls skipped in concat_ws) -> 1 - 1/3
    assert(math.abs(nullGram - 0.666667) < 1e-9, s"got $nullGram")
    assert(spark.sql("SELECT graft_bigram_rep(array(cast(null as string), cast(null as string)))")
      .head().getDouble(0) == 0.0)
  }

  test("native bigram repetition matches the composed form on randomized corpora") {
    // property check: arbitrary token arrays (unicode, repeats, empty
    // strings, single tokens) — native and HOF forms must agree exactly,
    // including the HALF_UP rounding on every ratio
    val gen = new scala.util.Random(20260813L)
    val alphabets = Array("ab", "xyz", "äöü", "語テ", "01")
    def randToken(): String = {
      val a = alphabets(gen.nextInt(alphabets.length))
      (0 until 1 + gen.nextInt(3)).map(_ => a(gen.nextInt(a.length))).mkString
    }
    val randomDocs = (0 until 500).map { i =>
      (i.toLong, (0 until gen.nextInt(25)).map(_ => randToken()).mkString(" "))
    }
    val df = randomDocs.toDF("doc_id", "text")
    val t = split(col("text"), " ")
    val grams = transform(
      sequence(lit(1), size(t) - 1),
      i => concat_ws(" ", element_at(t, i), element_at(t, i + 1)))
    val composedCol = when(size(t) < 2, lit(0.0)).otherwise(
      round(lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams).cast("double"), 6))
    val rows = df.select(
      col("doc_id"),
      graft.functions.TextFunctions.bigramRepetitionRatio(col("text")).as("native"),
      composedCol.as("composed")
    ).collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2),
        s"doc ${r.getLong(0)}: native ${r.getDouble(1)} != composed ${r.getDouble(2)}")
    }
  }

  test("NFC composes decomposed text; strip_accents removes combining marks") {
    import graft.functions.TextFunctions
    // decomposed e + U+0301 vs precomposed U+00E9; ASCII passes through
    // by reference (isNormalized fast path)
    val rows = Seq(
      (1L, "café"), (2L, "café"), (3L, "plain ascii"), (4L, null))
      .toDF("id", "s")
    val got = rows.select(col("id"),
      TextFunctions.normalizeNfc(col("s")).as("nfc"),
      TextFunctions.stripAccents(col("s")).as("flat"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(got(1L) == (("café", "cafe")), s"got ${got(1L)}")
    assert(got(2L) == (("café", "cafe")), s"got ${got(2L)}")
    assert(got(3L) == (("plain ascii", "plain ascii")))
    assert(got(4L) == ((null, null)))
    // after NFC, the two spellings exact-collapse to ONE group — the
    // reason the pass runs before dedup at all
    val groups = Dedup.exactGroups(
      rows.where(col("id") <= 2)
        .select(col("id"), TextFunctions.normalizeNfc(col("s")).as("s")),
      "id", "s").collect()
    assert(groups.length == 1 && groups(0).getLong(2) == 2L,
      s"NFC'd spellings must share one content group: ${groups.toSeq}")
  }

  test("graft_minhash / graft_simhash resolve by SQL name") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("texthash_docs")
    val row = spark.sql(
      """SELECT graft_minhash(split(text, ' '), 8) AS sigs,
         graft_simhash(split(text, ' '), 16) AS fp
         FROM texthash_docs WHERE doc_id = 0""").head()
    assert(row.getSeq[Long](0).length == 8)
    assert(row.getSeq[Long](0).forall(v => v >= 0L && v < (1L << 32)))
    assert(row.getInt(1) >= 0 && row.getInt(1) < (1 << 16))
  }
}
