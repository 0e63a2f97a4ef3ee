package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance fuzzy matching — the entity-resolution / record-linkage
  * primitive (near-identical product names, misspelled titles) the
  * exact and shingle-based dedup tiers cannot express: Jaccard over
  * word sets misses single-character typos entirely on short strings.
  *
  * Blocking uses the deletion-neighborhood scheme (FastSS /
  * Symmetric Delete): every string emits itself plus each
  * single-deletion variant as candidate keys. Two strings within edit
  * distance 1 ALWAYS share a key — a substitution at position i makes
  * both delete-at-i variants equal, and an insertion's deletion variant
  * IS the shorter string — so the bucket join is complete, and the
  * exact `levenshtein` verify (a native expression in both Spark and
  * the oracle engine) runs only on candidates. Linear key emission
  * (length + 1 keys per string), hash-partitioned bucket join, no
  * all-pairs anywhere.
  */
object FuzzyJoin {

  /** The string and every variant with up to `depth` characters
    * deleted, deduplicated. depth 1 emits l+1 keys; depth 2 emits
    * O(l^2/2) — fine for the short strings entity resolution targets.
    */
  private def deletionKeys(c: String, depth: Int): org.apache.spark.sql.Column = {
    val d1 =
      s"""transform(sequence(0, length($c), 1),
         |  i -> CASE WHEN i = 0 THEN $c
         |       ELSE concat(substring($c, 1, i - 1), substring($c, i + 1)) END)""".stripMargin
    depth match {
      case 1 => expr(s"array_distinct($d1)")
      case 2 =>
        // pairs 0 <= i <= j <= length: (0,0) keeps the string, (0,j)
        // deletes j, (i, j>i) deletes both; (i,i>=1) re-emits the
        // single deletion (deduplicated below)
        expr(
          s"""array_distinct(flatten(transform(sequence(0, length($c), 1),
             |  i -> transform(sequence(i, length($c), 1),
             |    j -> CASE
             |      WHEN i = 0 AND j = 0 THEN $c
             |      WHEN i = 0 THEN concat(substring($c, 1, j - 1), substring($c, j + 1))
             |      WHEN j = i THEN concat(substring($c, 1, i - 1), substring($c, i + 1))
             |      ELSE concat(substring($c, 1, i - 1), substring($c, i + 1, j - i - 1), substring($c, j + 1))
             |    END))))""".stripMargin)
      case other =>
        throw new IllegalArgumentException(s"maxDist must be 1 or 2, got $other")
    }
  }

  /** Distinct value pairs of `textCol` within edit distance `maxDist`
    * (1 or 2), over the DISTINCT value domain — identical values
    * collapse BEFORE pairing (the exact-collapse stance: a value
    * repeated k times must not produce a k^2 clique; expanding matches
    * back to row ids is a join-back on the value). Blocking at depth d
    * is complete for Levenshtein distance <= d (the SymSpell symmetric-
    * delete property: any d-edit alignment leaves both strings with a
    * common <= d-deletion form). Output: (a_name, b_name, dist) with
    * a_name < b_name and 1 <= dist <= maxDist (equal values are exact
    * duplicates and excluded by construction).
    */
  def nearNamePairs(df: DataFrame, textCol: String, maxDist: Int = 1): DataFrame = {
    val names = df.select(col(textCol).as("name"))
      .where(col("name").isNotNull)
      .distinct()
    val keyed = names.select(col("name"), explode(deletionKeys("name", maxDist)).as("k"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("a_name"), col("b.name").as("b_name"))
      .distinct()
      .select(col("a_name"), col("b_name"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** CROSS-dataset record linkage: value pairs within edit distance
    * `maxDist` between TWO relations' value domains — the "link the
    * vendor catalog to ours" form of fuzzy matching, where the
    * self-join's `a < b` dedup does not apply (the same value on both
    * sides IS a link, at distance 0). Same complete
    * deletion-neighborhood blocking, both sides collapsed to their
    * distinct value domains first, exact `levenshtein` verify on
    * candidates only. Output: (a_name, b_name, dist) with
    * 0 <= dist <= maxDist — one row per linked value pair.
    */
  def linkNamePairs(
      dfA: DataFrame, colA: String,
      dfB: DataFrame, colB: String,
      maxDist: Int = 1): DataFrame = {
    def keyed(df: DataFrame, c: String) =
      df.select(col(c).as("name")).where(col("name").isNotNull).distinct()
        .select(col("name"), explode(deletionKeys("name", maxDist)).as("k"))
    keyed(dfA, colA).as("a")
      .join(keyed(dfB, colB).as("b"), col("a.k") === col("b.k"))
      .select(col("a.name").as("a_name"), col("b.name").as("b_name"))
      .distinct()
      .select(col("a_name"), col("b_name"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .where(col("dist") <= maxDist)
  }

  /** The full entity-resolution loop over [[nearNamePairs]]: fuzzy
    * value pairs -> transitive closure -> one CANONICAL value per
    * connected family -> row-id join-back. The canonical value is the
    * family's minimum member under Spark's binary (UTF-8 byte)
    * ordering — [[Dedup.duplicateClusters]] picks it regime-
    * independently (driver union-find and distributed label
    * propagation agree, non-ASCII included). Values in no fuzzy pair
    * are their own canonical form (left join + coalesce, no row lost).
    *
    * Scale shape: clustering runs over the DISTINCT VALUE pair graph
    * (the exact-collapse stance — bounded by the value domain, not the
    * row count); the join-back is one hash join from rows to the
    * value->canonical map. `textCol` must not be named `canonical`.
    * Output: (idCol, textCol, canonical) — one row per input row with
    * a non-null `textCol`.
    */
  def resolveEntities(
      df: DataFrame, idCol: String, textCol: String, maxDist: Int = 1): DataFrame = {
    require(textCol != "canonical", "resolveEntities: textCol collides with output column")
    df.select(col(idCol), col(textCol))
      .where(col(textCol).isNotNull)
      .join(canonicalMap(df, textCol, maxDist), Seq(textCol), "left")
      .select(col(idCol), col(textCol),
        coalesce(col("__fz_canonical"), col(textCol)).as("canonical"))
  }

  /** Field-level survivorship on top of [[resolveEntities]] — the
    * "golden record" an MDM pipeline publishes: one row per canonical
    * entity, each requested field taken from the LOWEST-id member row
    * where that field is non-null (a deterministic completeness-first
    * merge: a family where only one member carries a brand keeps it,
    * and ties resolve by id so both engines agree). ONE hash join of
    * the bounded value->canonical map onto the rows, then one
    * aggregate of `min_by` columns — no window, no sort, map-side
    * combinable. `idCol` values must be unique (they are row ids) or
    * the min_by tie is engine-defined. Null-`textCol` rows are dropped
    * like [[resolveEntities]] drops them.
    *
    * With `priorityCol` set, survivorship adds SOURCE PRECEDENCE — the
    * multi-source MDM merge where the CRM's value beats the web
    * crawl's: each field comes from the non-null member with the
    * LOWEST (priority, id) pair, so a smaller priority number wins and
    * ids break ties within a source tier. The ordering key is a
    * two-field struct compared lexicographically — the same one-pass
    * `min_by` aggregate, still map-side combinable. A member with a
    * NULL priority never wins a field (its ordering key is null, the
    * `arg_min` null-key semantics — rank every source explicitly; an
    * unranked one would otherwise sort ahead of every real tier).
    * Output: (canonical, n_members, valueCols...).
    */
  def goldenRecords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      valueCols: Seq[String],
      maxDist: Int = 1,
      priorityCol: Option[String] = None): DataFrame = {
    require(valueCols.nonEmpty, "goldenRecords: no value columns")
    val ord: String => org.apache.spark.sql.Column = priorityCol match {
      case None    => c => when(col(c).isNotNull, col(idCol))
      // the null-priority guard lives in the ordering key itself: a
      // struct(null, id) would sort BEFORE every real tier in Spark's
      // struct ordering and silently win — nulling the whole key makes
      // min_by skip the row, exactly what arg_min does to a null key
      case Some(p) => c => when(col(c).isNotNull && col(p).isNotNull,
        struct(col(p), col(idCol)))
    }
    df.where(col(textCol).isNotNull)
      .join(canonicalMap(df, textCol, maxDist), Seq(textCol), "left")
      .withColumn("canonical", coalesce(col("__fz_canonical"), col(textCol)))
      .groupBy(col("canonical"))
      .agg(
        count(lit(1)).as("n_members"),
        valueCols.map(c => min_by(col(c), ord(c)).as(c)): _*)
  }

  /** The bounded value -> canonical-value map both surfaces join back:
    * fuzzy pairs over the DISTINCT value domain, transitive closure,
    * min member by UTF-8 bytes. Values in no pair are absent (callers
    * coalesce to the value itself).
    */
  private def canonicalMap(df: DataFrame, textCol: String, maxDist: Int): DataFrame = {
    val pairs = nearNamePairs(df, textCol, maxDist)
      .select(col("a_name").as("a_id"), col("b_name").as("b_id"))
    Dedup.duplicateClusters(pairs)
      .select(col("id").as(textCol), col("cluster_id").as("__fz_canonical"))
  }
}
