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

  /** The string and every single-deletion variant, deduplicated. */
  private def deletionKeys(c: String): org.apache.spark.sql.Column =
    expr(
      s"""array_distinct(transform(sequence(0, length($c), 1),
         |  i -> CASE WHEN i = 0 THEN $c
         |       ELSE concat(substring($c, 1, i - 1), substring($c, i + 1)) END))""".stripMargin)

  /** Distinct value pairs of `textCol` within edit distance 1, over the
    * DISTINCT value domain — identical values collapse BEFORE pairing
    * (the exact-collapse stance: a value repeated k times must not
    * produce a k^2 clique; expanding matches back to row ids is a
    * join-back on the value). Output: (a_name, b_name, dist) with
    * a_name < b_name and dist in {1} (equal values are exact duplicates
    * and excluded by construction).
    */
  def nearNamePairs(df: DataFrame, textCol: String): DataFrame = {
    val names = df.select(col(textCol).as("name"))
      .where(col("name").isNotNull)
      .distinct()
    val keyed = names.select(col("name"), explode(deletionKeys("name")).as("k"))
    keyed.as("a")
      .join(keyed.as("b"), col("a.k") === col("b.k") && col("a.name") < col("b.name"))
      .select(col("a.name").as("a_name"), col("b.name").as("b_name"))
      .distinct()
      .select(col("a_name"), col("b_name"),
        levenshtein(col("a_name"), col("b_name")).as("dist"))
      .where(col("dist") <= 1)
  }
}
