package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers. AQE's skew-join splitting (enabled in
  * Sessions) covers joins; for heavily-skewed aggregations the classic
  * fix is salting: spread each hot key over `n` salt buckets, partially
  * aggregate per (key, salt), then aggregate the per-salt partials —
  * two small shuffles instead of one shuffle with a straggler task.
  *
  * The salt is derived from the row's position (partition id + offset
  * via monotonically_increasing_id), not from row CONTENT: a hot key's
  * rows are typically identical (key-only projections, exploded
  * tokens), and a content hash would send all of them to ONE salt
  * bucket — reconstructing the exact straggler salting exists to
  * break, while paying a second shuffle for nothing. Position salting
  * spreads identical rows evenly; the aggregated RESULT is
  * salt-assignment-invariant (sum/count decompositions are associative
  * over any row partition), so retries and repartitioning still yield
  * identical outputs.
  */
object Skew {

  /** Add a salt column in [0, n) derived from the row's position.
    *
    * The salt column itself is NOT stable across task retries or
    * repartitioning — `monotonically_increasing_id` is position-based,
    * so a retried task can assign different salts to the same rows.
    * Consume it only through salt-invariant aggregates (any associative
    * decomposition over row partitions, e.g. [[saltedSum]] /
    * [[saltedCount]]): those results are identical under every salt
    * assignment. Do not join on, persist, or key business logic by the
    * raw salt.
    */
  def withSalt(df: DataFrame, n: Int, saltCol: String = "_salt"): DataFrame =
    df.withColumn(saltCol, pmod(hash(monotonically_increasing_id()), lit(n)))

  /** Skew-safe sum: groupBy(key, salt) partial sums, then groupBy(key)
    * final sums. Numerically identical for integral-cents / long sums
    * (addition of exact values is associative).
    */
  def saltedSum(df: DataFrame, keyCol: String, valueExpr: Column, n: Int, as: String): DataFrame =
    withSalt(df, n)
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(valueExpr).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as(as))

  /** Skew-safe count per key via the same two-stage shape. */
  def saltedCount(df: DataFrame, keyCol: String, n: Int, as: String): DataFrame =
    withSalt(df, n)
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_partial"))
      .groupBy(col(keyCol))
      .agg(sum("_partial").as(as))
}
