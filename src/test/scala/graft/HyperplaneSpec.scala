package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the native HyperplaneBuckets expression to the compositional
  * zip_with/aggregate/md5 form it replaced — the DuckDB oracle for
  * `dedup_embedding` computes exactly those sign bits, so any
  * divergence here is a correctness-gate failure waiting to happen.
  */
class HyperplaneSpec extends SparkTestBase {
  import spark.implicits._

  /** The pre-expression projection: per-plane md5-parity signs via
    * interpreted HOFs. Kept here as the semantic reference.
    */
  private def bucketsComposed(vectors: DataFrame, idCol: String, vecCol: String, nPlanes: Int) = {
    val proj: Column = {
      val planes = (0 until nPlanes).map { p =>
        val signedSum = aggregate(
          zip_with(
            col(vecCol),
            transform(sequence(lit(0), size(col(vecCol)) - 1), i =>
              when(
                substring(md5(concat(lit(p.toString), lit("|"), i.cast("string")).cast("binary")), 1, 1)
                  .isInCollection(Seq("8", "9", "a", "b", "c", "d", "e", "f")),
                lit(1.0)
              ).otherwise(lit(-1.0))
            ),
            (x, s) => x.cast("double") * s
          ),
          lit(0.0),
          (acc, v) => acc + v
        )
        when(signedSum >= 0, lit("1")).otherwise(lit("0"))
      }
      concat(planes: _*)
    }
    vectors.select(col(idCol), proj.as("bucket"))
  }

  private val vecs = Seq(
    (0L, Array(0.1f, -0.2f, 0.3f, 0.9f)),
    (1L, Array(0.1f, -0.2f, 0.3f, 0.9f)),          // duplicate of 0
    (2L, Array(-1.5f, 2.5f, -3.5f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),           // zero vector: all sums 0 -> all '1'
    (4L, Array.empty[Float]),                       // empty: null-padded sums -> all '0'
    (5L, Array(1e-30f, -1e-30f, 1e30f, -1e30f)),   // extreme magnitudes
    (6L, Array(0.25f, 0.5f))                        // shorter vector (ragged dim)
  ).toDF("vec_id", "embedding")

  test("native hyperplane buckets match the composed zip_with/aggregate form bit for bit") {
    val native = Similarity.lshBuckets(vecs, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val composed = bucketsComposed(vecs, "vec_id", "embedding", 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native == composed)
    assert(native(0L) == native(1L), "identical vectors must share a bucket")
    assert(native.values.forall(_.matches("[01]{8}")))
  }

  test("null vector and null elements degrade to the all-'0' bucket like the composed form") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType, nullable = false),
      StructField("embedding", ArrayType(FloatType, containsNull = true), nullable = true)))
    val withNulls = spark.createDataFrame(
      java.util.Arrays.asList(
        Row(0L, Seq[java.lang.Float](1.0f, 2.0f, 3.0f)),
        Row(1L, Seq[java.lang.Float](1.0f, null, 3.0f)), // null element poisons every sum
        Row(2L, null)                                    // null vector
      ), schema)
    val native = Similarity.lshBuckets(withNulls, "vec_id", "embedding", 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val composed = bucketsComposed(withNulls, "vec_id", "embedding", 6)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(native == composed)
    assert(native(1L) == "000000" && native(2L) == "000000")
  }

  test("graft_hyperplane_bucket resolves by SQL name and is deterministic across runs") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("hyperplane_vecs")
    val q = "SELECT vec_id, graft_hyperplane_bucket(embedding, 8) AS bucket FROM hyperplane_vecs"
    val first = spark.sql(q).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val second = spark.sql(q).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(first == second)
    assert(first.values.forall(_.length == 8))
  }
}
