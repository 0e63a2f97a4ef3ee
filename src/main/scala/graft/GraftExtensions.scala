package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{FloatDotProduct, HyperplaneBuckets, MinHashSignatures, SimHashFingerprint, SortedIntersectSize}

/** SparkSessionExtensions entry point: registers graft's native SQL
  * functions so they resolve by name in `spark.sql(...)` / `expr(...)`.
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * programmatically via [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftFunctions.dotFunction)
    ext.injectFunction(GraftFunctions.sortedIntersectSizeFunction)
    ext.injectFunction(GraftFunctions.minhashFunction)
    ext.injectFunction(GraftFunctions.simhashFunction)
    ext.injectFunction(GraftFunctions.hyperplaneBucketFunction)
  }
}

object GraftFunctions {
  val dotFunction: (FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[FloatDotProduct].getName, "graft_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      FloatDotProduct(children(0), children(1))
  )

  val sortedIntersectSizeFunction: (FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) = (
    FunctionIdentifier("graft_sorted_intersect_size"),
    new ExpressionInfo(classOf[SortedIntersectSize].getName, "graft_sorted_intersect_size"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      SortedIntersectSize(children(0), children(1))
  )

  private def litInt(fn: String, arg: String)(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    if (!e.foldable)
      throw new IllegalArgumentException(s"$fn: $arg must be an integer literal, got ${e.sql}")
    e.eval() match {
      case n: Number => n.intValue
      case other =>
        throw new IllegalArgumentException(s"$fn: $arg must be an integer literal, got $other")
    }
  }

  val minhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSignatures].getName, "graft_minhash"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      MinHashSignatures(children(0), litInt("graft_minhash", "numHashes")(children(1)))
  )

  val simhashFunction: (FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHashFingerprint].getName, "graft_simhash"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      SimHashFingerprint(children(0), litInt("graft_simhash", "bits")(children(1)))
  )

  val hyperplaneBucketFunction: (FunctionIdentifier, ExpressionInfo, Seq[org.apache.spark.sql.catalyst.expressions.Expression] => org.apache.spark.sql.catalyst.expressions.Expression) = (
    FunctionIdentifier("graft_hyperplane_bucket"),
    new ExpressionInfo(classOf[HyperplaneBuckets].getName, "graft_hyperplane_bucket"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
      HyperplaneBuckets(children(0), litInt("graft_hyperplane_bucket", "numPlanes")(children(1)))
  )

  /** Register on an already-built session (tests, spark-shell). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot",
      exprs => FloatDotProduct(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sorted_intersect_size",
      exprs => SortedIntersectSize(exprs(0), exprs(1)),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash",
      exprs => MinHashSignatures(exprs(0), litInt("graft_minhash", "numHashes")(exprs(1))),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash",
      exprs => SimHashFingerprint(exprs(0), litInt("graft_simhash", "bits")(exprs(1))),
      "built-in"
    )
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_bucket",
      exprs => HyperplaneBuckets(exprs(0), litInt("graft_hyperplane_bucket", "numPlanes")(exprs(1))),
      "built-in"
    )
  }
}
