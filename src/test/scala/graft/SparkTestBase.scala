package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = Sessions.get(cores = 4)
}

trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  /** Every regular file under `root`: relative path -> (size, mtime).
    * The O(increment)/O(delta) maintenance assertions compare these
    * snapshots — "the base index was not touched" is exactly "its
    * listing is identical". One definition, so every suite asserts
    * untouchedness with the same strength (size AND mtime).
    */
  protected def fileListing(root: String): Map[String, (Long, Long)] =
    SmokeFiles.fileListing(root)
}
