package graft

/** Local-filesystem helpers shared by the scale-smoke mains — one copy
  * of the recursive byte count the O(delta) assertions measure with,
  * and of the scratch-dir reset the chains need between runs.
  */
private[graft] object SmokeFiles {

  /** Every regular file under `root`: relative path -> (size, mtime).
    * The O(increment)/O(delta) maintenance assertions compare these
    * snapshots — "the base was not touched" is exactly "its listing
    * is identical". ONE definition (smokes and specs both delegate
    * here), so every byte-identity claim asserts the same strength.
    */
  def fileListing(root: String): Map[String, (Long, Long)] = {
    val base = java.nio.file.Paths.get(root)
    val walk = java.nio.file.Files.walk(base)
    try {
      import scala.jdk.CollectionConverters._
      walk.iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => base.relativize(p).toString ->
          (java.nio.file.Files.size(p),
            java.nio.file.Files.getLastModifiedTime(p).toMillis))
        .toMap
    } finally walk.close()
  }

  /** Materialize an N-replica scale corpus: one frame per replica from
    * `mk` (replica 0 = the base, others the smoke's own id-shift +
    * content transform), unioned and written to `path` so every
    * downstream measurement reads real parquet instead of an in-memory
    * union. ONE definition of the replication plumbing — the smokes
    * differ only in the per-replica transform they pass.
    */
  def replicated(spark: org.apache.spark.sql.SparkSession, n: Int, path: String)(
      mk: Int => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    (0 until n).map(mk).reduce(_ unionByName _)
      .write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Recursive on-disk byte count of a directory tree (0 when absent)
    * — the O(delta) measurement: for a delete root, manifests +
    * tombstone id lists only, its segments carried by reference.
    */
  def duBytes(path: String): Long = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) 0L
    else {
      val s = java.nio.file.Files.walk(p)
      try s.filter(java.nio.file.Files.isRegularFile(_))
        .mapToLong(java.nio.file.Files.size(_)).sum()
      finally s.close()
    }
  }

  def rmrf(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(java.nio.file.Files.delete(_))
      finally s.close()
    }
  }
}
