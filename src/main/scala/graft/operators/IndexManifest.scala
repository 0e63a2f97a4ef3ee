package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The commit-marker protocol shared by every on-disk index this
  * library publishes (the BM25 postings set in [[Retrieval]], the
  * IVF-PQ vector index in [[Similarity]]): a one-row parquet table
  * written strictly AFTER every data table of a build. Its presence
  * certifies the tables under `path` are a consistent set from one
  * build; builders delete it FIRST, so a crash mid-(re)build leaves an
  * index that loudly refuses to serve instead of serving
  * mixed-generation results.
  */
private[operators] object IndexManifest {

  /** `flavor` names the encode variant when an index family has more
    * than one (e.g. direct vs residual PQ codes) — it is part of the
    * index identity, so maintenance paths validate it via
    * [[requireFlavor]] instead of trusting caller discipline.
    */
  def write(spark: SparkSession, path: String, version: Int = 1, flavor: String = ""): Unit =
    spark.range(1).select(lit(version).as("format_version"), lit(flavor).as("flavor"))
      .write.mode("overwrite").parquet(s"$path/manifest")

  def clear(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Fails loudly when no complete index sits at `path`, or when the
    * index on disk predates the table set the caller needs
    * (`minVersion`): a maintenance path that reads a table an older
    * build never wrote must say "rebuild", not die mid-update with an
    * opaque missing-parquet error. `what` names the index flavor in
    * the error (e.g. "BM25", "IVF-PQ").
    */
  def requirePresent(
      spark: SparkSession, path: String, what: String, minVersion: Int = 1): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/manifest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p),
      s"no complete $what index at $path: manifest missing (build interrupted or never run)")
    if (minVersion > 1) {
      val v = spark.read.parquet(s"$path/manifest")
        .select("format_version").head().getInt(0)
      require(v >= minVersion,
        s"$what index at $path is format version $v but this operation needs >= $minVersion " +
          "— rebuild the index with the current builder")
    }
  }

  /** Fails loudly when the index at `path` was built with a different
    * encode flavor than the operation expects — merging direct codes
    * into a residual index (or vice versa) would serve silently wrong
    * scores, the exact corruption the manifest exists to prevent.
    */
  def requireFlavor(
      spark: SparkSession, path: String, what: String, expected: String): Unit = {
    val f = spark.read.parquet(s"$path/manifest").select("flavor").head().getString(0)
    require(f == expected,
      s"$what index at $path was built with encode flavor '$f' but this operation " +
        s"expects '$expected' — the flavor is part of the index identity; " +
        "pass the matching flag or rebuild")
  }
}
