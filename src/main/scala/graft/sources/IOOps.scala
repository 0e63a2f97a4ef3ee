package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (reference: src/io/ + src/helpers/{jsonl,csv,
  * parquet,avro,xml}.rs). The reference hand-rolls sharded readers and
  * parallel writers per format; in Spark each is the native DataFrame
  * reader/writer, which already does split planning (row-groups, line
  * ranges), compression-by-extension (reference: src/io/compression.rs),
  * glob expansion (reference: src/io/glob.rs) and parallel sharded
  * writes — so these helpers are deliberately thin and exist to pin the
  * reference's semantics (schema-on-read, header options, deterministic
  * roundtrips) behind a stable API.
  */
object IOOps {

  // JSONL: Spark's json source IS newline-delimited JSON
  // (reference: src/io/jsonl.rs)
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def readJsonl(spark: SparkSession, path: String): DataFrame = spark.read.json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  // CSV with explicit header handling (reference: src/io/csv.rs)
  def readCsv(spark: SparkSession, path: String, schema: StructType, header: Boolean): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  def writeCsv(df: DataFrame, path: String, header: Boolean): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", header.toString).csv(path)

  // Parquet (reference: src/io/parquet.rs — row-group sharding is native)
  def readParquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Hive-style partitioned parquet write. Reads with a filter on the
    * partition column prune whole directories at planning time
    * (`PartitionFilters` in the scan) — at 100 TB this is the difference
    * between scanning one date/priority slice and scanning everything.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed external parquet table (hash-bucketed by `bucketCol` into
    * `numBuckets` files per partition, sorted within buckets). Two
    * tables bucketed by their join key with the same bucket count join
    * WITHOUT a shuffle — the pre-partitioning replaces the Exchange on
    * both sides, which is the co-located-join story a repeated 100 TB
    * fact-fact join needs. Bucketing metadata lives in the session
    * catalog, so reads must go through `spark.table(table)`.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      bucketCol: String,
      numBuckets: Int
  ): Unit = {
    val spark = df.sparkSession
    // backtick-quote each name PART so an odd (or crafted) table name
    // can't break out of the statement (literal backticks doubled per
    // SQL identifier rules) — quoting the whole name as one identifier
    // would make DROP and saveAsTable address different tables for any
    // database-qualified name like "sales.daily"
    val quoted = table.split('.').map(p => "`" + p.replace("`", "``") + "`").mkString(".")
    spark.sql(s"DROP TABLE IF EXISTS $quoted")
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Checkpoint: materialize to durable storage and re-read, cutting
    * lineage (reference: src/checkpoint.rs — its progress-tracking
    * checkpoints map to durable parquet + re-read; Structured Streaming
    * has real checkpoint dirs for the streaming tier).
    */
  def checkpoint(df: DataFrame, path: String): DataFrame = {
    writeParquet(df, path)
    df.sparkSession.read.parquet(path)
  }
}
