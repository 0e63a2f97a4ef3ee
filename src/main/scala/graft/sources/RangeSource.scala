package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Custom DataSource V2 — the Spark analog of the reference's
  * `from_custom_source` extension point (reference:
  * src/helpers/stdlib.rs:160 + the `VecOps` len/split contract,
  * src/type_token.rs:59-80): the source declares its length and how to
  * split itself into independent shards; the engine schedules one task
  * per shard.
  *
  * This implementation generates `rows` deterministic (id, value) rows
  * across `slices` input partitions:
  * `spark.read.format("graft.sources.RangeSource").option("rows", n).option("slices", k)`.
  * Values are content-hashed from the id, so any slicing produces the
  * same multiset — the splitting contract a 100 TB source must obey.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = RangeSource.schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]
  ): Table = new RangeTable(
    properties.getOrDefault("rows", "1000").toLong,
    properties.getOrDefault("slices", "4").toInt
  )
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", LongType, nullable = false)
  ))
}

private class RangeTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows, $slices)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new RangeScan(rows, slices)
}

private class RangeScan(rows: Long, slices: Int) extends Scan with Batch {
  require(slices > 0, s"graft range source: the 'slices' option must be > 0, got $slices")
  override def readSchema(): StructType = RangeSource.schema
  override def toBatch: Batch = this

  // VecOps::split analog: contiguous chunks, one per slice
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0L until rows by per).map(start =>
      RangePartition(start, math.min(start + per, rows)): InputPartition
    ).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[RangePartition]
      new PartitionReader[InternalRow] {
        private var i = p.start - 1
        override def next(): Boolean = { i += 1; i < p.end }
        override def get(): InternalRow =
          InternalRow(i, graft.combiners.Hashing.hashLong(i))
        override def close(): Unit = ()
      }
    }
}

private case class RangePartition(start: Long, end: Long) extends InputPartition
