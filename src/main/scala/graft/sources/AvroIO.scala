package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro object-container-file source/sink (reference: src/io/avro.rs +
  * src/helpers/avro.rs). The Spark distribution here ships no
  * spark-avro connector, so this maps Rows <-> GenericRecords over the
  * bundled avro-mapred input/output formats — fully distributed (one
  * container file per partition on write, Avro block splits on read),
  * no driver materialization.
  *
  * Supported field types mirror the reference's Serde surface:
  * long/int/double/float/string/boolean/bytes, nullable via unions.
  */
object AvroIO {

  /** Build the Avro schema equivalent to a flat StructType. */
  def avroSchema(schema: StructType, recordName: String = "record"): Schema = {
    val fields = schema.fields.map { f =>
      val base = f.dataType match {
        case LongType    => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType  => Schema.create(Schema.Type.DOUBLE)
        case FloatType   => Schema.create(Schema.Type.FLOAT)
        case StringType  => Schema.create(Schema.Type.STRING)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType  => Schema.create(Schema.Type.BYTES)
        case dt => throw new IllegalArgumentException(s"AvroIO: unsupported type $dt for field ${f.name}")
      }
      val fieldSchema =
        if (f.nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, fieldSchema, null, null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    // resolve the filesystem by the TARGET path's scheme — the default
    // FS would throw "Wrong FS" for any s3a://-style path on a cluster
    // whose default is hdfs://
    val outPath = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(outPath.toUri, job.getConfiguration)
    fs.delete(outPath, true): Unit

    df.rdd
      .mapPartitions { it =>
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { row =>
          val rec: GenericRecord = new GenericData.Record(schema)
          sparkSchema.fields.zipWithIndex.foreach { case (f, i) =>
            val v = if (row.isNullAt(i)) null else f.dataType match {
              case StringType => row.getString(i)
              case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _          => row.get(i)
            }
            rec.put(f.name, v)
          }
          (new AvroKey[GenericRecord](rec), NullWritable.get())
        }
      }
      .saveAsNewAPIHadoopFile(
        path,
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        classOf[AvroKeyOutputFormat[GenericRecord]],
        job.getConfiguration
      )
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = new org.apache.hadoop.conf.Configuration(spark.sparkContext.hadoopConfiguration)
    val fields = schema.fields
    val rows = spark.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        conf
      )
      .map { case (k, _) =>
        val rec = k.datum()
        val vs = fields.map { f =>
          val raw = rec.get(f.name)
          if (raw == null) null
          else f.dataType match {
            case StringType => raw.toString
            case BinaryType =>
              val bb = raw.asInstanceOf[java.nio.ByteBuffer]
              val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
            case _ => raw
          }
        }
        Row.fromSeq(vs.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }
}
