package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types._

/** Record-oriented XML source/sink (reference: src/io/xml.rs +
  * src/helpers/xml.rs — Serde-typed `<record>` elements). One record
  * element per line, so the files are splittable by Spark's text
  * source (the same sharding contract the reference's row-ranged
  * readers provide). Parsing/rendering is per-partition scala-xml —
  * narrow, no shuffle.
  */
object XmlIO {

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def write(df: DataFrame, path: String, rowTag: String = "record"): Unit = {
    val schema = df.schema
    val tag = rowTag
    import df.sparkSession.implicits._
    df.rdd
      .map { row =>
        val fields = schema.fields.zipWithIndex.map { case (f, i) =>
          if (row.isNullAt(i)) s"<${f.name}/>"
          else s"<${f.name}>${escape(row.get(i).toString)}</${f.name}>"
        }
        s"<$tag>${fields.mkString}</$tag>"
      }
      .toDS()
      .write.mode(SaveMode.Overwrite).text(path)
  }

  def read(spark: SparkSession, path: String, schema: StructType, rowTag: String = "record"): DataFrame = {
    val fields = schema.fields
    val rows = spark.read.textFile(path).rdd.map { line =>
      val elem = scala.xml.XML.loadString(line)
      val vs = fields.map { f =>
        val node = (elem \ f.name)
        if (node.isEmpty || (node.text.isEmpty && node.head.child.isEmpty && f.dataType != StringType)) null
        else {
          val txt = node.text
          f.dataType match {
            case LongType    => java.lang.Long.valueOf(txt)
            case IntegerType => java.lang.Integer.valueOf(txt)
            case DoubleType  => java.lang.Double.valueOf(txt)
            case FloatType   => java.lang.Float.valueOf(txt)
            case BooleanType => java.lang.Boolean.valueOf(txt)
            case StringType  => txt
            case dt => throw new IllegalArgumentException(s"XmlIO: unsupported type $dt for ${f.name}")
          }
        }
      }
      Row.fromSeq(vs.toIndexedSeq)
    }
    spark.createDataFrame(rows, schema)
  }
}
