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

  /** XML-escape plus newline/carriage-return character references: the
    * one-record-per-LINE layout is the splittability contract, so a
    * literal newline inside a value would tear the record across two
    * text lines and fail (or corrupt) the read. The XML parser
    * unescapes &#10;/&#13; back to the original characters.
    */
  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\r", "&#13;").replace("\n", "&#10;")

  def write(df: DataFrame, path: String, rowTag: String = "record"): Unit = {
    val schema = df.schema
    val tag = rowTag
    import df.sparkSession.implicits._
    df.rdd
      .map { row =>
        val fields = schema.fields.zipWithIndex.map { case (f, i) =>
          // null fields are OMITTED (reader: absent element -> null);
          // a self-closing element cannot be told apart from an empty
          // STRING, which must roundtrip as "" and not become null
          if (row.isNullAt(i)) ""
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
        // absent element = null (the writer omits null fields); a
        // present-but-empty element is an empty string for StringType
        if (node.isEmpty) null
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
