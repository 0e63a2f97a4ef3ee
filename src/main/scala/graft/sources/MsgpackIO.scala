package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal MessagePack codec over the wire format's published spec:
  * nil/bool/int (fix/8/16/32/64, signed+unsigned)/float32/float64/
  * str (fixstr/8/16/32)/bin (8/16/32)/array (fix/16/32). Writes use the
  * smallest canonical encoding, matching the compact-struct-as-array
  * convention the reference inherits from its serde codec
  * (reference: src/io/msgpack.rs:26 "serializes structs compactly as
  * arrays"; format notes :18-22).
  */
object MsgpackCodec {

  def writeLong(o: DataOutputStream, l: Long): Unit =
    if (l >= 0 && l <= 127) o.writeByte(l.toInt)
    else if (l >= -32 && l < 0) o.writeByte((l & 0xff).toInt)
    else if (l >= Byte.MinValue && l <= Byte.MaxValue) { o.writeByte(0xd0); o.writeByte(l.toInt) }
    else if (l >= Short.MinValue && l <= Short.MaxValue) { o.writeByte(0xd1); o.writeShort(l.toInt) }
    else if (l >= Int.MinValue && l <= Int.MaxValue) { o.writeByte(0xd2); o.writeInt(l.toInt) }
    else { o.writeByte(0xd3); o.writeLong(l) }

  def writeArrayHeader(o: DataOutputStream, n: Int): Unit =
    if (n < 16) o.writeByte(0x90 | n)
    else if (n < 65536) { o.writeByte(0xdc); o.writeShort(n) }
    else { o.writeByte(0xdd); o.writeInt(n) }

  def writeValue(o: DataOutputStream, v: Any): Unit = v match {
    case null                => o.writeByte(0xc0)
    case b: Boolean          => o.writeByte(if (b) 0xc3 else 0xc2)
    case i: Int              => writeLong(o, i.toLong)
    case l: Long             => writeLong(o, l)
    case f: Float            => o.writeByte(0xca); o.writeFloat(f)
    case d: Double           => o.writeByte(0xcb); o.writeDouble(d)
    case s: String =>
      val b = s.getBytes(UTF_8)
      if (b.length < 32) o.writeByte(0xa0 | b.length)
      else if (b.length < 256) { o.writeByte(0xd9); o.writeByte(b.length) }
      else if (b.length < 65536) { o.writeByte(0xda); o.writeShort(b.length) }
      else { o.writeByte(0xdb); o.writeInt(b.length) }
      o.write(b)
    case b: Array[Byte] =>
      if (b.length < 256) { o.writeByte(0xc4); o.writeByte(b.length) }
      else if (b.length < 65536) { o.writeByte(0xc5); o.writeShort(b.length) }
      else { o.writeByte(0xc6); o.writeInt(b.length) }
      o.write(b)
    case other => throw new IllegalArgumentException(s"msgpack: unsupported value $other (${other.getClass})")
  }

  /** Read one value; throws EOFException at a clean end-of-stream
    * (the reference's clean-EOF loop contract,
    * reference: src/io/msgpack.rs:77-108).
    */
  def readValue(in: DataInputStream): Any = {
    val t = in.readUnsignedByte()
    t match {
      case x if x <= 0x7f        => x.toLong
      case x if x >= 0xe0        => x.toByte.toLong
      case x if (x & 0xe0) == 0xa0 => readStr(in, x & 0x1f)
      case x if (x & 0xf0) == 0x90 => readArr(in, x & 0x0f)
      case 0xc0 => null
      case 0xc2 => false
      case 0xc3 => true
      case 0xc4 => readBin(in, in.readUnsignedByte())
      case 0xc5 => readBin(in, in.readUnsignedShort())
      case 0xc6 => readBin(in, in.readInt())
      case 0xca => in.readFloat()
      case 0xcb => in.readDouble()
      case 0xcc => in.readUnsignedByte().toLong
      case 0xcd => in.readUnsignedShort().toLong
      case 0xce => in.readInt().toLong & 0xffffffffL
      case 0xcf => in.readLong() // uint64; values > Long.MaxValue wrap (unsupported)
      case 0xd0 => in.readByte().toLong
      case 0xd1 => in.readShort().toLong
      case 0xd2 => in.readInt().toLong
      case 0xd3 => in.readLong()
      case 0xd9 => readStr(in, in.readUnsignedByte())
      case 0xda => readStr(in, in.readUnsignedShort())
      case 0xdb => readStr(in, in.readInt())
      case 0xdc => readArr(in, in.readUnsignedShort())
      case 0xdd => readArr(in, in.readInt())
      case other => throw new IllegalArgumentException(f"msgpack: unsupported type byte 0x$other%02x")
    }
  }

  private def readStr(in: DataInputStream, n: Int): String = {
    val b = new Array[Byte](n); in.readFully(b); new String(b, UTF_8)
  }
  private def readBin(in: DataInputStream, n: Int): Array[Byte] = {
    val b = new Array[Byte](n); in.readFully(b); b
  }
  private def readArr(in: DataInputStream, n: Int): IndexedSeq[Any] =
    (0 until n).map(_ => readValue(in))
}

/** MessagePack source/sink: each record is one self-delimiting msgpack
  * array of field values (schema order), records concatenated per
  * part-file with no header or sync marker — byte-concatenable shards
  * exactly like the reference's files (reference: src/io/msgpack.rs:
  * read_msgpack_vec :172, write_msgpack_vec :192, write_msgpack_par
  * :235 — the per-partition parallel writer this mirrors). Fully
  * distributed: one part-file per partition on write, one read task
  * per part-file on read (the reference shards by record count, not
  * byte offset, for the same reason: the format is not
  * offset-splittable, src/io/msgpack.rs:20-22).
  *
  * Supported field types mirror AvroIO: long/int/double/float/string/
  * boolean/binary, nullable.
  */
object MsgpackIO {

  def write(df: DataFrame, path: String): Unit = {
    val schema = df.schema
    val out = new Path(path)
    val driverConf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(out.toUri, driverConf)
    fs.delete(out, true): Unit
    fs.mkdirs(out): Unit
    // ship the DRIVER's Hadoop configuration to the executors
    // (Configuration is Writable, not Serializable): a bare `new
    // Configuration()` on the executor would drop every spark.hadoop.*
    // setting — object-store credentials, endpoint overrides, the
    // default FS — so writes would fail auth or scatter part files
    // over executor-local disks while the driver prepared a different
    // filesystem
    val confBytes = {
      val baos = new java.io.ByteArrayOutputStream()
      val dos = new DataOutputStream(baos)
      driverConf.write(dos)
      dos.close()
      baos.toByteArray
    }
    df.rdd
      .mapPartitionsWithIndex { (idx, it) =>
        val conf = new Configuration()
        conf.readFields(new DataInputStream(new java.io.ByteArrayInputStream(confBytes)))
        val pfs = FileSystem.get(new Path(path).toUri, conf)
        val part = new Path(path, f"part-$idx%05d.msgpack")
        val o = new DataOutputStream(new BufferedOutputStream(pfs.create(part, true)))
        var n = 0L
        it.foreach { row =>
          MsgpackCodec.writeArrayHeader(o, schema.length)
          var i = 0
          while (i < schema.length) {
            MsgpackCodec.writeValue(o, if (row.isNullAt(i)) null else row.get(i))
            i += 1
          }
          n += 1
        }
        o.close()
        Iterator.single(n)
      }
      .count(): Unit
  }

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fields = schema.fields
    val rows = spark.sparkContext
      .binaryFiles(s"$path/part-*")
      .flatMap { case (name, stream) =>
        // clean end-of-file is ONLY an EOF at a record boundary (the
        // first header byte); an EOFException mid-record means a torn
        // part file (killed writer, partial upload) and must fail
        // loudly — mapping it to end-of-stream would silently drop rows
        val pb = new java.io.PushbackInputStream(
          new BufferedInputStream(stream.open(): InputStream), 1)
        val in = new DataInputStream(pb)
        Iterator.continually {
          val first = pb.read()
          if (first == -1) { in.close(); None }
          else {
            pb.unread(first)
            try Some(MsgpackCodec.readValue(in))
            catch {
              case e: EOFException =>
                in.close()
                throw new java.io.IOException(
                  s"MsgpackIO: truncated stream in $name — EOF inside a record", e)
            }
          }
        }.takeWhile(_.isDefined).map { rec =>
          val vals = rec.get.asInstanceOf[IndexedSeq[Any]]
          Row.fromSeq(fields.zipWithIndex.map { case (f, i) =>
            val raw = if (i < vals.length) vals(i) else null
            if (raw == null) null
            else f.dataType match {
              case LongType    => raw.asInstanceOf[Long]
              case IntegerType => raw.asInstanceOf[Long].toInt
              case DoubleType  => raw.asInstanceOf[Double]
              case FloatType   => raw.asInstanceOf[Float]
              case BooleanType => raw.asInstanceOf[Boolean]
              case StringType  => raw.asInstanceOf[String]
              case BinaryType  => raw.asInstanceOf[Array[Byte]]
              case dt => throw new IllegalArgumentException(s"MsgpackIO: unsupported type $dt")
            }
          }.toIndexedSeq)
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
