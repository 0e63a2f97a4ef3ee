package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.sources.{MsgpackCodec, MsgpackIO}

/** MessagePack codec + distributed roundtrip (reference:
  * src/io/msgpack.rs — flat concatenation of self-delimiting values,
  * compact struct-as-array records, record-count sharding).
  */
class MsgpackSpec extends SparkTestBase {

  private def rt(v: Any): Any = {
    val bo = new ByteArrayOutputStream()
    MsgpackCodec.writeValue(new DataOutputStream(bo), v)
    MsgpackCodec.readValue(new DataInputStream(new ByteArrayInputStream(bo.toByteArray)))
  }

  test("codec roundtrips every scalar shape at its encoding boundaries") {
    // ints cross every width boundary; strings/bins cross fix/8/16 widths
    val longs = Seq(0L, 1L, 127L, 128L, -1L, -32L, -33L, -128L, -129L,
      255L, 256L, 32767L, 32768L, -32768L, -32769L,
      Int.MaxValue.toLong, Int.MaxValue + 1L, Long.MaxValue, Long.MinValue)
    longs.foreach(l => assert(rt(l) == l, s"long $l"))
    assert(rt(null) == null)
    assert(rt(true) == true && rt(false) == false)
    assert(rt(3.14159d) == 3.14159d)
    assert(rt(2.5f) == 2.5f)
    Seq("", "short", "x" * 31, "x" * 32, "x" * 255, "x" * 256, "héllo ✓")
      .foreach(s => assert(rt(s) == s, s"string len ${s.length}"))
    Seq(0, 1, 255, 256).foreach { n =>
      val b = Array.tabulate(n)(_.toByte)
      assert(rt(b).asInstanceOf[Array[Byte]].toSeq == b.toSeq, s"bin len $n")
    }
  }

  test("codec encodes small values in single bytes (canonical fixint/fixstr)") {
    def bytesOf(v: Any): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      MsgpackCodec.writeValue(new DataOutputStream(bo), v)
      bo.toByteArray
    }
    assert(bytesOf(5L).toSeq == Seq(0x05.toByte))
    assert(bytesOf(-1L).toSeq == Seq(0xff.toByte))
    assert(bytesOf("ab").toSeq == Seq(0xa2.toByte, 'a'.toByte, 'b'.toByte))
  }

  test("a torn part file fails the read loudly instead of dropping rows") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val rows = (1 to 50).map(i => Row(i.toLong, s"value-$i"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-msgpack-torn-").toString + "/t"
    MsgpackIO.write(df, dir)
    val part = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-")).head
    // truncate mid-record: a killed writer / partial upload shape
    val ch = java.nio.channels.FileChannel.open(
      part.toPath, java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(part.length() - 3) finally ch.close()
    // drop the local-FS CRC sidecar so the msgpack-level truncation
    // detection (not Hadoop's checksum) is what the read exercises —
    // object stores have no such sidecar
    new java.io.File(part.getParentFile, s".${part.getName}.crc").delete(): Unit
    val ex = intercept[org.apache.spark.SparkException] {
      MsgpackIO.read(spark, dir, schema).count()
    }
    assert(ex.getMessage.contains("truncated") ||
      Option(ex.getCause).exists(_.getMessage.contains("truncated")),
      s"expected a loud truncation error, got: ${ex.getMessage}")
  }

  test("distributed write/read roundtrip preserves rows, nulls and types") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = false),
      StructField("blob", BinaryType, nullable = true)
    ))
    val rows = (1 to 500).map { i =>
      Row(i.toLong,
        if (i % 7 == 0) null else s"name-$i",
        if (i % 11 == 0) null else i * 1.5,
        i % 2 == 0,
        if (i % 13 == 0) null else Array.tabulate(i % 5)(_.toByte))
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft-msgpack-").toString + "/t"
    MsgpackIO.write(df, dir)
    // one part file per partition, no header: files are concatenable shards
    val parts = new java.io.File(dir).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 4, s"expected 4 part files, got ${parts.length}")
    val back = MsgpackIO.read(spark, dir, schema)
    assert(back.count() == 500)
    val a = df.collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toSet
    val b = back.collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), r.getBoolean(3))).toSet
    assert(a == b)
  }
}
