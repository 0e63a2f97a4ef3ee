package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cloud._

/** Cloud JSONL readers + glob expansion over ObjectIO fakes, mirroring
  * the reference's reader tests (reference: tests/io/cloud_readers.rs
  * :13-190). Pure JVM — no Spark session needed.
  */
class CloudReadersSpec extends AnyFunSuite {

  // One line <-> one (id, value) pair; explicit codec stands in for serde.
  private def enc(r: (Long, String)): String = s"""{"id":${r._1},"value":"${r._2}"}"""
  private val LinePat = """\{"id":(\d+),"value":"([^"]*)"\}""".r
  private def dec(line: String): (Long, String) = line match {
    case LinePat(id, v) => (id.toLong, v)
    case other => throw new IllegalArgumentException(s"bad line: $other")
  }

  private val records = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))

  test("jsonl roundtrip through object storage (reference: test_read_write_cloud_jsonl)") {
    val io = new FakeObjectIO
    assert(CloudReaders.writeCloudJsonlVec(io, "b", "data/records.jsonl", records)(enc) == Right(3L))
    val back = CloudReaders.readCloudJsonlVec(io, "b", "data/records.jsonl")(dec)
    assert(back == Right(records))
  }

  test("blank lines are skipped; a bad line reports its 1-based number") {
    val io = new FakeObjectIO
    io.putObject("b", "k.jsonl", "\n{\"id\":1,\"value\":\"a\"}\n\nnot-json\n".getBytes)
    val r = CloudReaders.readCloudJsonlVec(io, "b", "k.jsonl")(dec)
    val err = r.swap.toOption.get
    assert(err.kind == ErrorKind.InternalError && err.message.contains("line 4"))
  }

  test("missing object surfaces the storage NotFound") {
    val io = new FakeObjectIO
    val r = CloudReaders.readCloudJsonlVec(io, "b", "nope.jsonl")(dec)
    assert(r.swap.toOption.get.kind == ErrorKind.NotFound)
  }

  test("gzip roundtrip by extension; stored bytes are actually compressed (reference: test_write_compressed_gzip)") {
    val io = new FakeObjectIO
    val many = (1 to 200).map(i => (i.toLong, "v" * 50))
    CloudReaders.writeCloudJsonlVec(io, "b", "data.jsonl.gz", many)(enc)
    val stored = io.getObject("b", "data.jsonl.gz").toOption.get
    assert(stored.length > 2 && (stored(0) & 0xff) == 0x1f && (stored(1) & 0xff) == 0x8b)
    assert(stored.length < many.map(enc(_).length + 1).sum)
    assert(CloudReaders.readCloudJsonlVec(io, "b", "data.jsonl.gz")(dec) == Right(many))
  }

  test("zstd roundtrip by extension (reference: test_write_compressed_zstd)") {
    val io = new FakeObjectIO
    CloudReaders.writeCloudJsonlVec(io, "b", "data.jsonl.zst", records)(enc)
    val stored = io.getObject("b", "data.jsonl.zst").toOption.get
    assert((stored(0) & 0xff) == 0x28 && (stored(1) & 0xff) == 0xb5) // zstd magic
    assert(CloudReaders.readCloudJsonlVec(io, "b", "data.jsonl.zst")(dec) == Right(records))
  }

  test("unsupported compression extension is InvalidInput (reference: test_compression_feature_error)") {
    val io = new FakeObjectIO
    val r = CloudReaders.writeCloudJsonlVec(io, "b", "data.jsonl.xz", records)(enc)
    assert(r.swap.toOption.get.kind == ErrorKind.InvalidInput)
  }

  test("glob expansion: * within segment, ** across, ? single char; sorted (reference: test_expand_cloud_glob)") {
    val io = new FakeObjectIO
    Seq("logs/a.jsonl", "logs/b.jsonl", "logs/c.csv",
        "logs/2024/01/x.jsonl", "other/d.jsonl").foreach(k => io.putObject("b", k, Array[Byte](1)))
    assert(CloudReaders.expandCloudGlob(io, "b", "logs/*.jsonl") ==
      Right(Seq("logs/a.jsonl", "logs/b.jsonl")))
    assert(CloudReaders.expandCloudGlob(io, "b", "logs/**/*.jsonl").toOption.get
      .contains("logs/2024/01/x.jsonl"))
    assert(CloudReaders.expandCloudGlob(io, "b", "logs/?.csv") == Right(Seq("logs/c.csv")))
    assert(CloudReaders.expandCloudGlob(io, "b", "logs/a.jsonl") == Right(Seq("logs/a.jsonl")))
  }

  test("glob read concatenates matching files in key order (reference: test_read_cloud_jsonl_glob)") {
    val io = new FakeObjectIO
    CloudReaders.writeCloudJsonlVec(io, "b", "d/part-2.jsonl", Seq((3L, "c")))(enc)
    CloudReaders.writeCloudJsonlVec(io, "b", "d/part-1.jsonl", Seq((1L, "a"), (2L, "b")))(enc)
    CloudReaders.writeCloudJsonlVec(io, "b", "d/skip.csv", Seq((9L, "z")))(enc)
    val all = CloudReaders.readCloudJsonlGlob(io, "b", "d/part-*.jsonl")(dec)
    assert(all == Right(Seq((1L, "a"), (2L, "b"), (3L, "c"))))
  }

  test("required glob errors on zero matches (reference: test_expand_cloud_glob_required)") {
    val io = new FakeObjectIO
    io.putObject("b", "x.jsonl", Array[Byte](1))
    assert(CloudReaders.expandCloudGlobRequired(io, "b", "*.jsonl") == Right(Seq("x.jsonl")))
    val r = CloudReaders.expandCloudGlobRequired(io, "b", "*.parquet")
    assert(r.swap.toOption.get.kind == ErrorKind.NotFound)
  }
}
