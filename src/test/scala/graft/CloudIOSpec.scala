package graft

import java.util.concurrent.atomic.AtomicInteger

import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cloud._

/** Cloud trait layer + in-memory fakes, mirroring the reference's test
  * surface (reference: src/io/cloud/fake.rs tests and
  * src/helpers/cloud.rs usage). Pure JVM — no Spark session needed.
  */
class CloudIOSpec extends AnyFunSuite {

  // ---- ObjectIO (reference: FakeObjectIO, fake.rs:220-340) ----

  test("object storage: put/get/exists/delete/copy roundtrip") {
    val io = new FakeObjectIO
    assert(io.putObject("b", "k1", "hello".getBytes).isRight)
    assert(new String(io.getObject("b", "k1").toOption.get) == "hello")
    assert(io.objectExists("b", "k1") == Right(true))
    assert(io.copyObject("b", "k1", "b2", "k2").isRight)
    assert(new String(io.getObject("b2", "k2").toOption.get) == "hello")
    assert(io.deleteObject("b", "k1").isRight)
    assert(io.objectExists("b", "k1") == Right(false))
  }

  test("object storage: missing object is NotFound; missing bucket list is NotFound") {
    val io = new FakeObjectIO
    assert(io.getObject("b", "nope").swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.getMetadata("b", "nope").swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.listObjects("missing", None).swap.toOption.get.kind == ErrorKind.NotFound)
  }

  test("object storage: list filters by prefix, sorted by key, metadata carries size") {
    val io = new FakeObjectIO
    io.putObject("b", "logs/2", Array[Byte](1, 2))
    io.putObject("b", "logs/1", Array[Byte](1))
    io.putObject("b", "data/1", Array[Byte](1, 2, 3))
    val all = io.listObjects("b", None).toOption.get
    assert(all.map(_.key) == Seq("data/1", "logs/1", "logs/2"))
    val logs = io.listObjects("b", Some("logs/")).toOption.get
    assert(logs.map(_.key) == Seq("logs/1", "logs/2"))
    assert(logs.map(_.size) == Seq(1L, 2L))
  }

  // ---- KeyValueIO (reference: FakeKeyValueIO, fake.rs:570-674) ----

  test("key-value: put/get/delete with version bump on overwrite") {
    val io = new FakeKeyValueIO
    io.put("users", "u1", Map("name" -> "ada"))
    assert(io.get("users", "u1").toOption.get.get.version == Some("1"))
    io.put("users", "u1", Map("name" -> "ada", "role" -> "eng"))
    val doc = io.get("users", "u1").toOption.get.get
    assert(doc.version == Some("2") && doc.data("role") == "eng")
    io.delete("users", "u1")
    assert(io.get("users", "u1") == Right(None))
  }

  test("key-value: equality query with limit; batch get preserves order with misses") {
    val io = new FakeKeyValueIO
    io.batchPut("d", Seq(
      "a" -> Map("lang" -> "en", "n" -> "1"),
      "b" -> Map("lang" -> "fr", "n" -> "2"),
      "c" -> Map("lang" -> "en", "n" -> "3")))
    val en = io.query("d", Map("lang" -> "en"), limit = None).toOption.get
    assert(en.map(_.key) == Seq("a", "c"))
    assert(io.query("d", Map("lang" -> "en"), limit = Some(1)).toOption.get.map(_.key) == Seq("a"))
    val got = io.batchGet("d", Seq("c", "zz", "a")).toOption.get
    assert(got.map(_.map(_.key)) == Seq(Some("c"), None, Some("a")))
    assert(io.exists("d", "b") == Right(true))
  }

  // ---- QueueIO (reference: FakeQueueIO, fake.rs:940-1053) ----

  test("queue: FIFO send/receive drains up to max, size and purge") {
    val io = new FakeQueueIO
    val ids = io.sendBatch("q", Seq("m1", "m2", "m3")).toOption.get
    assert(ids.size == 3 && ids.distinct.size == 3)
    assert(io.queueSize("q") == Right(3L))
    val first = io.receive("q", maxMessages = 2).toOption.get
    assert(first.map(_.body) == Seq("m1", "m2"))
    assert(first.forall(_.receiptHandle.startsWith("receipt-")))
    assert(io.queueSize("q") == Right(1L))
    io.send("q", "m4", Map("k" -> "v"))
    io.purge("q")
    assert(io.queueSize("q") == Right(0L))
    assert(io.receive("q", 10).toOption.get.isEmpty)
  }

  // ---- PubSubIO (reference: FakePubSubIO, fake.rs:343-452) ----

  test("pubsub: messages published before subscribe are not delivered; after, pull drains FIFO") {
    val io = new FakePubSubIO
    io.publish("t", "early".getBytes, Map.empty)
    io.subscribe("t", "s1")
    io.publish("t", "one".getBytes, Map.empty)
    io.publishBatch("t", Seq("two".getBytes, "three".getBytes))
    assert(io.topicExists("t") == Right(true))
    assert(io.topicExists("other") == Right(false))
    val pulled = io.pull("t/s1", maxMessages = 2).toOption.get
    assert(pulled.map(m => new String(m.data)) == Seq("one", "two"))
    assert(io.acknowledge("t/s1", pulled.map(_.id)).isRight)
    assert(io.pull("t/s1", 10).toOption.get.map(m => new String(m.data)) == Seq("three"))
  }

  test("pubsub: two subscriptions each get every message") {
    val io = new FakePubSubIO
    io.subscribe("t", "a")
    io.subscribe("t", "b")
    io.publish("t", "x".getBytes, Map.empty)
    assert(io.pull("t/a", 10).toOption.get.size == 1)
    assert(io.pull("t/b", 10).toOption.get.size == 1)
  }

  // ---- helpers (reference: src/helpers/cloud.rs:165-677) ----

  test("retry: transient errors retry with backoff until success") {
    val attempts = new AtomicInteger(0)
    val cfg = RetryConfig(maxAttempts = 5, initialDelayMs = 1, maxDelayMs = 4)
    val r = CloudHelpers.runWithRetry(cfg) { () =>
      if (attempts.incrementAndGet() < 3)
        Left(CloudIOError(ErrorKind.Network, "flaky"))
      else Right(42)
    }
    assert(r == Right(42) && attempts.get() == 3)
  }

  test("retry: non-transient errors fail fast; exhaustion returns last error") {
    val attempts = new AtomicInteger(0)
    val cfg = RetryConfig(maxAttempts = 5, initialDelayMs = 1)
    val r = CloudHelpers.runWithRetry(cfg) { () =>
      attempts.incrementAndGet()
      Left(CloudIOError(ErrorKind.InvalidInput, "bad arg"))
    }
    assert(r.swap.toOption.get.kind == ErrorKind.InvalidInput && attempts.get() == 1)

    val exhausted = new AtomicInteger(0)
    val r2 = CloudHelpers.runWithRetry(RetryConfig(maxAttempts = 3, initialDelayMs = 1)) { () =>
      exhausted.incrementAndGet()
      Left(CloudIOError(ErrorKind.Timeout, "slow"))
    }
    assert(r2.isLeft && exhausted.get() == 3)
  }

  test("batch: chunked processing concatenates; first failure aborts") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    val r = CloudHelpers.runBatch((1 to 10).toSeq, BatchConfig(chunkSize = 3)) { chunk =>
      seen += chunk.size
      Right(chunk.map(_ * 2))
    }
    assert(r == Right((1 to 10).map(_ * 2)))
    assert(seen.toSeq == Seq(3, 3, 3, 1))

    val r2 = CloudHelpers.runBatch((1 to 10).toSeq, BatchConfig(chunkSize = 4)) { chunk =>
      if (chunk.head > 4) Left(CloudIOError(ErrorKind.InternalError, "boom"))
      else Right(chunk)
    }
    assert(r2.isLeft)
  }

  test("pagination: drains until hasMore=false or maxPages") {
    val r = CloudHelpers.runPaginated(PaginationConfig(pageSize = 3)) { (page, size) =>
      val items = (0 until size).map(i => page * size + i)
      Right((items, page < 2))
    }
    assert(r == Right((0 until 9).toSeq))

    val capped = CloudHelpers.runPaginated(PaginationConfig(pageSize = 2, maxPages = Some(2))) { (page, size) =>
      Right((Seq(page), true))
    }
    assert(capped == Right(Seq(0, 1)))
  }

  test("operation builder composes retry and timeout") {
    val attempts = new AtomicInteger(0)
    val r = CloudHelpers.OperationBuilder()
      .withRetry(RetryConfig(maxAttempts = 3, initialDelayMs = 1))
      .withTimeout(2.seconds)
      .execute { () =>
        if (attempts.incrementAndGet() < 2) Left(CloudIOError(ErrorKind.ServiceUnavailable, "503"))
        else Right("ok")
      }
    assert(r == Right("ok") && attempts.get() == 2)

    val slow = CloudHelpers.OperationBuilder()
      .withTimeout(50.millis)
      .execute { () => Thread.sleep(5000); Right("never") }
    assert(slow.swap.toOption.get.kind == ErrorKind.Timeout)
  }
}
