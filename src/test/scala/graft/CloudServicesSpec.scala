package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.cloud._

/** The ten cloud capability traits added beyond the original four,
  * mirroring the reference's test surface (reference:
  * tests/io/cloud.rs:677-935 warehouse/database/metrics/config,
  * :233-630 cache/search/graph/compute/intelligence/notification,
  * and tests/io/cloud_traits.rs credentials/config). Pure JVM — no
  * Spark session needed.
  */
class CloudServicesSpec extends AnyFunSuite {

  // ---- WarehouseIO (reference: tests/io/cloud.rs:677-723) ----

  test("warehouse: select-star query returns columns+rows; unknown table is NotFound") {
    val io = new FakeWarehouseIO
    io.addTable("users",
      Seq("id" -> "INT64", "name" -> "STRING"),
      Seq(Seq("1", "ada"), Seq("2", "grace")))
    val r = io.query("SELECT * FROM users").toOption.get
    assert(r.columns == Seq("id", "name"))
    assert(r.rows == Seq(Seq("1", "ada"), Seq("2", "grace")) && r.rowCount == 2)
    assert(io.query("SELECT * FROM nope").swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.query("DROP something").toOption.get.rowCount == 0)
  }

  test("warehouse: table ops — exists, schema, load creates, execute/export no-op") {
    val io = new FakeWarehouseIO
    io.addTable("t", Seq("a" -> "STRING"), Seq.empty)
    assert(io.tableExists("t") == Right(true))
    assert(io.tableExists("u") == Right(false))
    assert(io.getSchema("t") == Right(Seq("a" -> "STRING")))
    assert(io.getSchema("u").swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.loadData("staged", "s3://bucket/file", Map.empty).isRight)
    assert(io.tableExists("staged") == Right(true))
    assert(io.execute("CREATE TABLE x (a INT)").isRight)
    assert(io.exportData("SELECT * FROM t", "s3://out", Map.empty).isRight)
  }

  // ---- DatabaseIO (reference: tests/io/cloud.rs:725-750) ----

  test("database: query known table, INSERT reports one affected row") {
    val io = new FakeDatabaseIO
    io.addTable("accounts", Seq("id" -> "BIGINT"))
    assert(io.query("SELECT * FROM accounts", Seq.empty) == Right(Seq.empty))
    assert(io.query("SELECT * FROM missing", Seq.empty).swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.execute("INSERT INTO accounts VALUES (?)", Seq("1")) == Right(1L))
    assert(io.execute("UPDATE accounts SET id = 2", Seq.empty) == Right(0L))
    assert(io.tableExists("accounts") == Right(true))
    assert(io.getSchema("accounts") == Right(Seq("id" -> "BIGINT")))
  }

  test("database: transaction delegates and commit/rollback succeed") {
    val io = new FakeDatabaseIO
    io.addTable("t", Seq("v" -> "TEXT"))
    val tx = io.beginTransaction().toOption.get
    assert(tx.execute("INSERT INTO t VALUES ('x')", Seq.empty) == Right(1L))
    assert(tx.query("SELECT * FROM t", Seq.empty).isRight)
    assert(tx.commit().isRight)
    val tx2 = io.beginTransaction().toOption.get
    assert(tx2.rollback().isRight)
  }

  // ---- SearchIO (reference: tests/io/cloud.rs:295-398) ----

  test("search: substring match over fields with constant score") {
    val io = new FakeSearchIO
    io.index("docs", "d1", Map("title" -> "spark tuning guide", "lang" -> "en"))
    io.index("docs", "d2", Map("title" -> "flink basics", "lang" -> "en"))
    val hits = io.search("docs", SearchQuery("spark", limit = 10)).toOption.get
    assert(hits.map(_.id) == Seq("d1") && hits.head.score == 1.0)
    assert(io.search("nope", SearchQuery("x")).swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.indexExists("docs") == Right(true))
  }

  test("search: filters must all match; get and delete by id") {
    val io = new FakeSearchIO
    io.batchIndex("docs", Seq(
      "a" -> Map("body" -> "quick brown fox", "lang" -> "en"),
      "b" -> Map("body" -> "quick red fox", "lang" -> "fr")))
    val en = io.search("docs", SearchQuery("quick", filters = Map("lang" -> "en"), limit = 10)).toOption.get
    assert(en.map(_.id) == Seq("a"))
    assert(io.get("docs", "b").toOption.get.get("lang") == "fr")
    io.delete("docs", "b")
    assert(io.get("docs", "b") == Right(None))
  }

  test("search: offset/limit paginate deterministically") {
    val io = new FakeSearchIO
    (1 to 5).foreach(i => io.index("n", s"id$i", Map("v" -> "common")))
    val page1 = io.search("n", SearchQuery("common", limit = 2, offset = 0)).toOption.get
    val page2 = io.search("n", SearchQuery("common", limit = 2, offset = 2)).toOption.get
    val page3 = io.search("n", SearchQuery("common", limit = 2, offset = 4)).toOption.get
    assert(page1.map(_.id) == Seq("id1", "id2"))
    assert(page2.map(_.id) == Seq("id3", "id4"))
    assert(page3.map(_.id) == Seq("id5"))
  }

  // ---- MetricIO (reference: tests/io/cloud.rs:752-798) ----

  test("metrics: query filters by name, inclusive time range and tag subset") {
    val io = new FakeMetricIO
    io.putMetrics("ns", Seq(
      MetricPoint("latency", 1.0, 100, Map("host" -> "a")),
      MetricPoint("latency", 2.0, 200, Map("host" -> "b")),
      MetricPoint("latency", 3.0, 300, Map("host" -> "a")),
      MetricPoint("errors", 9.0, 200, Map("host" -> "a"))))
    val q = MetricQuery("latency", startTime = 100, endTime = 250)
    assert(io.queryMetrics("ns", q).toOption.get.map(_.value) == Seq(1.0, 2.0))
    val tagged = MetricQuery("latency", 0, 1000, tags = Map("host" -> "a"))
    assert(io.queryMetrics("ns", tagged).toOption.get.map(_.value) == Seq(1.0, 3.0))
    assert(io.listMetrics("ns") == Right(Seq("errors", "latency")))
    assert(io.queryMetrics("other", q).swap.toOption.get.kind == ErrorKind.NotFound)
  }

  // ---- ConfigIO (reference: tests/io/cloud.rs:800-835) ----

  test("config: set/get/delete with secrets, prefix list and batch get") {
    val io = new FakeConfigIO
    io.set("app/db/url", "jdbc:x", isSecret = false)
    io.set("app/db/password", "hunter2", isSecret = true)
    io.set("feature/flag", "on", isSecret = false)
    val pw = io.get("app/db/password").toOption.get
    assert(pw.value == "hunter2" && pw.isSecret && pw.version == Some("v1"))
    assert(io.get("missing").swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.list(Some("app/")) == Right(Seq("app/db/password", "app/db/url")))
    assert(io.list(None).toOption.get.size == 3)
    val got = io.batchGet(Seq("feature/flag", "nope")).toOption.get
    assert(got.map(_.map(_.value)) == Seq(Some("on"), None))
    io.delete("feature/flag")
    assert(io.get("feature/flag").isLeft)
  }

  // ---- CacheIO (reference: tests/io/cloud.rs:233-293) ----

  test("cache: set/get/exists/delete and flush") {
    val io = new FakeCacheIO
    io.set("k", "v".getBytes, ttlSecs = Some(60))
    assert(new String(io.get("k").toOption.get.get) == "v")
    assert(io.exists("k") == Right(true))
    io.delete("k")
    assert(io.get("k") == Right(None))
    io.set("a", "1".getBytes, None)
    io.flush()
    assert(io.exists("a") == Right(false))
  }

  test("cache: increment treats absent as zero and persists the counter") {
    val io = new FakeCacheIO
    assert(io.increment("hits", 1) == Right(1L))
    assert(io.increment("hits", 5) == Right(6L))
    assert(io.increment("hits", -2) == Right(4L))
    assert(new String(io.get("hits").toOption.get.get) == "4")
  }

  test("cache: batch set/get preserve order with misses") {
    val io = new FakeCacheIO
    io.setBatch(Seq(("x", "1".getBytes, None), ("y", "2".getBytes, Some(10L))))
    val got = io.getBatch(Seq("y", "zz", "x")).toOption.get
    assert(got.map(_.map(new String(_))) == Seq(Some("2"), None, Some("1")))
  }

  // ---- GraphIO (reference: tests/io/cloud.rs:400-476) ----

  test("graph: node lifecycle — add/get/update-merge/delete; update missing is NotFound") {
    val io = new FakeGraphIO
    val id = io.addNode(Seq("Person"), Map("name" -> "ada")).toOption.get
    assert(id == "node-1")
    assert(io.getNode(id).toOption.get.get.labels == Seq("Person"))
    io.updateNode(id, Map("role" -> "eng"))
    val n = io.getNode(id).toOption.get.get
    assert(n.properties == Map("name" -> "ada", "role" -> "eng"))
    assert(io.updateNode("node-99", Map.empty).swap.toOption.get.kind == ErrorKind.NotFound)
    io.deleteNode(id)
    assert(io.getNode(id) == Right(None))
  }

  test("graph: edges and directional neighbors") {
    val io = new FakeGraphIO
    val a = io.addNode(Seq("N"), Map("k" -> "a")).toOption.get
    val b = io.addNode(Seq("N"), Map("k" -> "b")).toOption.get
    val c = io.addNode(Seq("N"), Map("k" -> "c")).toOption.get
    val e1 = io.addEdge(a, b, "knows", Map.empty).toOption.get
    io.addEdge(c, a, "knows", Map.empty)
    assert(io.getEdge(e1).toOption.get.get.fromNode == a)
    def keys(r: CloudIO.CloudResult[Seq[GraphNode]]) = r.toOption.get.map(_.properties("k")).sorted
    assert(keys(io.getNeighbors(a, EdgeDirection.Outgoing)) == Seq("b"))
    assert(keys(io.getNeighbors(a, EdgeDirection.Incoming)) == Seq("c"))
    assert(keys(io.getNeighbors(a, EdgeDirection.Both)) == Seq("b", "c"))
    io.deleteEdge(e1)
    assert(io.getNeighbors(a, EdgeDirection.Outgoing).toOption.get.isEmpty)
    assert(io.query("MATCH (n) RETURN n", Map.empty) == Right(Seq.empty))
  }

  // ---- ComputeIO (reference: tests/io/cloud.rs:478-530) ----

  test("compute: sync invoke runs the registered handler; unknown is NotFound") {
    val io = new FakeComputeIO
    io.registerFunction("upper")(b => new String(b).toUpperCase.getBytes)
    val r = io.invoke("upper", "hello".getBytes).toOption.get
    assert(new String(r.output) == "HELLO" && r.statusCode == 200)
    assert(io.invoke("nope", Array.emptyByteArray).swap.toOption.get.kind == ErrorKind.NotFound)
  }

  test("compute: async invoke returns an id that reports Succeeded; list is sorted") {
    val io = new FakeComputeIO
    io.registerFunction("b")(identity)
    io.registerFunction("a")(identity)
    val inv = io.invokeAsync("a", Array.emptyByteArray).toOption.get
    assert(inv.startsWith("inv-"))
    assert(io.getInvocationStatus(inv) == Right(InvocationStatus.Succeeded))
    assert(io.listFunctions() == Right(Seq("a", "b")))
  }

  // ---- IntelligenceIO (reference: tests/io/cloud.rs:532-595) ----

  test("intelligence: predict runs the registered model; info and listing") {
    val io = new FakeIntelligenceIO
    io.registerModel("echo")(b => b.reverse)
    val out = io.predict("echo", InferenceInput("abc".getBytes, "text/plain")).toOption.get
    assert(new String(out.data) == "cba" && out.modelVersion == Some("v1"))
    assert(io.predict("nope", InferenceInput(Array.emptyByteArray, "x")).swap.toOption.get.kind == ErrorKind.NotFound)
    assert(io.getModelInfo("echo").toOption.get("name") == "echo")
    assert(io.listModels() == Right(Seq("echo")))
  }

  test("intelligence: batch predict preserves order and fails on unknown model") {
    val io = new FakeIntelligenceIO
    io.registerModel("double")(b => (b ++ b))
    val outs = io.predictBatch("double",
      Seq(InferenceInput("x".getBytes, "t"), InferenceInput("yz".getBytes, "t"))).toOption.get
    assert(outs.map(o => new String(o.data)) == Seq("xx", "yzyz"))
    assert(io.predictBatch("missing", Seq(InferenceInput("x".getBytes, "t"))).isLeft)
  }

  // ---- NotificationIO (reference: tests/io/cloud.rs:597-638) ----

  test("notification: send delivers to the target topic; batch keeps order") {
    val io = new FakeNotificationIO
    val r = io.send(Notification("alerts", Some("hi"), "body")).toOption.get
    assert(r.status == NotificationStatus.Sent && r.messageId == "msg-1")
    val rs = io.sendBatch(Seq(
      Notification("alerts", None, "b1"),
      Notification("alerts", None, "b2"))).toOption.get
    assert(rs.map(_.messageId) == Seq("msg-2", "msg-3"))
    assert(io.delivered("alerts").map(_.message) == Seq("body", "b1", "b2"))
  }

  test("notification: topics and subscriptions lifecycle") {
    val io = new FakeNotificationIO
    assert(io.createTopic("t") == Right("t"))
    assert(io.topicExists("t"))
    val sub = io.subscribe("t", "me@example.com", "email").toOption.get
    assert(sub == "sub-t-me@example.com")
    assert(io.unsubscribe(sub).isRight)
    io.deleteTopic("t")
    assert(!io.topicExists("t"))
  }

  // ---- Credentials / config (reference: tests/io/cloud.rs:898-935) ----

  test("credentials validate; empty identifier is an Authentication error") {
    assert(FakeCredentials("key-1", "api_key").validate().isRight)
    val bad = FakeCredentials("", "api_key").validate()
    assert(bad.swap.toOption.get.kind == ErrorKind.Authentication)
  }

  test("config defaults match the reference (timeout 30s, 3 retries)") {
    val c = FakeConfig(region = Some("us-east-1"))
    assert(c.region == Some("us-east-1") && c.endpoint.isEmpty)
    assert(c.timeoutSecs == 30 && c.maxRetries == 3)
  }
}
