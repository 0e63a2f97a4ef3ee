package graft

import graft.Validation._

/** ErrorCollector + log-and-continue mode, mirroring the reference's
  * validation test assertions (reference: tests/validation.rs —
  * test_validate_log_and_continue, test_error_collector_json_export,
  * test_error_collector_clear/_errors/_print/_display/
  * _write_to_file).
  */
class ValidationCollectorSpec extends SparkTestBase {
  import spark.implicits._

  private def pc[T: org.apache.spark.sql.Encoder](ts: T*): PCollection[T] =
    PCollection.fromSeq(spark, ts)

  test("log-and-continue drops invalid records and collects their errors") {
    // reference: test_validate_log_and_continue — 3 users, 1 valid,
    // collector ends with 2 failed records
    val users = pc(
      (1L, "alice@example.com", 30),
      (2L, "invalid", 25),
      (3L, "bob@example.com", -5))
    val collector = ErrorCollector.distributed(spark)
    val v: ((Long, String, Int)) => Errors = u =>
      Validators.isEmail("email")(u._2) ++ Validators.inRange("age", 0, 150)(u._3)
    val valid = users
      .validateLogAndContinue(v, collector, u => Some(u._1.toString))
      .collect()
    assert(valid.map(_._1).toSeq == Seq(1L))
    assert(collector.errorCount == 2)
    val byId = collector.errors.map(re => re.recordId -> re.errors).toMap
    assert(byId(Some("2")).exists(_.message.contains("email")))
    assert(byId(Some("3")).exists(_.message.contains("age")))
  }

  test("log-and-continue reports validation-rate observe metrics") {
    val mc = Metrics.install(spark)
    try {
      val collector = ErrorCollector.distributed(spark)
      pc(1, -5, 10, -3, 7)
        .validateLogAndContinue(Validators.inRange("n", 0, 100)(_), collector,
          metricName = "vcspec_validation")
        .collect(): Unit
      val m = mc.await("vcspec_validation").getOrElse(fail("observation never arrived"))
      assert(m("total_rows") == 5L && m("invalid_rows") == 2L)
    } finally spark.listenerManager.unregister(mc)
  }

  test("two validation stages compose (auto-unique observation names)") {
    val collector = ErrorCollector.distributed(spark)
    val out = pc(1, -5, 10, 250, 7)
      .validateLogAndContinue(Validators.inRange("n", 0, 300)(_), collector)
      .validateLogAndContinue(Validators.inRange("n", 0, 100)(_), collector)
      .collect()
    assert(out.toSet == Set(1, 10, 7))
    assert(collector.errorCount == 2) // -5 at stage 1, 250 at stage 2
  }

  test("a driver-local collector inside a distributed pipeline fails loudly") {
    // the executor-side copy of a local collector cannot reach the
    // driver — adds must throw, never silently vanish
    val collector = ErrorCollector()
    val ex = intercept[org.apache.spark.SparkException] {
      pc(1, -5, 7).validateLogAndContinue(Validators.inRange("n", 0, 100)(_), collector).collect()
    }
    assert(ex.getMessage.contains("ErrorCollector") ||
      Option(ex.getCause).exists(_.getMessage.contains("ErrorCollector")))
  }

  test("JSON export carries record_id and per-field errors with codes") {
    // reference: test_error_collector_json_export
    val collector = ErrorCollector()
    collector.addError(Some("record_1"), Seq(ValidationError.field("email", "Invalid email")))
    collector.addError(Some("record_2"), Seq(
      ValidationError.field("age", "Age out of range"),
      ValidationError.field("email", "Missing @")))
    val json = collector.toJson
    assert(json.contains(""""record_id":"record_1""""))
    assert(json.contains(""""field":"email""""))
    assert(json.contains(""""message":"Age out of range""""))
    assert(json.contains(""""code":null"""))
    // rendered Display form: [field] message (code: c)
    val err3 = ValidationError.field("age", "Out of range").withCode("VAL_001")
    assert(err3.render.contains("[age]") && err3.render.contains("Out of range")
      && err3.render.contains("VAL_001"))
  }

  test("clear empties the collector") {
    // reference: test_error_collector_clear
    val collector = ErrorCollector()
    collector.addError(Some("rec1"), Seq(ValidationError("error1")))
    collector.addError(Some("rec2"), Seq(ValidationError("error2")))
    assert(collector.errorCount == 2)
    collector.clear()
    assert(collector.errorCount == 0 && collector.errors.isEmpty)
  }

  test("errors exposes record identity and error structure") {
    // reference: test_error_collector_errors
    val collector = ErrorCollector()
    collector.addError(Some("test_record"), Seq(ValidationError.field("field1", "Error message")))
    val errors = collector.errors
    assert(errors.length == 1)
    assert(errors.head.recordId.contains("test_record"))
    assert(errors.head.errors.length == 1)
  }

  test("printErrors does not throw; display shows the count") {
    // reference: test_error_collector_print / _display
    val collector = ErrorCollector()
    collector.addError(None, Seq(ValidationError("e1")))
    collector.addError(None, Seq(ValidationError("e2")))
    collector.printErrors()
    assert(collector.toString.contains("ErrorCollector") && collector.toString.contains("2 errors"))
  }

  test("writeToFile produces parseable JSON on disk") {
    // reference: test_error_collector_write_to_file
    val dir = java.nio.file.Files.createTempDirectory("graft-errors")
    val path = dir.resolve("errors.json")
    val collector = ErrorCollector()
    collector.addError(Some("rec1"), Seq(ValidationError.field("email", "Invalid \"quoted\"")))
    collector.writeToFile(path)
    val contents = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    assert(contents.contains("rec1") && contents.startsWith("[") && contents.endsWith("]"))
    // escaping survives a round trip through Spark's JSON reader
    val parsed = spark.read.json(spark.createDataset(Seq(contents))(org.apache.spark.sql.Encoders.STRING))
    assert(parsed.selectExpr("explode(errors.message)").head().getString(0) == "Invalid \"quoted\"")
  }
}
