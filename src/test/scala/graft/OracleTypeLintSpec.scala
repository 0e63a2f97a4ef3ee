package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle type lint, wired into `sbt test` so an oracle-SQL edit
  * cannot skip it: DESCRIBE every `SparkEntry.oracleSql` entry in
  * DuckDB (schema-only — nothing executes) and compare its type
  * families against `tools/oracle_schema_snapshot.json`, the
  * committed record of the Spark results' families from the last
  * green Verify dump. This is the static half of the driver's
  * type-sensitive hash compare: the classic miss — an uncast integer
  * `sum()` that DuckDB widens to HUGEINT while Spark returns int64 —
  * passes every value-level check and only trips the driver, so it
  * must fail HERE, at build time. A query added without regenerating
  * the snapshot fails with the regenerate hint
  * (`tools/lint_oracles.py <sfdir> <voutdir> --emit-snapshot`).
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  test("every oracle's DuckDB type families match the committed Spark schema snapshot") {
    val sfDir = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sfDir/lineitem.parquet").exists(),
      "testdata tables not present on this machine")
    // the lint is a python3+duckdb tool; probe once so machines
    // without it skip instead of failing on an unrelated absence
    val probe = scala.sys.process.Process(
      Seq("python3", "-c", "import duckdb")).!(scala.sys.process.ProcessLogger(_ => ()))
    assume(probe == 0, "python3+duckdb not available")
    val tmp = java.nio.file.Files.createTempFile("oracle-sql", ".json")
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${jstr(k)}: ${jstr(v)}" }
      .mkString("{", ",\n", "}")
    java.nio.file.Files.write(tmp, json.getBytes("UTF-8"))
    val out = new StringBuilder
    val code = scala.sys.process.Process(
        Seq("python3", "tools/lint_oracles.py", sfDir,
          "--check-snapshot", tmp.toString))
      .!(scala.sys.process.ProcessLogger(l => { out.append(l).append('\n'); () }))
    assert(code == 0, s"oracle type lint failed:\n$out")
  }
}
