package graft

import graft.sources.{Docs, PathTable}
import graft.sql.OctoSql

class StdinDocsSpec extends SparkSpec {

  test("stdin.json reads driver stdin (stdin/json.in scenario)") {
    val orig = System.in
    try {
      System.setIn(new java.io.ByteArrayInputStream(
        "{\"a\": 1}\n{\"a\": 2}\n".getBytes))
      val df = PathTable.resolve(spark, "stdin.json")
      assert(df.count() == 2)
      assert(df.columns.toSeq == Seq("a"))
    } finally System.setIn(orig)
  }

  test("seq-sum scenario: SUM(int(text)) over stdin.lines (stdin/sum.in)") {
    val orig = System.in
    try {
      System.setIn(new java.io.ByteArrayInputStream(
        (1 to 100).mkString("\n").getBytes))
      val df = OctoSql.run(spark,
        "SELECT SUM(int(text)) AS s FROM stdin.lines")
      assert(df.collect().head.getLong(0) == 5050L)
    } finally System.setIn(orig)
  }

  test("docs.functions and docs.aggregates catalog tables") {
    assert(Docs.functions(spark).count() > 20)
    assert(Docs.aggregates(spark).count() >= 10)
    val viaSql = OctoSql.run(spark,
      "SELECT name FROM docs.aggregates WHERE name = 'array_agg'")
    assert(viaSql.count() == 1)
  }

  test("plugins meta-datasource tables (datasources/plugins parity)") {
    // installed tables list the built-in connectors; repo views are
    // empty with the reference's schemas (no plugin RPC, zero egress)
    val installed = OctoSql.run(spark,
      "SELECT name FROM plugins.installed_plugins").collect().map(_.getString(0))
    assert(installed.toSet.contains("parquet") && installed.toSet.contains("jdbc"))
    assert(OctoSql.run(spark, "SELECT * FROM plugins.available_plugins").count() == 0)
    val vers = OctoSql.run(spark,
      "SELECT plugin_name, version FROM plugins.installed_versions")
    assert(vers.count() == installed.length)
    assert(OctoSql.run(spark, "SELECT * FROM plugins.repositories").columns.toSeq ==
      Seq("slug", "name", "description"))
  }
}
