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
}
