package graft

import java.nio.file.Files
import graft.sources.PathTable

/** File-source round-trips the reference supports (CSV/TSV/JSON/lines,
  * SURVEY §2.1) — the driver gate only exercises parquet, so these pin
  * the other formats.
  */
class SourcesSpec extends SparkSpec {

  private lazy val dir = Files.createTempDirectory("graft_src").toFile

  private def write(name: String, content: String): String = {
    val f = new java.io.File(dir, name)
    Files.writeString(f.toPath, content)
    f.getAbsolutePath
  }

  test("csv scan with header + schema inference") {
    val p = write("t.csv", "a,b,c\n1,2.5,x\n2,3.5,y\n")
    val df = PathTable.resolve(spark, p)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 2)
    assert(df.schema("a").dataType.typeName == "integer")
    assert(df.schema("b").dataType.typeName == "double")
  }

  test("tsv scan") {
    val p = write("t.tsv", "a\tb\n1\tx\n2\ty\n")
    val df = PathTable.resolve(spark, p)
    assert(df.count() == 2 && df.columns.length == 2)
  }

  test("csv without header (?header=false)") {
    val p = write("nh.csv", "1,x\n2,y\n")
    val df = PathTable.resolve(spark, s"$p?header=false")
    assert(df.count() == 2)
    assert(df.columns.head.startsWith("_c"))
  }

  test("jsonlines scan with union-shape schema merge") {
    val p = write("t.json",
      """{"a": 1, "b": "x"}
        |{"a": 2, "c": true}
        |""".stripMargin)
    val df = PathTable.resolve(spark, p)
    assert(df.count() == 2)
    assert(df.columns.toSet == Set("a", "b", "c"))
  }

  test("lines scan yields {number, text} in file order") {
    val p = write("t.log", "first\nsecond\nthird\n")
    val df = PathTable.resolve(spark, p)
    val rows = df.orderBy("number").collect()
    assert(rows.map(_.getString(1)).toSeq == Seq("first", "second", "third"))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("parquet scan") {
    val df = PathTable.resolve(spark, s"$sf/nation.parquet")
    assert(df.count() == 25)
  }

  test("orc scan resolves by extension and round-trips parquet content") {
    val out = new java.io.File(dir, "nation_rt.orc").getAbsolutePath
    val src = PathTable.resolve(spark, s"$sf/nation.parquet")
    src.write.mode("overwrite").orc(out)
    val df = PathTable.resolve(spark, out)
    assert(df.count() == 25)
    assert(df.columns.toSet == src.columns.toSet)
    // format-prefixed form too (orc.<path> has a dot, so use read)
    assert(PathTable.read(spark, out, "orc").count() == 25)
  }

  test("lines numbering is per-file and the plan has no single-task Window") {
    // two files in one glob: numbers restart per file, like the
    // reference's per-file sequential numbering (lines/impl.go)
    val dir = java.nio.file.Files.createTempDirectory("graftlines")
    java.nio.file.Files.write(dir.resolve("a.log"), "a0\na1\na2\n".getBytes)
    java.nio.file.Files.write(dir.resolve("b.log"), "b0\nb1\n".getBytes)
    val df = PathTable.linesWithNumbers(spark, dir.toString + "/*.log")
    val rows = df.collect().map(r => (r.getString(2).split('/').last, r.getLong(0), r.getString(1)))
    val byFile = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3)).toSeq).toMap
    assert(byFile("a.log") == Seq((0L, "a0"), (1L, "a1"), (2L, "a2")))
    assert(byFile("b.log") == Seq((0L, "b0"), (1L, "b1")))
    // scale guard: the round-1 implementation funnelled everything
    // through one task via Window.orderBy(monotonically_increasing_id())
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unpartitioned Window crept back into the lines plan:\n$plan")
  }
}
