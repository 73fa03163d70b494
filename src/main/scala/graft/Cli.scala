package graft

import org.apache.spark.sql.DataFrame
import graft.sql.OctoSql

/** CLI entry point mirroring the reference's `octosql "<SQL>"` surface
  * (cmd/root.go): run a dialect query over file tables, print as a
  * table / CSV / JSON-lines; `--describe` and `--explain` inspect
  * instead of executing.
  *
  * Usage: graft.Cli "<SQL>" [--output table|csv|json] [--describe|--explain]
  */
object Cli {

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: Cli \"<SQL>\" [--output table|csv|json] [--describe|--explain]"); sys.exit(2) }
    val sql = args(0)
    val output = args.sliding(2).collectFirst {
      case Array("--output", v) => v }.getOrElse("table")
    val spark = Engine.session(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
    try {
      if (args.contains("--describe")) OctoSql.describe(spark, sql).show(1000, truncate = false)
      else if (args.contains("--explain")) println(OctoSql.explain(spark, sql))
      else {
        val df = OctoSql.run(spark, sql)
        output match {
          case "csv"  => printCsv(df)
          case "json" => printJson(df)
          case _      => df.show(1000, truncate = false)
        }
      }
    } finally spark.stop()
  }

  /** Stream results to stdout as CSV (header + rows), like
    * outputs/formats/csv_format.go.
    */
  private def printCsv(df: DataFrame): Unit = {
    println(df.columns.mkString(","))
    df.toLocalIterator().forEachRemaining { row =>
      println(df.columns.indices.map { i =>
        val v = if (row.isNullAt(i)) "" else row.get(i).toString
        if (v.contains(",") || v.contains("\"") || v.contains("\n"))
          "\"" + v.replace("\"", "\"\"") + "\""
        else v
      }.mkString(","))
    }
  }

  /** Stream results as JSON lines (outputs/formats/json_format.go). */
  private def printJson(df: DataFrame): Unit =
    df.toJSON.toLocalIterator().forEachRemaining(println)
}
