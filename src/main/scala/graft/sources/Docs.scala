package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Self-documentation tables, like the reference's docs datasource
  * (datasources/docs/database.go:26-121): `docs.functions` and
  * `docs.aggregates` list the engine's scalar/aggregate surface with
  * signatures.
  */
object Docs {

  private val scalarFunctions: Seq[(String, String, String)] = Seq(
    ("abs", "(Int|Float) -> same", "absolute value"),
    ("sqrt", "(Float) -> Float", "square root"),
    ("ceil", "(Float) -> Float", "round up"),
    ("floor", "(Float) -> Float", "round down"),
    ("log", "(Float) -> Float", "natural logarithm"),
    ("log2", "(Float) -> Float", "base-2 logarithm"),
    ("log10", "(Float) -> Float", "base-10 logarithm"),
    ("pow", "(Float, Float) -> Float", "power"),
    ("upper", "(String) -> String", "uppercase"),
    ("lower", "(String) -> String", "lowercase"),
    ("reverse", "(String) -> String", "reverse characters"),
    ("substr", "(String, Int[, Int]) -> String", "0-based substring"),
    ("replace", "(String, String, String) -> String", "replace all occurrences"),
    ("position", "(String, String) -> Int?", "0-based index, NULL if absent"),
    ("len", "(String|List|Struct) -> Int", "length / element count"),
    ("like", "(String, String) -> Boolean", "SQL LIKE pattern"),
    ("~", "(String, String) -> Boolean", "regex match"),
    ("~*", "(String, String) -> Boolean", "case-insensitive regex match"),
    ("!~", "(String, String) -> Boolean", "negated regex match"),
    ("!~*", "(String, String) -> Boolean", "negated case-insensitive regex match"),
    ("unnest", "(List) -> rows", "explode list elements to rows"),
    ("[]", "(List, Int) -> element?", "0-based index, NULL out of bounds"),
    ("int", "(Any) -> Int?", "conversion, NULL on failure"),
    ("float", "(Any) -> Float?", "conversion, NULL on failure"),
    ("string", "(Any) -> String", "display conversion"),
    ("now", "() -> Time", "current timestamp"),
    ("parse_time", "(String, String) -> Time?", "parse with layout"),
    ("time_from_unix", "(Int|Float) -> Time", "epoch seconds to timestamp"),
    ("time_to_unix", "(Time) -> Int", "timestamp to epoch seconds"),
    ("coalesce", "(Any...) -> Any", "first non-NULL"),
    ("in", "(Any, List|Tuple) -> Boolean", "membership"),
    ("panic", "(String) -> never", "raise error"),
    ("vec_dot", "(List<Float>, List<Float>) -> Float", "codegen'd dot product (extension)"))

  private val aggregateFunctions: Seq[(String, String, String)] = Seq(
    ("count", "(Any) -> Int", "row count, NULLs skipped"),
    ("sum", "(Int|Float|Duration) -> same", "sum"),
    ("avg", "(Int|Float) -> same", "mean (Int truncates)"),
    ("min", "(Int|Float|Time|Duration) -> same", "minimum"),
    ("max", "(Int|Float|Time|Duration) -> same", "maximum"),
    ("array_agg", "(Any) -> List", "collect, value-sorted"),
    ("count_distinct", "(Any) -> Int", "distinct count"),
    ("sum_distinct", "(Int|Float) -> same", "distinct sum"),
    ("avg_distinct", "(Int|Float) -> same", "distinct mean"),
    ("array_agg_distinct", "(Any) -> List", "distinct collect"))

  def functions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    scalarFunctions.toDF("name", "signature", "description")
  }

  def aggregates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    aggregateFunctions.toDF("name", "signature", "description")
  }
}
