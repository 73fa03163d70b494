package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Path-as-table resolution: the reference treats `people.csv`,
  * `logs.json`, `data.parquet`, `notes.txt` (lines) as table names
  * (reference: physical/physical.go:65-86, cmd/root.go:192-198), with
  * `?header=false`, `?sep=x`, `ext.path` overrides
  * (parser/parser.go:321-356).
  *
  * Spark-first: each resolves to a `DataFrameReader` call, so schema
  * inference, parallel IO, predicate pushdown and column pruning are the
  * built-in ones. The JSON worker pool / CSV sampling machinery of the
  * reference is subsumed by Spark's distributed readers.
  */
object PathTable {

  /** Options parsed from a `path?k=v&k2=v2` suffix. */
  private def splitOpts(spec: String): (String, Map[String, String]) =
    spec.split('?') match {
      case Array(p)       => (p, Map.empty)
      case Array(p, opts) =>
        (p, opts.split('&').filter(_.nonEmpty).map { kv =>
          kv.split("=", 2) match {
            case Array(k, v) => k -> v
            case Array(k)    => k -> "true"
          }
        }.toMap)
      case parts          => (parts.head, Map.empty)
    }

  /** Resolve a table spec to a DataFrame. Accepts `path.ext[?opts]`,
    * `stdin.ext` (reference: execution/files/stdin.go), or the
    * `docs.functions` / `docs.aggregates` self-documentation tables
    * (datasources/docs/database.go:26-121).
    */
  def resolve(spark: SparkSession, spec: String): DataFrame = {
    val (path, opts) = splitOpts(spec)
    if (path.startsWith("stdin."))
      readStdin(spark, path.stripPrefix("stdin."), opts)
    else if (path == "docs.functions") Docs.functions(spark)
    else if (path == "docs.aggregates") Docs.aggregates(spark)
    else {
      val ext = path.split('.').last.toLowerCase
      read(spark, path, ext, opts)
    }
  }

  /** stdin is driver-local by nature: drain it on the driver and
    * parallelize — the reference buffers the sampled prefix the same way
    * (files.go:102-112).
    */
  def readStdin(spark: SparkSession, format: String,
                opts: Map[String, String] = Map.empty): DataFrame = {
    import spark.implicits._
    val lines = scala.io.Source.stdin.getLines().toSeq
    val ds = spark.createDataset(lines)
    format match {
      case "json" => spark.read.json(ds)
      case "csv" =>
        spark.read.option("header", opts.getOrElse("header", "true"))
          .option("inferSchema", "true").csv(ds)
      case "tsv" =>
        spark.read.option("header", opts.getOrElse("header", "true"))
          .option("inferSchema", "true").option("sep", "\t").csv(ds)
      case "lines" | "txt" =>
        ds.toDF("text").withColumn("number",
          row_number().over(Window.orderBy(monotonically_increasing_id())).cast("long") - 1)
          .select("number", "text")
      case other =>
        throw new IllegalArgumentException(s"unsupported stdin format: $other")
    }
  }

  def read(spark: SparkSession, path: String, format: String,
           opts: Map[String, String] = Map.empty): DataFrame = format match {
    case "csv" =>
      spark.read
        .option("header", opts.getOrElse("header", "true"))
        .option("inferSchema", "true")
        .option("sep", opts.getOrElse("sep", ","))
        .csv(path)
    case "tsv" =>
      read(spark, path, "csv", opts + ("sep" -> "\t"))
    case "json" => // JSONLines, schema merged across sampled records.
      // Reference parity: octosql infers every JSON number as Float
      // (datasources/json/impl.go:83-89); Spark infers integers as
      // long — widen top-level integer columns to double.
      val df = spark.read.json(path)
      df.columns.foldLeft(df) { (acc, c) =>
        acc.schema(c).dataType match {
          case org.apache.spark.sql.types.LongType =>
            acc.withColumn(c, col(c).cast("double"))
          case _ => acc
        }
      }
    case "parquet" =>
      spark.read.parquet(path)
    case "lines" | "txt" | "log" =>
      // {number: Int, text: String} like the reference's lines source
      // (datasources/lines/impl.go:13-63). number is a per-file line
      // ordinal: at scale a global zipWithIndex would serialize, so we
      // derive it from a per-partition monotonic id ordering instead.
      val sep = opts.get("sep")
      val base = sep match {
        case Some(s) => spark.read.option("lineSep", s).text(path)
        case None    => spark.read.text(path)
      }
      val w = Window.orderBy(monotonically_increasing_id())
      base
        .withColumn("number", row_number().over(w).cast("long") - 1)
        .select(col("number"), col("value").as("text"))
    case other =>
      throw new IllegalArgumentException(s"unsupported table format: $other")
  }

  /** Streaming variant of the lines source (`?tail=true` in the
    * reference, execution/files/files.go:27-76) → Structured Streaming
    * file source.
    */
  def tailLines(spark: SparkSession, path: String): DataFrame =
    spark.readStream.text(path).select(col("value").as("text"))
}
