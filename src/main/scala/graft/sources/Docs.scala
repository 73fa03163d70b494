package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sql.Resolver

/** Self-documentation tables generated from the typed overload
  * resolver's registry, like the reference's docs datasource
  * (datasources/docs/database.go:26-121):
  *
  *  - `docs.functions` / `docs.aggregates`: (name, description), sorted
  *    by name, entries with empty descriptions skipped (the operators)
  *  - `docs.function_signatures`: one row per descriptor —
  *    (name, argument_types, output_type, strict, simple_signature);
  *    TypeFn descriptors have no static signature, so their types render
  *    as the zero value and `simple_signature` is false
  *    (function_signatures.go:32-73)
  *  - `docs.aggregate_signatures`: (name, argument_type, output_type,
  *    simple_signature) per descriptor (aggregate_signatures.go:32-67)
  *
  * Because the rows come straight from [[Resolver.functions]] /
  * [[Resolver.aggregates]], the docs can never drift from what the
  * typechecker actually accepts.
  */
object Docs {

  def functions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Resolver.functions.toSeq.sortBy(_._1)
      .collect { case (name, d) if d.description.nonEmpty => (name, d.description) }
      .toDF("name", "description")
  }

  def aggregates(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Resolver.aggregates.toSeq.sortBy(_._1)
      .collect { case (name, (desc, _)) if desc.nonEmpty => (name, desc) }
      .toDF("name", "description")
  }

  def functionSignatures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Resolver.functions.toSeq.sortBy(_._1).flatMap { case (name, d) =>
      if (d.description.isEmpty) Nil
      else d.descriptors.map { desc =>
        (name, desc.argumentTypes.map(_.display), desc.outputType.display,
          desc.strict, desc.typeFn.isEmpty)
      }
    }.toDF("name", "argument_types", "output_type", "strict", "simple_signature")
  }

  def aggregateSignatures(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Resolver.aggregates.toSeq.sortBy(_._1).flatMap { case (name, (desc, ds)) =>
      if (desc.isEmpty) Nil
      else ds.map { d =>
        (name, d.argumentType.display, d.outputType.display, d.typeFn.isEmpty)
      }
    }.toDF("name", "argument_type", "output_type", "simple_signature")
  }

  /** All docs tables by unqualified name (database.go GetTable). */
  def table(spark: SparkSession, name: String): DataFrame = name match {
    case "functions"            => functions(spark)
    case "aggregates"           => aggregates(spark)
    case "function_signatures"  => functionSignatures(spark)
    case "aggregate_signatures" => aggregateSignatures(spark)
    case other => throw new IllegalArgumentException(s"unknown table: $other")
  }

  val TableNames: Set[String] =
    Set("functions", "aggregates", "function_signatures", "aggregate_signatures")
}
