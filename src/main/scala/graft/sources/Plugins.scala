package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's plugins meta-datasource (datasources/plugins/
  * database.go:40-180), re-expressed for an engine whose "plugins" are
  * Spark's own connectors: `installed_plugins` / `installed_versions`
  * list the built-in format handlers and the federation surface;
  * `available_plugins` / `available_versions` / `repositories` are the
  * plugin-repository views — empty here (no plugin RPC protocol, no
  * egress), kept with the reference's exact schemas so queries against
  * them typecheck and return zero rows rather than failing.
  */
object Plugins {

  /** Built-in handlers — the Spark-native "installed plugins". */
  private[graft] val installed: Seq[(String, String)] = Seq(
    ("csv", "builtin/spark"),
    ("tsv", "builtin/spark"),
    ("json", "builtin/spark"),
    ("parquet", "builtin/spark"),
    ("lines", "builtin/spark"),
    ("jdbc", "builtin/spark"))

  /** Names of the built-in connectors (the CLI's plugin-install stub). */
  val installedNames: Set[String] = installed.map(_._1).toSet

  def table(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    name match {
      case "installed_plugins" =>
        installed.toDF("name", "repo_slug")
      case "installed_versions" =>
        installed.map { case (n, slug) =>
          (org.apache.spark.SPARK_VERSION, false, n, slug)
        }.toDF("version", "prerelease", "plugin_name", "repo_slug")
      case "available_plugins" =>
        Seq.empty[(String, String, String, String, String, String, String, String)]
          .toDF("name", "description", "file_extensions", "website",
            "contact_email", "license", "readme_url", "repo_slug")
      case "available_versions" =>
        Seq.empty[(String, Boolean, String, String)]
          .toDF("version", "prerelease", "plugin_name", "repo_slug")
      case "repositories" =>
        Seq.empty[(String, String, String)].toDF("slug", "name", "description")
      case other =>
        throw new IllegalArgumentException(s"no such plugins table: $other")
    }
  }
}
