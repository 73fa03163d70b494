package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's `octosql.yml` database configuration surface
  * (config/config.go:57-101): `databases:` entries name external
  * databases that queries address as `FROM <name>.<table>`.
  *
  * The reference dispatches these to plugin processes over RPC; this
  * engine's deliberate swap routes them to Spark's JDBC source (the
  * SURVEY design decision, spec-tested against embedded Derby), so a
  * reference user's config file keeps working for the relational
  * databases the plugins covered:
  *
  * {{{
  * databases:
  *   - name: mydb
  *     type: postgres            # or mysql, or raw jdbc
  *     config:
  *       host: localhost
  *       port: 5432
  *       database: app
  *       user: me
  *       password: secret
  * }}}
  *
  * Lookup order matches the reference: `$XDG_CONFIG_HOME/octosql/
  * octosql.yml`, then `~/.octosql/octosql.yml`; the `graft.octosql.
  * config` system property overrides both (tests point it at a temp
  * file). Parsed with the SnakeYAML shipped in Spark's jars.
  */
object OctoConfig {

  final case class DbConfig(name: String, dbType: String,
                            options: Map[String, String])

  def configPath: Option[Path] =
    sys.props.get("graft.octosql.config").map(Paths.get(_))
      .orElse(sys.env.get("XDG_CONFIG_HOME")
        .map(p => Paths.get(p, "octosql", "octosql.yml")).filter(Files.exists(_)))
      .orElse(Option(Paths.get(sys.props.getOrElse("user.home", "."),
        ".octosql", "octosql.yml")).filter(Files.exists(_)))

  /** name → database config; empty when no config file exists
    * (config.Read treats a missing file as the empty config).
    * Cached by (path, mtime): table resolution consults the config for
    * every one-dot table name — including plain `people.csv` — and a
    * query with N table references would otherwise stat + fully parse
    * the YAML 2N+ times. An edited file (new mtime) re-parses.
    */
  private val dbCache =
    new java.util.concurrent.atomic.AtomicReference[((Path, Long), Map[String, DbConfig])]()
  def databases: Map[String, DbConfig] = configPath match {
    case Some(p) if Files.exists(p) =>
      val key = (p, Files.getLastModifiedTime(p).toMillis)
      val cached = dbCache.get()
      if (cached != null && cached._1 == key) cached._2
      else {
        val parsed =
          try parse(new String(Files.readAllBytes(p), "UTF-8"))
          catch {
            case e: Exception =>
              throw new IllegalArgumentException(
                s"couldn't unmarshal yaml configuration: ${e.getMessage}")
          }
        dbCache.set((key, parsed))
        parsed
      }
    case _ => Map.empty
  }

  private[sources] def parse(yamlText: String): Map[String, DbConfig] = {
    val root = new org.yaml.snakeyaml.Yaml().load[Any](yamlText)
    val rootMap = root match {
      case m: java.util.Map[_, _] => m.asScala
      case _ => return Map.empty
    }
    rootMap.collectFirst { case ("databases", dbs: java.util.List[_]) =>
      dbs.asScala.collect { case entry: java.util.Map[_, _] =>
        val e = entry.asScala.map { case (k, v) => k.toString -> v }
        val name = e.getOrElse("name", "").toString
        val dbType = e.getOrElse("type", "").toString
        val cfg = e.get("config") match {
          case Some(m: java.util.Map[_, _]) =>
            m.asScala.map { case (k, v) => k.toString -> String.valueOf(v) }.toMap
          case _ => Map.empty[String, String]
        }
        name -> DbConfig(name, dbType, cfg)
      }.toMap
    }.getOrElse(Map.empty)
  }

  def database(name: String): Option[DbConfig] = databases.get(name)

  /** Read `<db>.<table>` through Spark's JDBC source. `jdbc` entries
    * pass their config straight through as JDBC options (url, driver,
    * user, password); `postgres`/`mysql` entries get their URL built
    * from the reference plugins' config fields (host/port/database).
    */
  def table(spark: SparkSession, db: DbConfig, tableName: String): DataFrame = {
    val opts: Map[String, String] = db.dbType match {
      case "jdbc" => db.options
      case "postgres" | "postgresql" =>
        val host = db.options.getOrElse("host", "localhost")
        val port = db.options.getOrElse("port", "5432")
        val database = db.options.getOrElse("database", db.name)
        Map("url" -> s"jdbc:postgresql://$host:$port/$database") ++
          db.options.view.filterKeys(Set("user", "password")).toMap
      case "mysql" =>
        val host = db.options.getOrElse("host", "localhost")
        val port = db.options.getOrElse("port", "3306")
        val database = db.options.getOrElse("database", db.name)
        Map("url" -> s"jdbc:mysql://$host:$port/$database") ++
          db.options.view.filterKeys(Set("user", "password")).toMap
      case other =>
        throw new IllegalArgumentException(
          s"database type '$other' is not built into this engine " +
            "(built-in types: jdbc, postgres, mysql)")
    }
    spark.read.format("jdbc").options(opts)
      .option("dbtable", tableName).load()
  }
}
