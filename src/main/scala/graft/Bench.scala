package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  *
  * Timing discipline: a JVM/session warm-up pass first (parquet footer
  * reads, codegen compiler, shuffle machinery) so the first measured
  * query isn't charged Spark's cold start — matching BASELINE.md's
  * warm-cache hyperfine protocol. Queries are forced with a noop-sink
  * write (full materialization of every column, unlike count() which
  * lets Catalyst drop unused projections).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)

    def force(name: String): Long = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      System.nanoTime() - t0
    }

    // warm-up: session machinery + every table's footer/schema
    Engine.TableNames.foreach(n => Engine.table(spark, sfDir, n).count())
    force("q1_agg")

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> force(name) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
