package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output management for data-lake scale.
  *
  * - `writePartitioned`: hive-style directory partitioning → partition
  *   pruning at read time (a filter on the partition column skips whole
  *   directories, visible as PartitionFilters in the scan).
  * - `writeBucketed`: pre-shuffled, sorted buckets → bucketed joins and
  *   aggregations on the bucket keys skip the exchange entirely (the
  *   "co-located join" strategy for repeatedly-joined 100 TB tables).
  */
object Sink {

  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeBucketed(df: DataFrame, table: String,
                    bucketCols: Seq[String], numBuckets: Int,
                    sortCols: Seq[String] = Nil,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    if (mode == SaveMode.Overwrite) {
      // an orphaned warehouse dir (table written by a previous JVM the
      // in-memory catalog never heard of) fails CTAS with
      // LOCATION_ALREADY_EXISTS even under Overwrite — drop both the
      // catalog entry and any leftover location first
      val spark = df.sparkSession
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      // the catalog lowercases identifiers, so the on-disk location is
      // the lowercased name — checking the verbatim name would miss
      // the orphan on a case-sensitive filesystem and CTAS would still
      // fail with LOCATION_ALREADY_EXISTS
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), table.toLowerCase(java.util.Locale.ROOT))
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory)
            Option(f.listFiles()).foreach(_.foreach(rm)) // null on I/O error
          f.delete()
        }
        rm(loc)
      }
    }
    var w = df.write.mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    w.format("parquet").saveAsTable(table)
  }

  /** Read back a partitioned dataset (partition columns are restored
    * from the directory layout).
    */
  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
