package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Hive-style partitioned layout = the other half of the ingest-time
  * organization story (bucketing co-locates joins; partitioning prunes
  * scans): a filter on the partition column must reach the scan as a
  * partition filter and cut the files read, not just the rows kept.
  */
class PartitionPruningSpec extends SparkSpec {

  private def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectFirst { case s: FileSourceScanExec => s }.get
  }

  test("a partition-column filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    Engine.table(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val all = spark.read.parquet(dir)
    val types = all.select("event_type").distinct().count()
    assert(types > 1, s"need >1 partition to prove pruning, got $types")

    val one = all.filter(col("event_type") === "click")
    val scan = scanOf(one)
    // the filter lands in the scan's partitionFilters, and the selected
    // partition count drops to exactly one
    assert(scan.partitionFilters.nonEmpty, scan.toString)
    assert(scan.relation.partitionSchema.fieldNames.contains("event_type"))
    val selected = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).size
    assert(selected == 1, s"expected 1 selected partition, got $selected")
    assert(one.count() > 0 && one.count() < all.count())
  }
}
