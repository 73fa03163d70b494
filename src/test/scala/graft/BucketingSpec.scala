package graft

import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle: writing both join sides bucketed on
  * the join key lets every later join/aggregation on that key run with
  * NO exchange at all — the co-location strategy for repeatedly-joined
  * 100 TB fact tables (pay one shuffle at ingest, never again).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join and aggregate with zero Exchange") {
    val li = Engine.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val od = Engine.table(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    od.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("od_bucketed")
    val expected = li.join(od, col("l_orderkey") === col("o_orderkey")).count()
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // forbid broadcast so the co-located sort-merge path must carry it
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed")
        .join(spark.table("od_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      assert(j.count() == expected && expected > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      // aggregation on the bucket key rides the same pre-partitioning
      val agg = spark.table("li_bucketed").groupBy("l_orderkey")
        .agg(sum("l_quantity"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), aggPlan)
      assert(agg.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS od_bucketed")
    }
  }
}
