package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Sink

class SinkSpec extends SparkSpec {

  test("partitioned write enables partition pruning on read") {
    val out = Files.createTempDirectory("graft_part").toString + "/li"
    val li = Engine.table(spark, sf, "lineitem")
    Sink.writePartitioned(li, out, Seq("l_returnflag"))
    val back = Sink.readPartitioned(spark, out)
    assert(back.count() == li.count())
    val pruned = back.filter(col("l_returnflag") === "A")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("l_returnflag"), "expected partition pruning in scan")
    assert(pruned.count() ==
      li.filter(col("l_returnflag") === "A").count())
  }

  test("bucketed table join avoids the shuffle exchange") {
    // clean up any stale table metadata/files from a previous JVM
    Seq("orders_b", "cust_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val o = Engine.table(spark, sf, "orders")
    Sink.writeBucketed(o, "orders_b", Seq("o_custkey"), 4, Seq("o_custkey"))
    val c = Engine.table(spark, sf, "customer")
    Sink.writeBucketed(c, "cust_b", Seq("c_custkey"), 4, Seq("c_custkey"))
    val joined = spark.table("orders_b")
      .join(spark.table("cust_b"),
        col("o_custkey") === col("c_custkey"))
    // force sort-merge path so exchanges would be visible if needed
    val smj = joined.hint("merge")
    val plan = smj.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 0, s"bucketed join should not shuffle, got:\n$plan")
    assert(smj.count() == o.join(c, col("o_custkey") === col("c_custkey")).count())
  }
}
