package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Contracts for the DataSourceV2 connector: pushdown must narrow the
  * key space BEFORE partition planning (the DSV2 form of partition
  * pruning), column pruning must reach the reader, and the data must
  * match its arithmetic definition.
  */
class Dsv2Spec extends SparkSpec {
  import spark.implicits._

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec = {
    val p = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    p.collectFirst { case b: BatchScanExec => b }.get
  }

  test("rows match the arithmetic definition; splits cover exactly once") {
    val df = spark.read.format("graft-seq").option("end", "1000").load()
    assert(df.count() == 1000)
    val got = df.filter(col("id") < 5).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val want = (0L until 5L).map(id =>
      (id, (id * 2654435761L % 1000000L) / 1000.0, id % 10))
    assert(got.toSeq == want)
  }

  test("id-range filters push down and prune input partitions") {
    val base = spark.read.format("graft-seq")
      .option("end", "100000").option("slices", "8").load()
    // a point lookup narrows to a single 1-row partition
    val point = scanOf(base.filter(col("id") === 12345L))
    assert(point.inputRDD.getNumPartitions == 1, point)
    assert(point.scan.description().contains("[12345,12346)"),
      point.scan.description())
    // a range keeps parallelism but only over the surviving range
    val range = scanOf(base.filter(col("id") >= 90000L))
    assert(range.scan.description().contains("[90000,100000)"),
      range.scan.description())
    assert(range.scan.description().contains("PushedFilters: ["),
      range.scan.description())
    // an empty range plans ZERO partitions — no tasks at all
    val empty = scanOf(base.filter(col("id") >= 200000L))
    assert(empty.inputRDD.getNumPartitions == 0
      || empty.inputRDD.partitions.isEmpty, empty)
  }

  test("column pruning reaches the reader") {
    val df = spark.read.format("graft-seq").option("end", "100").load()
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("bucket"),
      scan.scan.readSchema())
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      == (0L until 10L).map(_ -> 10L).toMap)
  }

  test("graft-mem write commit protocol: round trip, overwrite, append") {
    val df = (0L until 100L).map(i => (i, s"v$i", i * 0.5)).toDF("id", "s", "x")
      .repartition(8) // multi-task write: per-task buffers, one job commit
    df.write.format("graft-mem").option("table", "t_rt").mode("append").save()
    val back = spark.read.format("graft-mem").option("table", "t_rt").load()
    assert(back.schema.fieldNames.toSeq == Seq("id", "s", "x"))
    // string values survive the reused-InternalRow boundary (deep copy)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == (0L until 100L).map(i => (i, s"v$i", i * 0.5)).toSet)
    df.filter(col("id") < 10).write.format("graft-mem")
      .option("table", "t_rt").mode("overwrite").save()
    assert(spark.read.format("graft-mem").option("table", "t_rt").load()
      .count() == 10)
    df.filter(col("id") < 5).write.format("graft-mem")
      .option("table", "t_rt").mode("append").save()
    assert(spark.read.format("graft-mem").option("table", "t_rt").load()
      .count() == 15)
    graft.sources.v2.MemStore.clear("t_rt")
  }

  test("graft-mem atomicity: a failed task leaves the table untouched") {
    val good = (0L until 10L).map(i => (i, s"v$i")).toDF("id", "s")
    good.write.format("graft-mem").option("table", "t_atomic")
      .mode("append").save()
    // a write job whose partition 3 fails mid-task: commit() never runs
    val bad = (0L until 100L).map(i => (i, "x")).toDF("id", "s")
      .repartition(8)
      .select(when(col("id") === 42L,
        raise_error(lit("boom"))).otherwise(col("s")).as("s"), col("id"))
      .select("id", "s")
    intercept[Exception] {
      bad.write.format("graft-mem").option("table", "t_atomic")
        .mode("overwrite").save()
    }
    val after = spark.read.format("graft-mem").option("table", "t_atomic").load()
    assert(after.count() == 10) // the pre-failure contents, not a partial write
    assert(after.collect().map(_.getLong(0)).toSet == (0L until 10L).toSet)
    graft.sources.v2.MemStore.clear("t_atomic")
  }

  test("reported statistics reflect the pruned range and drive broadcast joins") {
    val big = spark.read.format("graft-seq").option("end", "10000000").load()
    val narrowed = big.filter(col("id") >= 9999000L) // 1000 rows after pushdown
    val dim = Engine.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"))
    // the connector side reports ~KBs post-pushdown, so the optimizer
    // broadcasts IT — not the other side, and not a sort-merge join
    val joined = narrowed.join(dim, narrowed("id") % 100 === dim("doc_id") % 100)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("SQL DDL surface: CREATE TABLE ... USING graft-seq") {
    spark.sql("DROP TABLE IF EXISTS seq_ddl")
    spark.sql("CREATE TABLE seq_ddl USING `graft-seq` " +
      "OPTIONS (`end` '500', slices '4')")
    try {
      val got = spark.sql(
        "SELECT bucket, COUNT(*) AS n FROM seq_ddl WHERE id >= 400 GROUP BY bucket")
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        == (0L until 10L).map(_ -> 10L).toMap)
    } finally spark.sql("DROP TABLE IF EXISTS seq_ddl")
  }

  test("global MIN/MAX/COUNT push down completely: no Spark-side aggregation") {
    val df = spark.read.format("graft-seq").option("end", "1000000").load()
      .filter(col("id") >= 250L)
      .agg(count(lit(1)).as("n"), min(col("id")).as("lo"), max(col("id")).as("hi"))
    val r = df.collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (999750L, 250L, 999999L))
    val scan = scanOf(df)
    assert(scan.scan.description().contains("agg-pushdown"), scan.scan.description())
    // complete pushdown: the plan's only aggregate (if any) sees 1 row —
    // assert no hash/sort aggregate over the scan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") || scan.inputRDD.getNumPartitions == 1,
      plan)
    // grouped aggregation is declined and still correct
    val grouped = spark.read.format("graft-seq").option("end", "100").load()
      .groupBy("bucket").agg(max("id").as("m"))
    assert(grouped.collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toMap
      == (0L until 10L).map(b => b -> (90L + b)).toMap)
  }

  test("Long-edge filter bounds do not wrap: > MaxValue empty, <= MaxValue full") {
    val df = spark.read.format("graft-seq").option("end", "100").load()
    assert(df.filter(col("id") > Long.MaxValue).count() == 0)
    assert(df.filter(col("id") <= Long.MaxValue).count() == 100)
    assert(df.filter(col("id") === Long.MaxValue).count() == 0)
  }

  test("graft-mem round-trips NULL cells") {
    val df = Seq((1L, Some("a")), (2L, None)).toDF("id", "s")
    df.write.format("graft-mem").option("table", "t_null").mode("append").save()
    val got = spark.read.format("graft-mem").option("table", "t_null").load()
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("a")), (2L, None)))
    graft.sources.v2.MemStore.clear("t_null")
  }

  test("DELETE FROM a graft-mem catalog table applies filters with SQL null semantics") {
    spark.sql("DROP TABLE IF EXISTS mem_dml")
    Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("b")))
      .toDF("id", "s")
      .write.format("graft-mem").option("table", "mem_dml").mode("append").save()
    spark.sql("CREATE TABLE mem_dml USING `graft-mem` OPTIONS (`table` 'mem_dml')")
    try {
      // s = 'b' is NULL for row 3 -> row 3 survives (DELETE three-valued logic)
      spark.sql("DELETE FROM mem_dml WHERE s = 'b'")
      val left = spark.read.format("graft-mem").option("table", "mem_dml")
        .load().collect().map(_.getLong(0)).toSet
      assert(left == Set(1L, 3L), left)
      spark.sql("DELETE FROM mem_dml WHERE s IS NULL")
      assert(spark.read.format("graft-mem").option("table", "mem_dml")
        .load().collect().map(_.getLong(0)).toSet == Set(1L))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mem_dml")
      graft.sources.v2.MemStore.clear("mem_dml")
    }
  }

  test("graft-mem streaming sink: micro-batches land once; replayed epochs are no-ops") {
    val root = java.nio.file.Files.createTempDirectory("memsink").toFile
    val in = s"$root/in"
    Seq((1L, "a"), (2L, "b")).toDF("id", "s")
      .repartition(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in)
        .writeStream.format("graft-mem")
        .option("table", "t_stream")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drain()
    Seq((3L, "c")).toDF("id", "s").repartition(1).write.mode("append").parquet(in)
    drain() // restart from checkpoint: batch 0 must not re-land
    val got = spark.read.format("graft-mem").option("table", "t_stream").load()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")), got)
    // direct replay of one epoch: second commit with the same id is a no-op
    graft.sources.v2.MemStore.commitEpoch("t_epoch", "run:0",
      spark.read.format("graft-mem").option("table", "t_stream").load().schema,
      Array(Array[Any](9L, "z")))
    graft.sources.v2.MemStore.commitEpoch("t_epoch", "run:0",
      spark.read.format("graft-mem").option("table", "t_stream").load().schema,
      Array(Array[Any](9L, "z")))
    assert(graft.sources.v2.MemStore.get("t_epoch").get.rows.length == 1)
    graft.sources.v2.MemStore.clear("t_stream")
    graft.sources.v2.MemStore.clear("t_epoch")
  }

  test("metadata column _slice: hidden from *, selectable, one value per partition") {
    val df = spark.read.format("graft-seq").option("end", "100")
      .option("slices", "4").load()
    assert(!df.columns.contains("_slice"))
    val slices = df.select(col("id"), col("_slice"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(slices.map(_._2).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L))
    // rows map to their covering range slice
    slices.foreach { case (id, s) => assert(s == id / 25, (id, s)) }
  }

  test("graft-seq streams as a replayable micro-batch source (AvailableNow)") {
    val q = spark.readStream.format("graft-seq")
      .option("end", "1000").option("rowsPerBatch", "300").load()
      .writeStream.format("memory").queryName("seq_stream")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("seq_stream")
    assert(got.count() == 1000)
    assert(got.select("id").distinct().count() == 1000) // once each
    assert(q.recentProgress.length >= 3, // drained in batches, not one gulp
      q.recentProgress.length)
  }

  test("UPDATE and MERGE INTO rewrite the table through group-based row-level ops") {
    spark.sql("DROP TABLE IF EXISTS mem_rlo")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
      .write.format("graft-mem").option("table", "mem_rlo").mode("append").save()
    spark.sql("CREATE TABLE mem_rlo USING `graft-mem` OPTIONS (`table` 'mem_rlo')")
    try {
      spark.sql("UPDATE mem_rlo SET s = 'B' WHERE id = 2")
      assert(spark.table("mem_rlo").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        == Set((1L, "a"), (2L, "B"), (3L, "c")))
      spark.sql("""MERGE INTO mem_rlo t
        USING (SELECT * FROM VALUES (2L, 'bb'), (9L, 'new') AS u(id, s)) u
        ON t.id = u.id
        WHEN MATCHED THEN UPDATE SET s = u.s
        WHEN NOT MATCHED THEN INSERT (id, s) VALUES (u.id, u.s)""")
      assert(spark.table("mem_rlo").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
        == Set((1L, "a"), (2L, "bb"), (3L, "c"), (9L, "new")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS mem_rlo")
      graft.sources.v2.MemStore.clear("mem_rlo")
    }
  }

  test("row-level rewrite commit is version-checked: a concurrent commit is never lost") {
    import graft.sources.v2.{MemStore, MemBatchWrite, MemCommit}
    import org.apache.spark.sql.types.{StructType, StructField, LongType}
    val schema = StructType(Seq(StructField("id", LongType)))
    MemStore.clear("mem_cas")
    MemStore.append("mem_cas", schema, Array(Array[Any](1L)))
    val scanVersion = MemStore.get("mem_cas").get.version
    // a concurrent batch append lands between the rewrite's scan and
    // its commit
    MemStore.append("mem_cas", schema, Array(Array[Any](2L)))
    val rewrite = new MemBatchWrite("mem_cas", schema, overwrite = true,
      expectVersion = () => scanVersion)
    val err = intercept[java.util.ConcurrentModificationException] {
      rewrite.commit(Array(MemCommit(Array(Array[Any](99L)))))
    }
    assert(err.getMessage.contains("mem_cas"))
    // the concurrent writer's rows survive untouched
    assert(MemStore.get("mem_cas").get.rows.map(_.head) sameElements
      Array[Any](1L, 2L))
    // at the CURRENT version the rewrite commits fine
    val fresh = MemStore.get("mem_cas").get.version
    new MemBatchWrite("mem_cas", schema, overwrite = true,
      expectVersion = () => fresh)
      .commit(Array(MemCommit(Array(Array[Any](99L)))))
    assert(MemStore.get("mem_cas").get.rows.map(_.head) sameElements
      Array[Any](99L))
    MemStore.clear("mem_cas")
  }

  test("canDeleteWhere declines comparisons on types cmp cannot order") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.sources._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType),
      StructField("tags", ArrayType(StringType))))
    def can(f: Filter) = graft.sources.v2.MemTable.evaluable(schema, f)
    assert(can(EqualTo("id", 1L)))
    assert(can(IsNull("payload"))) // null tests need no ordering
    assert(!can(EqualTo("payload", Array[Byte](1)))) // declined up front
    assert(!can(LessThan("tags", null)))
    assert(!can(And(EqualTo("id", 1L), EqualTo("payload", Array[Byte](1)))))
  }

  test("connector to connector: replayable source + idempotent sink, exactly once") {
    val ckpt = java.nio.file.Files.createTempDirectory("seq2mem").toFile
    val q = spark.readStream.format("graft-seq")
      .option("end", "500").option("rowsPerBatch", "150").load()
      .select(col("id"), col("bucket"))
      .writeStream.format("graft-mem")
      .option("table", "t_s2m")
      .option("checkpointLocation", s"$ckpt/c")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.read.format("graft-mem").option("table", "t_s2m").load()
    assert(got.count() == 500)
    assert(got.select("id").distinct().count() == 500) // once each
    graft.sources.v2.MemStore.clear("t_s2m")
  }

  test("graft-seq reads columnar: vectorized batches behind one ColumnarToRow boundary") {
    val df = spark.read.format("graft-seq").option("end", "10000").load()
      .filter(col("bucket") === 7L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"), plan)
    assert(df.count() == 1000)
    val sums = df.agg(sum(col("id")).as("s"), sum(col("val")).as("v")).collect()(0)
    val wantIds = (0L until 10000L).filter(_ % 10 == 7)
    assert(sums.getLong(0) == wantIds.sum)
    assert(math.abs(sums.getDouble(1) -
      wantIds.map(id => (id * 2654435761L % 1000000L) / 1000.0).sum) < 1e-6)
  }

  test("non-id predicates stay as residual filters, results stay correct") {
    val df = spark.read.format("graft-seq").option("end", "1000").load()
      .filter(col("bucket") === 3L && col("id") < 100L)
    val scan = scanOf(df)
    // id predicate consumed by the source, bucket predicate residual
    assert(scan.scan.description().contains("[0,100)"), scan.scan.description())
    assert(df.count() == 10)
  }
}
