package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Exactly-once file→DSv2 streaming with checkpoint restart (VERDICT
  * r8 task 8): every st* query drains to a memory sink for the oracle;
  * a real pipeline drains to a durable sink with checkpoint-commit
  * atomicity. This spec drives the st3-family dedup shape (replayable
  * parquet file source → transform → the graft-mem DSv2 streaming
  * sink) through the two failure modes that define exactly-once:
  *
  *   1. **kill between micro-batches**: stop after batch 0, add input,
  *      restart on the same checkpoint — the new query resumes from
  *      the committed offset, no loss, no dupes;
  *   2. **kill AFTER the sink commit, BEFORE the checkpoint commit**
  *      (the classic torn window): simulated by deleting the
  *      checkpoint's commits/N marker, forcing Spark to RE-RUN the
  *      epoch on restart — the sink sees a duplicate (queryId, epoch)
  *      commit and the idempotence ledger drops it.
  */
class StreamRestartSpec extends SparkSpec {
  import spark.implicits._

  private def run(inDir: String, ckpt: String, table: String): Unit = {
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(inDir)
      .select(col("id"), (col("id") % 10).as("bucket"))
    val q = src.writeStream
      .format("graft-mem")
      .option("table", table)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  private def sinkIds(table: String): Seq[Long] =
    spark.read.format("graft-mem").option("table", table).load()
      .select("id").as[Long].collect().toSeq

  test("restart between micro-batches: no loss, no dupes") {
    val in = Files.createTempDirectory("graft_restart_in").toString
    val ckpt = Files.createTempDirectory("graft_restart_ck").toString
    (0L until 100L).toDF("id").coalesce(1).write.mode("append").parquet(in)
    run(in, ckpt, "t_restart")
    assert(sinkIds("t_restart").sorted == (0L until 100L))
    // the "kill": query is stopped; new input lands while it's down
    (100L until 200L).toDF("id").coalesce(1).write.mode("append").parquet(in)
    run(in, ckpt, "t_restart") // fresh query object, same checkpoint
    assert(sinkIds("t_restart").sorted == (0L until 200L),
      "restart lost or duplicated rows")
    // a third restart with no new input must be a no-op
    run(in, ckpt, "t_restart")
    assert(sinkIds("t_restart").sorted == (0L until 200L))
    graft.sources.v2.MemStore.clear("t_restart")
  }

  test("stateful restart: counting-trigger state recovers from the " +
      "checkpoint, pre-kill retractions are not re-emitted") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    def runCounting(inDir: String, ckpt: String, table: String): Unit = {
      val src = spark.readStream
        .schema(StructType(Seq(StructField("key", StringType))))
        .option("maxFilesPerTrigger", "1")
        .parquet(inDir)
        .as[String]
      val q = graft.streaming.Streams.countingTriggerCounts(src, 2)
        .toDF().writeStream
        .format("graft-mem")
        .option("table", table)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def emitted(table: String): Seq[(String, Long, Boolean)] =
      spark.read.format("graft-mem").option("table", table).load()
        .as[(String, Long, Boolean)].collect().toSeq.sorted
    val in = Files.createTempDirectory("graft_state_in").toString
    val ckpt = Files.createTempDirectory("graft_state_ck").toString
    // batch 0: a×3 (fires at 2, then holds count=3), b×2 (fires at 2),
    // c×4 (fires at 2, then RETRACTS 2 and fires at 4 — the pre-kill
    // retraction that must never re-emit)
    val f1 = Seq("a", "a", "a", "b", "b", "c", "c", "c", "c")
    f1.toDF("key").coalesce(1).write.mode("append").parquet(in)
    runCounting(in, ckpt, "t_state")
    assert(emitted("t_state") == Seq(
      ("a", 2L, false), ("b", 2L, false),
      ("c", 2L, false), ("c", 2L, true), ("c", 4L, false)).sorted,
      emitted("t_state"))
    // the kill: query stopped between micro-batches; new input lands
    val f2 = Seq("a", "c", "c")
    f2.toDF("key").coalesce(1).write.mode("append").parquet(in)
    runCounting(in, ckpt, "t_state") // fresh query, same checkpoint
    val afterRestart = emitted("t_state")
    // a resumed at count=3/lastEmitted=2 FROM THE STATE STORE: one more
    // 'a' fires at 4 and retracts the pre-kill 2 — if state had been
    // lost, count would restart at 1 and nothing would fire
    val expected = Seq(
      ("a", 2L, false), ("b", 2L, false),
      ("c", 2L, false), ("c", 2L, true), ("c", 4L, false),
      ("a", 2L, true), ("a", 4L, false),
      ("c", 4L, true), ("c", 6L, false)).sorted
    assert(afterRestart == expected, afterRestart)
    // the retraction emitted BEFORE the kill appears exactly once
    assert(afterRestart.count(_ == ("c", 2L, true)) == 1)
    // and the whole run equals an unkilled reference run on the same
    // input (streaming-equals-batch discipline for recovery)
    val ckptRef = Files.createTempDirectory("graft_state_ck2").toString
    runCounting(in, ckptRef, "t_state_ref")
    assert(emitted("t_state_ref") == afterRestart)
    graft.sources.v2.MemStore.clear("t_state")
    graft.sources.v2.MemStore.clear("t_state_ref")
  }

  test("epoch replay after torn commit window: sink ledger dedups") {
    val in = Files.createTempDirectory("graft_torn_in").toString
    val ckpt = Files.createTempDirectory("graft_torn_ck").toString
    (0L until 50L).toDF("id").coalesce(1).write.mode("append").parquet(in)
    run(in, ckpt, "t_torn")
    assert(sinkIds("t_torn").sorted == (0L until 50L))
    // simulate the crash AFTER the sink committed epoch 0 but BEFORE
    // the checkpoint recorded it: delete commits/0, keep offsets/0 —
    // on restart Spark re-executes batch 0 and re-commits it to the
    // sink, which must recognize the (queryId, epoch) replay
    val commit0 = new java.io.File(s"$ckpt/commits/0")
    assert(commit0.exists, "expected checkpoint commit marker commits/0")
    assert(commit0.delete())
    // the local checksum FS keeps a .crc sidecar; it must go with the
    // marker or the re-written commit's rename trips over it
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    run(in, ckpt, "t_torn")
    assert(sinkIds("t_torn").sorted == (0L until 50L),
      "replayed epoch was double-applied — exactly-once broken")
    graft.sources.v2.MemStore.clear("t_torn")
  }
}
