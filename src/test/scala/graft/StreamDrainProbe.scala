package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Scratch profiler for the stream-stream outer-join drain (st8/st11):
  * phase timings + micro-batch count. Test-scope only; not shipped.
  * Run: sbt "Test/runMain graft.StreamDrainProbe"
  */
object StreamDrainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session("local[32]", 32)
    def phase[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    spark.read.parquet(s"$dir/events.parquet").limit(1).count()

    Seq(8, 4, 2, 8).zipWithIndex.foreach { case (parts, round) =>
      println(s"[probe] ===== parts=$parts =====")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val (timeCol, typeCol, keyCol, idCol) =
        ("ts", "event_type", "user_id", "event_id")
      val (leftType, rightType, within) = ("click", "purchase", "1 hour")
      val queryName = s"probe_r$round"

      val base = Engine.normalizeEventTime(
          spark.read.parquet(s"$dir/events.parquet"), timeCol)
        .select(col(idCol), col(keyCol), col(typeCol), col(timeCol))
      val stageDir = java.nio.file.Files.createTempDirectory("graft_probe")
      val stage = stageDir.toFile.getAbsolutePath
      phase("stage write")(base.write.mode("overwrite").parquet(stage))
      val schema = phase("schema read")(spark.read.parquet(stage).schema)
      def stream(side: String, as: (String, String, String)): DataFrame = {
        val s0 = spark.readStream.schema(schema).parquet(stage)
          .filter(col(typeCol) === side)
          .select(col(idCol).as(as._1), col(keyCol).as(as._2),
            col(timeCol).as(as._3))
        s0.withWatermark(as._3, within)
      }
      val l = stream(leftType, ("left_id", "k", "lts"))
      val r = stream(rightType, ("right_id", "rk", "rts"))
      val joined = l.join(r,
          col("k") === col("rk") && col("rts") >= col("lts") &&
          col("rts") <= col("lts") + expr(s"INTERVAL $within"),
          "left_outer")
        .select(col("left_id"), col("right_id"),
          coalesce(col("k"), col("rk")).as("k"))
      val flushTs = phase("flushTs scan")(base
        .selectExpr(s"max($timeCol) + 3 * INTERVAL $within AS s")
        .first().getTimestamp(0))
      def sentinel(bump: Long): Unit = {
        val rows = java.util.Arrays.asList(
          Row(-1L, -1L, leftType,
            new java.sql.Timestamp(flushTs.getTime + bump)),
          Row(-2L, -1L, rightType,
            new java.sql.Timestamp(flushTs.getTime + bump)))
        spark.createDataFrame(rows, schema)
          .write.mode("append").parquet(stage)
      }
      phase("sentinel 1")(sentinel(0L))
      val q = phase("start") {
        joined.writeStream.outputMode("append")
          .format("memory").queryName(queryName).start()
      }
      phase("batch 1 drain")(q.processAllAvailable())
      println(s"[probe] batches=${q.recentProgress.map(_.batchId).mkString(",")}")
      phase("stop")(q.stop())
      phase("count")(println(s"[probe] rows=${spark.table(queryName).count()}"))
    }
    spark.stop()
  }
}
