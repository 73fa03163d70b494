package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query profiling harness (optimization guide §1: measure first).
  *
  * `runMain graft.Profile <sfDir> <query> [passes]` runs one
  * `SparkEntry.queries` entry through the noop sink `passes` times
  * (default 3) inside one session, with a SparkListener aggregating
  * per-stage wall time, executor task time, shuffle read/write bytes
  * and spill. Prints, per pass, the stages sorted by task time, plus
  * the query's `explain("formatted")` once — the local stand-in for
  * the Spark UI stage page (the UI is disabled in the bench session).
  *
  * Diagnostic tool only: not part of the driver contract, never
  * invoked by Bench/Verify.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
      .replaceAll("/+$", "")
    val name = args.lift(1).getOrElse(sys.error("usage: Profile <sfDir> <query> [passes]"))
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)

    val q = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name"))

    // stage metrics accumulated by listener; keyed by stageId
    case class St(var name: String = "", var submitted: Long = 0,
                  var completed: Long = 0, var taskTimeMs: Long = 0,
                  var shufReadB: Long = 0, var shufWriteB: Long = 0,
                  var inputB: Long = 0, var spillB: Long = 0,
                  var nTasks: Int = 0, var gcMs: Long = 0)
    val stages = mutable.LinkedHashMap[Int, St]()
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
          s.name = e.stageInfo.name.takeWhile(_ != '\n')
          s.submitted = System.nanoTime()
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageInfo.stageId, St())
          s.completed = System.nanoTime()
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        stages.synchronized {
          val s = stages.getOrElseUpdate(e.stageId, St())
          val m = e.taskMetrics
          if (m != null) {
            s.taskTimeMs += m.executorRunTime
            s.gcMs += m.jvmGCTime
            s.shufReadB += m.shuffleReadMetrics.totalBytesRead
            s.shufWriteB += m.shuffleWriteMetrics.bytesWritten
            s.inputB += m.inputMetrics.bytesRead
            s.spillB += m.memoryBytesSpilled + m.diskBytesSpilled
          }
          s.nTasks += 1
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // plan once (pre-execution; AQE initial plan)
    println(s"==== $name explain (initial) ====")
    println(q(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))

    (1 to passes).foreach { pass =>
      stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      q(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Engine.releaseCaches(spark)
      // drain listener bus so late task-end events land in this pass
      // (listenerBus is private[spark]; reflective call as StreamScaling)
      try {
        val m = spark.sparkContext.getClass.getMethod("listenerBus")
        val bus = m.invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(200) }
      println(f"==== $name pass $pass: wall $wall%.3f s ====")
      val snap = stages.synchronized(stages.toVector)
      val totalTask = snap.map(_._2.taskTimeMs).sum
      println(f"  stages=${snap.size} totalTaskTime=${totalTask / 1e3}%.2f s " +
        f"shufWrite=${snap.map(_._2.shufWriteB).sum / 1e6}%.1f MB " +
        f"spill=${snap.map(_._2.spillB).sum / 1e6}%.1f MB")
      snap.sortBy(-_._2.taskTimeMs).take(14).foreach { case (id, s) =>
        val stageWall = if (s.completed > s.submitted && s.submitted > 0)
          (s.completed - s.submitted) / 1e9 else -1.0
        println(f"  stage $id%4d wall=$stageWall%7.3f task=${s.taskTimeMs / 1e3}%7.2f s " +
          f"n=${s.nTasks}%4d gc=${s.gcMs / 1e3}%5.2f in=${s.inputB / 1e6}%8.2f MB " +
          f"sr=${s.shufReadB / 1e6}%8.2f sw=${s.shufWriteB / 1e6}%8.2f MB  ${s.name.take(70)}")
      }
    }
    spark.stop()
  }
}
