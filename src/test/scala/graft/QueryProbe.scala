package graft

/** Scratch: time one query on one dataset and dump its formatted plan.
  * Run: sbt "Test/runMain graft.QueryProbe <name> <sfDir> [passes] [plan]"
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val passes = args.lift(2).map(_.toInt).getOrElse(2)
    val showPlan = args.lift(3).contains("plan")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Engine.session(s"local[$cpus]", cpus.toInt)
    Engine.TableNames.foreach(n => Engine.table(spark, sfDir, n).count())
    (1 to passes).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name pass $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      Engine.releaseCaches(spark)
      System.gc()
    }
    if (showPlan)
      println(SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
        .linesIterator.map(_.take(200)).mkString("\n"))
    spark.stop()
  }
}
