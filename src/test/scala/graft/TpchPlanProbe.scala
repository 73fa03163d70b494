package graft

/** Scratch: print formatted plans of the round-7 TPC-H additions.
  * Run: sbt "Test/runMain graft.TpchPlanProbe"
  */
object TpchPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]", 8)
    val sf = "/root/testdata/sf0.001"
    Seq("q98_tpch_q21", "q99_tpch_q15", "q100_tpch_q18",
        "q101_tpch_q14", "q102_tpch_q19").foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sf).queryExecution.executedPlan
        .toString.linesIterator.map(_.take(150)).mkString("\n"))
    }
    spark.stop()
  }
}
