package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec

/** Plan-hygiene audit: builds the physical plan of every SparkEntry
  * query and flags scale hazards — CartesianProduct /
  * BroadcastNestedLoopJoin nodes (all-pairs shapes that cannot survive a
  * 100× scale-up) anywhere they are not either (a) a scalar join whose
  * build side is provably ≤1 row (a global aggregate: joining a 1-row
  * total/mean/threshold is a broadcast of one row at any corpus size),
  * or (b) an explicitly documented design choice.
  *
  * Exit code 1 on unexpected hazards, so it can run as a gate. Allowed
  * entries document WHY the all-pairs shape is intended — every one is
  * an in-query exact ground truth that gives a randomized operator
  * (LSH/IVF) a deterministic recall oracle; the production path next to
  * it is bucketed.
  */
object AuditPlans {
  /** query -> justification for an all-pairs physical join. */
  val allowed: Map[String, String] = Map(
    "d5_embed_pairs" -> "exact all-pairs cosine: d6's ground truth",
    "d6_embed_lsh" -> "in-query exact ground truth for the recall oracle",
    "q6_theta_join" -> "non-equi theta predicate: all-pairs is the semantics",
    "s1_ann_topk" -> "brute-force ANN: ground truth for s2/s3/s7",
    "s2_ann_lsh" -> "in-query brute-force ground truth for the recall oracle",
    "s3_ann_ivf" -> "in-query brute-force ground truth for the recall oracle",
    "s7_ann_ivf_kmeans" -> "in-query brute-force ground truth for the recall oracle",
    "s10_ivfpq" -> "in-query brute-force ground truth for the recall oracle",
    "s12_ann_index_probe" ->
      "in-query brute-force ground truth for the recall oracle",
    "s13_matryoshka" ->
      ("prefix-dim coarse scan (pdim/dim of brute cost) is the demo " +
        "path — compose with IVF cells for the bucketed form; plus the " +
        "in-query brute-force ground truth for the recall oracle"),
    "s11_rrf" ->
      ("single-query brute-force cosine: one broadcast query row x one " +
        "corpus scan is linear, the BNLJ is the 1-row build side"),
    "t29_js_divergence" ->
      ("pair universe = cross of the per-source TOTALS aggregate " +
        "(|sources|² rows, corpus-size-independent) so disjoint-" +
        "vocabulary pairs surface with JS = ln 2; the vocabulary-sized " +
        "work stays on the equi-join"),
    "d20_semantic_decontam" ->
      ("eval side is MB-scale by definition (the d8 asymmetry in embedding " +
        "space): broadcast eval matrix over one corpus scan IS the scale path"))

  /** True when `p`'s OUTPUT row count is bounded by a limit: `p`
    * itself is a limit/top-k (TakeOrderedAndProject, CollectLimit,
    * Global/LocalLimit — but NOT WindowGroupLimit, which bounds rows
    * per group, not total), or `p` is a row-preserving unary node over
    * a bounded input. A limit found merely somewhere in the subtree
    * does NOT bound the output — `corpus.join(dim.limit(10))` is
    * corpus-sized even though a GlobalLimit exists below it — so the
    * walk follows only the direct input chain and stops at joins,
    * unions, generates and expands.
    */
  private[graft] def boundedByLimit(p: SparkPlan): Boolean = {
    val n = p.nodeName
    if ((n.contains("Limit") && !n.contains("WindowGroupLimit")) ||
        n.contains("TakeOrdered")) true
    else if (p.children.length == 1 && !n.contains("Generate") &&
        !n.contains("Expand")) boundedByLimit(p.children.head)
    else false
  }

  /** True when `p` provably emits ≤1 row: a global (no-grouping-key)
    * aggregate, possibly wrapped in row-preserving unary nodes
    * (project/filter/exchange/codegen). Generate/Expand nodes stop the
    * descent — they multiply rows.
    */
  private def boundedOneRow(p: SparkPlan): Boolean = p match {
    case a: BaseAggregateExec => a.groupingExpressions.isEmpty
    case u if u.children.length == 1 &&
      !u.nodeName.contains("Generate") && !u.nodeName.contains("Expand") =>
      boundedOneRow(u.children.head)
    case _ => false
  }

  /** Scale hazards in a physical plan: all-pairs joins whose build side
    * is not provably ≤1 row, and unpartitioned windows (single-task
    * global sort — the documented WindowExec warning) over input not
    * bounded by a limit. Shared by the main gate and its spec.
    */
  private[graft] def hazards(plan: SparkPlan): Seq[String] = plan.collect {
    case j if (j.nodeName.contains("CartesianProduct") ||
        j.nodeName.contains("BroadcastNestedLoopJoin")) &&
        !j.children.exists(boundedOneRow) => j.nodeName
    case w: WindowExec if w.partitionSpec.isEmpty &&
        !boundedByLimit(w.child) => "UnpartitionedWindow"
  }

  /** THE gate (VERDICT r7 task 8): one query's pass/fail decision,
    * shared verbatim by the `main` below and by QueriesSpec's
    * per-query test — so a future query cannot pass the spec while
    * failing the main (or vice versa). Returns Some(failure message)
    * on an unexpected hazard, None when the plan is clean or the query
    * is allow-listed.
    */
  def gate(name: String,
           df: org.apache.spark.sql.DataFrame): Option[String] = {
    val found = hazards(df.queryExecution.sparkPlan)
    if (found.isEmpty || allowed.contains(name)) None
    else Some(s"$name: unexpected scale hazard: ${found.mkString(",")}")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Engine.session("local[8]", 8)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var unexpected = List.empty[String]
    names.foreach { name =>
      val res =
        try {
          val df = SparkEntry.queries(name)(spark, sfDir)
          gate(name, df) match {
            case Some(msg) =>
              unexpected ::= msg
              "UNEXPECTED " + msg
            case None =>
              val allPairs = hazards(df.queryExecution.sparkPlan)
              if (allPairs.isEmpty) "ok"
              else s"ALLOWED ${allPairs.mkString(",")} (${allowed(name)})"
          }
        } catch { case e: Throwable =>
          unexpected ::= s"$name: plan build failed: ${e.getMessage}"
          "ERROR"
        }
      println(f"[audit] $name%-28s $res")
      spark.sqlContext.clearCache()
    }
    spark.stop()
    if (unexpected.nonEmpty) {
      System.err.println("[audit] UNEXPECTED HAZARDS:\n  " + unexpected.mkString("\n  "))
      sys.exit(1)
    } else println(s"[audit] clean: ${names.size} query plans, no unexpected all-pairs joins")
  }
}
