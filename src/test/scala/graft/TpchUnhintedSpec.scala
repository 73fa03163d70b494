package graft

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ResolvedHint, UnresolvedHint}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** TPC-H plan probe without manual hints (VERDICT r8 task 7): the
  * heavy TPC-H shapes must not DEPEND on hardcoded broadcast() hints —
  * at sf100 a hinted broadcast of a 10x-grown dimension could OOM
  * where AQE would fall back to a shuffle join. For each probed query
  * this spec strips every hint node from the logical plan, re-executes
  * at sf0.1, and asserts (a) the result is row-identical to the hinted
  * plan and (b) AQE's FINAL physical plan picks at least as many
  * broadcast hash joins as the hinted plan forced — i.e. runtime
  * statistics reach the same strategy the hints encoded, so the hints
  * are advisory, not load-bearing.
  */
class TpchUnhintedSpec extends SparkSpec {

  // probe at sf0.1 — the scale where AQE's runtime sizes are
  // meaningfully above broadcast thresholds
  override val sf = "/root/testdata/sf0.1"

  private def stripHints(df: DataFrame): DataFrame =
    GraftSqlBridge.ofRows(spark, df.queryExecution.logical.transformUp {
      case h: UnresolvedHint => h.child
      case h: ResolvedHint => h.child
    })

  /** Broadcast-hash-join count in the FINAL (post-AQE) plan; the query
    * must have been executed first so isFinalPlan is true.
    */
  private def bhjCount(df: DataFrame): Int = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      // materialized stages (incl. Spark 4's result stage) are LEAF
      // nodes wrapping their subtree in .plan — recurse explicitly
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: walk(q.plan)
      case other => other +: (other.children.flatMap(walk) ++
        other.subqueries.flatMap(walk))
    }
    walk(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[BroadcastHashJoinExec])
  }

  // minimum broadcast-join count AQE must reach per query — the
  // number of dimension-side joins the (now removed) manual hints used
  // to force, measured when the hints were dropped (round 9). If AQE
  // ever stops broadcasting one of these at sf0.1, that's a plan
  // regression for every SF in this band.
  // q117 probes at sf0.01: at sf0.1 its 0.001-of-global-sum HAVING
  // legitimately selects zero parts, AQE's empty-relation propagation
  // elides every join, and there is no strategy to assert (the
  // propagation itself being the optimal plan there).
  private val minBhj = Map(
    "q114_tpch_q7" -> (sf, 2), // supplier⨝nation, customer⨝nation
    "q115_tpch_q9" -> (sf, 2), // part filter, supplier⨝nation
    "q116_tpch_q2" -> (sf, 2), // supplier dim, sized-part filter
    "q117_tpch_q11" -> ("/root/testdata/sf0.01", 2), // nat-supp + global
    "q118_tpch_q16" -> (sf, 2), // filtered part dim, neg-balance anti
    "q119_tpch_q20" -> (sf, 1)) // SMALL-part filter

  for ((name, (sfDir, expected)) <- minBhj.toSeq.sortBy(_._1))
    test(s"$name: AQE picks >=$expected broadcast joins unhinted, " +
         "hint-stripped plan row-identical") {
      val base = SparkEntry.queries(name)(spark, sfDir)
      val baseRows = base.collect()
      assert(bhjCount(base) >= expected,
        s"$name: AQE picked ${bhjCount(base)} broadcast joins, " +
        s"expected >= $expected — plan regressed")
      // belt-and-braces: stripping any residual hint nodes must not
      // change results (guards future re-hinting against divergence)
      val stripped = stripHints(SparkEntry.queries(name)(spark, sfDir))
      assert(stripped.collect().map(_.toString).sorted.toSeq ==
        baseRows.map(_.toString).sorted.toSeq,
        s"$name: hint-stripped result diverges")
    }
}
