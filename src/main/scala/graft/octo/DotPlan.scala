package graft.octo

import org.apache.spark.sql.catalyst.trees.TreeNode

/** Graphviz rendering of a Catalyst plan tree, shaped like the
  * reference's `helpers/graph` dot output (record-shaped nodes,
  * `rankdir=LR`, `name_N` ids with per-name counters,
  * physical/explain.go + cmd/root.go:321-340). The reference pipes the
  * dot source into `dot -Tpng` and opens the image; headless/library
  * processes print the dot source itself — a superset, since any
  * graphviz install renders it.
  *
  * `withTypeInfo` (reference `--explain 2`) adds each operator's output
  * schema to its record label.
  */
object DotPlan {

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("|", "\\|").replace("{", "\\{").replace("}", "\\}")
      .replace("<", "\\<").replace(">", "\\>")

  def render(plan: TreeNode[_], withTypeInfo: Boolean): String = {
    val sb = new StringBuilder
    sb.append("digraph {\n")
    sb.append("\trankdir=LR;\n")
    val counters = scala.collection.mutable.HashMap[String, Int]()
    def walk(node0: TreeNode[_]): String = {
      // AQE's wrapper holds its real plan as a field, not a child —
      // unwrap so the graph shows the operators, not one opaque box
      val node: TreeNode[_] = node0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case other => other
      }
      val name = node.nodeName
      val c = counters.getOrElse(name, 0)
      counters(name) = c + 1
      val id = name.replaceAll("[^A-Za-z0-9_]", "_") + "_" + c
      val fields = if (withTypeInfo) node match {
        case q: org.apache.spark.sql.catalyst.plans.QueryPlan[_] =>
          q.output.map(a => s"${a.name}: ${a.dataType.simpleString}")
        case _ => Nil
      } else Nil
      val labelParts = Seq(s"<f0> ${esc(name)}") ++
        (if (fields.nonEmpty) Seq(fields.map(esc).mkString("|")) else Nil)
      val label = labelParts.mkString("}|{")
      sb.append(s"""	$id [shape=record, label="{{$label}}"];""").append('\n')
      node.children.foreach { ch =>
        val cid = walk(ch.asInstanceOf[TreeNode[_]])
        sb.append(s"	$id -> $cid;").append('\n')
      }
      id
    }
    walk(plan)
    sb.append("}\n")
    sb.toString
  }
}
