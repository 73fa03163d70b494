package graft

import org.apache.spark.sql.functions._

/** Plan-shape contracts for the relational core: these assert the plan
  * we WANT at scale — pushdown reaching the scan, partial aggregation
  * before the single exchange, dimensions broadcasting instead of
  * shuffling the fact side — so a regression in plan quality fails CI
  * even while results stay correct.
  */
class PlanShapeSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1_agg: map-side partial aggregation, exactly one exchange") {
    val p = planOf("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange".r.findAllIn(p).size == 1, p)
  }

  test("q2_filter: the predicate reaches the parquet scan") {
    val df = SparkEntry.queries("q2_filter")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("PushedFilters:"), formatted)
    // at least one real comparison pushed, not only IsNotNull
    assert("PushedFilters: \\[[^\\]]*(GreaterThan|LessThan|EqualTo|StringStartsWith)"
      .r.findFirstIn(formatted).isDefined, formatted)
  }

  test("q5_join5: every dimension join broadcasts; the fact side never shuffles for a join") {
    val p = planOf("q5_join5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("cosinePairs blocked form plans as an equi-join, unblocked as a cross product") {
    val emb = Engine.table(spark, sf, "embeddings")
    val blocked = graft.operators.Similarity.cosinePairs(emb, 0.45, blocks = 2)
      .queryExecution.executedPlan.toString
    assert(!blocked.contains("NestedLoop") && !blocked.contains("Cartesian"),
      blocked)
    val full = graft.operators.Similarity.cosinePairs(emb, 0.45)
      .queryExecution.executedPlan.toString
    assert(full.contains("NestedLoop") || full.contains("Cartesian"), full)
  }

  test("q51 sketch shards partially aggregate before the exchange") {
    val p = planOf("q51_sketch_rollup")
    // HLL sketches are object aggregates: partial+final pairs per level
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("p16_temperature: rates broadcast back; the corpus crosses no extra exchange") {
    val p = planOf("p16_temperature")
    assert(p.contains("BroadcastHashJoin"), p)
    // exchanges: the tiny counts agg (plus its broadcast) — the corpus
    // side itself must not be hash-repartitioned
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("p17_dataset_diff: snapshots reduce to (id, hash) before the join") {
    val df = SparkEntry.queries("p17_dataset_diff")(spark, sf)
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // the hash projection must land BELOW the exchange: every Exchange
    // input is (doc_id, 8-byte hash), text never crosses the shuffle
    assert(formatted.contains("xxhash64"), formatted)
    val exchangeInputs =
      "(?s)\\(\\d+\\) Exchange.*?Input \\[\\d+\\]: \\[([^\\]]*)\\]".r
        .findAllMatchIn(formatted).map(_.group(1)).toSeq
    assert(exchangeInputs.nonEmpty, formatted)
    exchangeInputs.foreach(in => assert(!in.contains("text#"), in))
  }

  test("q56: custom TopKPerKeyExec plans partial-before-exchange-then-final") {
    val p = planOf("q56_topk_per_key")
    // nodeName renders without the Exec suffix
    assert("TopKPerKey \\[".r.findAllIn(p).size == 2, p)
    assert(p.contains("Exchange"), p)
    // the partial (pre-shuffle) bound must sit BELOW the exchange:
    // reading the tree top-down, final < exchange < partial
    val fin = p.indexOf("TopKPerKey [")
    val ex = p.indexOf("Exchange")
    val part = p.indexOf("TopKPerKey [", fin + 1)
    assert(fin < ex && ex < part, p)
    // and no window-function fallback anywhere
    assert(!p.contains("Window"), p)
  }

  test("q9_topk: ORDER BY + LIMIT plans as distributed top-k, not a global sort") {
    val p = planOf("q9_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("GlobalSort") && !"(?m)^\\s*Sort ".r.findFirstIn(p).isDefined, p)
  }
}
