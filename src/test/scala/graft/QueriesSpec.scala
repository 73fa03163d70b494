package graft

import org.apache.spark.sql.functions._

/** Smoke: every SparkEntry query runs at sf0.001 and returns a sane
  * shape. Value-level correctness is the driver's DuckDB gate
  * (scripts/check.py locally).
  */
class QueriesSpec extends SparkSpec {

  // queries whose correct answer may legitimately be empty at sf0.001
  private val mayBeEmpty = Set("q2_filter", "d2_ngram_jaccard",
    "d3_minhash_lsh", "d5_embed_pairs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs") {
      val df = fn(spark, sf)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or is explicitly rows-only") {
    val rowsOnly = Set("d3_minhash_lsh", "d4_simhash", "s2_ann_lsh",
      "m2_media_features")
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("q1_agg groups are complete") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val flags = df.select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(flags.toSet.subsetOf(Set("A", "N", "R")))
  }

  test("q9_topk is ordered descending") {
    val rows = SparkEntry.queries("q9_topk")(spark, sf)
      .collect().map(_.getDouble(1))
    assert(rows.sameElements(rows.sortBy(-(_: Double))))
  }
}
