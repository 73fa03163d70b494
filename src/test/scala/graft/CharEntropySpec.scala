package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The codegen'd CharEntropy kernel must agree with the naive
  * explode/groupBy SQL formulation (which is also the shape of the
  * DuckDB oracle) and stay inside whole-stage codegen.
  */
class CharEntropySpec extends SparkSpec {
  import spark.implicits._

  test("CharEntropy matches the explode/groupBy formulation on documents") {
    val docs = Engine.table(spark, sf, "documents").select("doc_id", "text")
    val fast = docs.select(col("doc_id"),
      round(TextAnalysis.charEntropy(col("text")), 6).as("e"))
    val slow = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").count()
      .withColumn("n", sum("count").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg(round(-sum((col("count") / col("n")) *
        log(2.0, col("count") / col("n"))), 6).as("e"))
    val joined = fast.alias("f").join(slow.alias("s"), "doc_id")
      .filter(abs(col("f.e") - col("s.e")) > 1e-6)
    assert(joined.count() == 0)
  }

  test("CharEntropy edge cases: empty, null, uniform, unicode") {
    val df = Seq(
      (1L, ""),            // empty → 0
      (2L, "aaaa"),        // single symbol → 0
      (3L, "ab"),          // two equal → 1 bit
      (4L, "héhé")         // multi-byte code points: h,é,h,é → 1 bit
    ).toDF("id", "t")
    val got = df.select(col("id"),
        round(TextAnalysis.charEntropy(col("t")), 9).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.0, 3L -> 1.0, 4L -> 1.0))
    val withNull = Seq((1L, null: String)).toDF("id", "t")
      .select(TextAnalysis.charEntropy(col("t")).as("e")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("CharEntropy handles many distinct high code points (table growth)") {
    // 300 distinct CJK code points, each once → entropy = log2(300);
    // forces the open-addressed table through several growth rounds
    val s = (0 until 300).map(i => new String(Character.toChars(0x4E00 + i))).mkString
    val got = Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.charEntropy(col("t")).as("e"))
      .collect().head.getDouble(0)
    assert(math.abs(got - math.log(300.0) / math.log(2.0)) < 1e-9, got)
  }

  test("CharEntropy projection stays in whole-stage codegen") {
    val docs = Engine.table(spark, sf, "documents")
    val plan = docs.select(TextAnalysis.charEntropy(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
