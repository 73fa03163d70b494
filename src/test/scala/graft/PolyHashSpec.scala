package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The codegen'd PolyHash expression must reproduce the HOF fold it
  * replaced (`aggregate(transform(split(text,"")), ascii)`) exactly —
  * the driver's DuckDB oracles replay that fold bit-for-bit.
  */
class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  /** The previous interpreted formulation, kept as the test oracle. */
  private def hofHash(text: org.apache.spark.sql.Column, mult: Long,
                      modulus: Long): org.apache.spark.sql.Column =
    aggregate(
      transform(split(text, ""), c => ascii(c).cast("long")),
      lit(0L),
      (acc, c) => (acc * mult + c) % modulus)

  test("PolyHash matches the HOF fold on real documents text") {
    val docs = Engine.table(spark, sf, "documents").select("text")
    val mismatches = docs.select(
      TextAnalysis.polyHash(col("text"), 31L, 1000000007L).as("fast"),
      hofHash(col("text"), 31L, 1000000007L).as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(mismatches == 0)
  }

  test("PolyHash edge cases: empty, null, single char, both hash families") {
    val df = Seq(Some(""), None, Some("a"), Some("hello world"), Some("Zz 09 !?"))
      .toDF("t")
    val rows = df.select(
      TextAnalysis.polyHash(col("t"), 31L, 1000000007L).as("h1"),
      hofHash(col("t"), 31L, 1000000007L).as("e1"),
      TextAnalysis.polyHash(col("t"), 37L, 998244353L).as("h2"),
      hofHash(col("t"), 37L, 998244353L).as("e2")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getLong(0) == r.getLong(1))
      assert(r.isNullAt(2) == r.isNullAt(3))
      if (!r.isNullAt(2)) assert(r.getLong(2) == r.getLong(3))
    }
    // deterministic spot value: "a" -> 97 mod p
    val a = df.filter(col("t") === "a").select(
      TextAnalysis.polyHash(col("t"), 31L, 1000000007L)).head.getLong(0)
    assert(a == 97L)
  }

  test("PolyHash folds Unicode code points (DuckDB ascii parity)") {
    // é = U+00E9, 𐍈 = U+10348 (4-byte UTF-8): fold must see one code
    // point each, exactly like DuckDB's ascii(substr(text, i, 1))
    val h = Seq("é").toDF("t").select(
      TextAnalysis.polyHash(col("t"), 31L, 1000000007L)).head.getLong(0)
    assert(h == 0xE9L)
    val h4 = Seq("𐍈").toDF("t").select(
      TextAnalysis.polyHash(col("t"), 31L, 1000000007L)).head.getLong(0)
    assert(h4 == 0x10348L)
  }

  test("PolyHash degrades on malformed UTF-8 instead of crashing") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.plans.PolyHashUtil
    // truncated sequences: a 2-byte lead, a 3-byte lead with one
    // continuation, a 4-byte lead with two — all at end of buffer.
    // Spark's UTF8String doesn't guarantee valid UTF-8 (web/Parquet
    // text), so these must fold byte-wise, not read out of bounds.
    val cases = Seq(
      Array(0xC3.toByte),
      Array('a'.toByte, 0xE2.toByte, 0x82.toByte),
      Array('x'.toByte, 0xF0.toByte, 0x90.toByte, 0x8D.toByte))
    cases.foreach { bytes =>
      val h = PolyHashUtil.hash(UTF8String.fromBytes(bytes), 31L, 1000000007L)
      assert(h >= 0L) // no ArrayIndexOutOfBoundsException, stable result
    }
    // valid input is unaffected by the guard
    assert(PolyHashUtil.hash(UTF8String.fromString("é"), 31L, 1000000007L) == 0xE9L)
  }

  test("poly_hash registry builder rejects bad arity and non-literal params") {
    graft.plans.PolyHashExpr.register(spark)
    val df = Seq(("a", 31L)).toDF("t", "m")
    df.createOrReplaceTempView("ph_neg")
    val e1 = intercept[Throwable](
      spark.sql("SELECT poly_hash(t) FROM ph_neg").collect())
    assert(Iterator.iterate(e1)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => Option(c.getMessage).exists(_.contains("got 1 arguments"))), e1.toString)
    val e2 = intercept[Throwable](
      spark.sql("SELECT poly_hash(t, m, m) FROM ph_neg").collect())
    assert(Iterator.iterate(e2)(_.getCause).takeWhile(_ != null).take(8)
      .exists(c => Option(c.getMessage).exists(_.contains("non-literal"))), e2.toString)
  }

  test("PolyHash stays inside whole-stage codegen") {
    val docs = Engine.table(spark, sf, "documents")
      .select(TextAnalysis.fingerprint(col("text")).as("fp"))
    // the `*(n)` prefix on Project is the WholeStageCodegen marker
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"),
      s"fingerprint projection fell out of codegen:\n$plan")
  }
}
