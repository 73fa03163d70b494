package graft

import org.apache.spark.sql.GraftSqlBridge
import graft.plans.OctoArith

/** Type-directed dialect arithmetic — oracles from the reference's
  * functions/arithmetic golden scenario.
  */
class OctoArithSpec extends SparkSpec {

  private def run1(sql: String): Seq[Any] = {
    val plan = OctoArith.rewritePlan(GraftSqlBridge.parse(spark, sql))
    val row = GraftSqlBridge.ofRows(spark, plan).collect()(0)
    row.toSeq
  }

  test("string concat and repeat via + and *") {
    assert(run1("SELECT 'test1' + 'test2'") == Seq("test1test2"))
    assert(run1("SELECT 'test1' * 3") == Seq("test1test1test1"))
    assert(run1("SELECT 3 * 'test1'") == Seq("test1test1test1"))
  }

  test("int division truncates toward zero; float division stays float") {
    assert(run1("SELECT 7 / 3") == Seq(2L))
    assert(run1("SELECT -7 / 3") == Seq(-2L))
    assert(run1("SELECT CAST(7.0 AS DOUBLE) / CAST(3.0 AS DOUBLE)") == Seq(7.0 / 3.0))
    // Int / Float has no descriptor — the reference rejects it
    // (functions.go:320-355; no implicit Int↔Float coercion)
    val e = intercept[graft.sql.Dialect.TypecheckException](
      run1("SELECT 7 / CAST(3.0 AS DOUBLE)"))
    assert(e.getMessage == "unknown function: /(Int, Float)")
  }

  test("duration (decimal seconds) arithmetic") {
    // 3s + 2s; dialect represents INTERVAL n SECOND as DECIMAL(38,9) seconds
    val sum = run1("SELECT CAST(3.0 AS DECIMAL(38,9)) + CAST(2.0 AS DECIMAL(38,9))")
    assert(sum.head.asInstanceOf[java.math.BigDecimal].doubleValue == 5.0)
    // dur / int keeps nanosecond precision: 7s/3 → 2.333333333s
    val div = run1("SELECT CAST(7.0 AS DECIMAL(38,9)) / 3")
    val nanos = div.head.asInstanceOf[java.math.BigDecimal]
      .movePointRight(9).setScale(0, java.math.RoundingMode.DOWN).longValueExact()
    assert(nanos == 2333333333L)
    // dur / dur → double
    assert(run1("SELECT CAST(7.0 AS DECIMAL(38,9)) / CAST(3.0 AS DECIMAL(38,9))") == Seq(7.0 / 3.0))
  }

  test("time ± duration; time - time is a reference type error") {
    val r = run1("SELECT timestamp_seconds(1655931949) + CAST(2.0 AS DECIMAL(38,9))")
    assert(r.head.asInstanceOf[java.sql.Timestamp].toInstant.getEpochSecond == 1655931951L)
    val s = run1("SELECT timestamp_seconds(1655931949) - CAST(2.0 AS DECIMAL(38,9))")
    assert(s.head.asInstanceOf[java.sql.Timestamp].toInstant.getEpochSecond == 1655931947L)
    // the reference `-` has no (Time, Time) descriptor (functions.go:208-267)
    val e = intercept[graft.sql.Dialect.TypecheckException](
      run1("SELECT timestamp_seconds(1655931952) - timestamp_seconds(1655931949)"))
    assert(e.getMessage == "unknown function: -(Time, Time)")
  }
}
