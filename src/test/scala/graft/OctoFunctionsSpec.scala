package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.functions.Octo

/** Unit tests for the octosql-compatible scalar surface, pinned to the
  * reference semantics in SURVEY §2.10 (0-based indexing, null-on-fail
  * casts, integer division truncating toward zero).
  */
class OctoFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column): Row =
    spark.range(1).select(c).collect().head

  test("substr0 is 0-based and clamps") {
    assert(one(Octo.substr0(lit("hello"), lit(1), lit(3))).getString(0) == "ell")
    assert(one(Octo.substr0(lit("hello"), lit(0), lit(2))).getString(0) == "he")
    assert(one(Octo.substr0(lit("hello"), lit(3))).getString(0) == "lo")
  }

  test("position0 is 0-based, NULL when absent") {
    assert(one(Octo.position0(lit("hello"), lit("ll"))).getLong(0) == 2L)
    assert(one(Octo.position0(lit("hello"), lit("xy"))).isNullAt(0))
  }

  test("intDiv truncates toward zero (Go semantics)") {
    assert(one(Octo.intDiv(lit(7), lit(2))).getLong(0) == 3L)
    assert(one(Octo.intDiv(lit(-7), lit(2))).getLong(0) == -3L)
  }

  test("index0 is 0-based, NULL out of bounds") {
    val arr = array(lit(10), lit(20), lit(30))
    assert(one(Octo.index0(arr, lit(1))).getInt(0) == 20)
    assert(one(Octo.index0(arr, lit(9))).isNullAt(0))
  }

  test("null-on-fail casts") {
    assert(one(Octo.toIntOcto(lit("42"))).getLong(0) == 42L)
    assert(one(Octo.toIntOcto(lit("abc"))).isNullAt(0))
    assert(one(Octo.toFloatOcto(lit("3.5"))).getDouble(0) == 3.5)
    assert(one(Octo.toIntOcto(lit(true))).getLong(0) == 1L)
  }

  test("strRepeat and regex ops") {
    assert(one(Octo.strRepeat(lit("ab"), lit(3))).getString(0) == "ababab")
    assert(one(Octo.regexMatchCI(lit("HELLO"), "hel+o")).getBoolean(0))
    assert(!one(Octo.regexMatch(lit("HELLO"), "hel+o")).getBoolean(0))
  }

  test("time conversions round-trip") {
    val df = Seq(1700000000L).toDF("u")
      .select(Octo.timeToUnix(Octo.timeFromUnix(col("u"))).as("r"))
    assert(df.collect().head.getLong(0) == 1700000000L)
  }
}
