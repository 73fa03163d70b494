package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.octo._

/** Go-format parity oracles, taken verbatim from the reference's golden
  * scenario outputs (tests/scenarios, .out files) and Go stdlib behavior.
  */
class OctoFmtSpec extends AnyFunSuite {

  test("goFloat matches Go fmt.Sprint(float64)") {
    assert(GoFmt.goFloat(3.0) == "3")
    assert(GoFmt.goFloat(42.0) == "42")
    assert(GoFmt.goFloat(-2.0) == "-2")
    assert(GoFmt.goFloat(7.0 / 3.0) == "2.3333333333333335")
    assert(GoFmt.goFloat(1.8248328e7) == "1.8248328e+07")
    assert(GoFmt.goFloat(763625.0) == "763625")
    assert(GoFmt.goFloat(1000000.0) == "1e+06")
    assert(GoFmt.goFloat(42.42) == "42.42")
    assert(GoFmt.goFloat(42.42424242424242) == "42.42424242424242")
    assert(GoFmt.goFloat(0.5) == "0.5")
    assert(GoFmt.goFloat(0.00001) == "1e-05")
    assert(GoFmt.goFloat(0.0001) == "0.0001")
    assert(GoFmt.goFloat(2.1972245773362196) == "2.1972245773362196")
    assert(GoFmt.goFloat(0.0) == "0")
    assert(GoFmt.goFloat(123456.789) == "123456.789")
    // JDK 17's Double.toString is NOT shortest for these (JDK-4511638);
    // the shortest-digits search must still match Go
    assert(GoFmt.goFloat(1.0e23) == "1e+23")
    assert(GoFmt.goFloat(2.82879384806159e17) == "2.82879384806159e+17")
    assert(GoFmt.goFloat(1.9e-3) == "0.0019")
  }

  test("goFloatF matches Go strconv.FormatFloat(f,'f',-1,64)") {
    assert(OValue.goFloatF(42.42) == "42.42")
    assert(OValue.goFloatF(42.0) == "42")
    assert(OValue.goFloatF(1.8248328e7) == "18248328")
    assert(OValue.goFloatF(42.42424242424242) == "42.42424242424242")
  }

  test("goDuration matches Go time.Duration.String()") {
    assert(GoFmt.goDuration(0L) == "0s")
    assert(GoFmt.goDuration(3L * 1000000000L) == "3s")
    assert(GoFmt.goDuration(-3L * 1000000000L) == "-3s")
    assert(GoFmt.goDuration(2333333333L) == "2.333333333s")
    assert(GoFmt.goDuration(21L * 1000000000L) == "21s")
    assert(GoFmt.goDuration(2L * 1000000000L) == "2s")
    // 5h32m42s = (5*3600 + 32*60 + 42) s
    assert(GoFmt.goDuration((5L * 3600 + 32 * 60 + 42) * 1000000000L) == "5h32m42s")
    assert(GoFmt.goDuration(60L * 1000000000L) == "1m0s")
    assert(GoFmt.goDuration(1500000L) == "1.5ms")
    assert(GoFmt.goDuration(500L) == "500ns")
    assert(GoFmt.goDuration(1500L) == "1.5µs")
  }

  test("rfc3339") {
    assert(GoFmt.rfc3339(java.time.Instant.ofEpochSecond(1655931949L)) == "2022-06-22T21:05:49Z")
  }

  test("type display strings (types.go String())") {
    val t = OStruct(Seq(
      "field4" -> OUnion(Seq(ONull, OString)),
      "field5" -> OUnion(Seq(OFloat, OString)),
      "field6" -> OUnion(Seq(ONull, OString))))
    assert(t.display == "{field4: NULL | String; field5: Float | String; field6: NULL | String}")
  }

  test("typeSum merges structs and orders unions by type id") {
    val a = OStruct(Seq("field4" -> OString, "field5" -> OFloat))
    val b = OStruct(Seq("field5" -> OString, "field6" -> OString))
    val s = OType.typeSum(a, b)
    assert(s == OStruct(Seq(
      "field4" -> OUnion(Seq(ONull, OString)),
      "field5" -> OUnion(Seq(OFloat, OString)),
      "field6" -> OUnion(Seq(ONull, OString)))))
    assert(OType.typeSum(OString, OFloat) == OUnion(Seq(OFloat, OString)))
    assert(OType.typeSum(OUnion(Seq(OFloat, OString)), OFloat) == OUnion(Seq(OFloat, OString)))
  }

  test("tablewriter replica") {
    val out = TableFmt.render(Seq("count", "sum_field2", "sum"),
      Seq(Seq("18144", "675864", "81648")))
    assert(out ==
      """+-------+------------+-------+
        || count | sum_field2 |  sum  |
        |+-------+------------+-------+
        || 18144 |     675864 | 81648 |
        |+-------+------------+-------+
        |""".stripMargin)
    val out2 = TableFmt.render(Seq("hello"), Seq(Seq("'world'")))
    assert(out2 ==
      """+---------+
        ||  hello  |
        |+---------+
        || 'world' |
        |+---------+
        |""".stripMargin)
    val out3 = TableFmt.render(Seq("l.i", "r.i"), Seq(Seq("<null>", "-20"), Seq("1", "-5")))
    assert(out3 ==
      """+--------+-----+
        ||  l.i   | r.i |
        |+--------+-----+
        || <null> | -20 |
        ||      1 |  -5 |
        |+--------+-----+
        |""".stripMargin)
  }
}
