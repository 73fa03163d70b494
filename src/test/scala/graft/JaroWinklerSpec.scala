package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.JaroWinklerUtil

/** Differential lock of the Jaro / Jaro-Winkler kernel against 12k+
  * DuckDB-generated vectors (scripts/gen_jaro_fixtures.py) — DuckDB is
  * the driver's oracle engine, so p51's scoring must agree with it to
  * the last bit on every pair the blocking can produce. Exact double
  * equality, not tolerance: the kernel follows the same operation
  * order as the standard algorithm, and any drift would surface here
  * before it surfaces as a flipped threshold comparison in the oracle.
  */
class JaroWinklerSpec extends AnyFunSuite {

  private def vectors: Iterator[(String, String, Double, Double)] = {
    val in = getClass.getResourceAsStream("/jaro_vectors.tsv")
    assert(in != null, "missing fixture /jaro_vectors.tsv")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { line =>
      // keep empty fields: a and b may be ""
      val parts = line.split("\t", -1)
      (parts(0), parts(1), parts(2).toDouble, parts(3).toDouble)
    }
  }

  test("jaro + jaroWinkler match 12k DuckDB vectors exactly") {
    var n = 0
    vectors.foreach { case (a, b, j, jw) =>
      val ua = UTF8String.fromString(a)
      val ub = UTF8String.fromString(b)
      val gotJ = JaroWinklerUtil.jaro(ua, ub)
      val gotJw = JaroWinklerUtil.jaroWinkler(ua, ub)
      assert(gotJ == j, s"jaro('$a','$b'): got $gotJ want $j")
      assert(gotJw == jw, s"jw('$a','$b'): got $gotJw want $jw")
      n += 1
    }
    assert(n > 12000)
  }

  test("symmetry and boost gating") {
    val ps = Seq(("dixon", "dicksonx"), ("axxxxxxx", "ayyyyyyy"),
      ("prefix_same", "prefix_diff"))
    ps.foreach { case (a, b) =>
      val ua = UTF8String.fromString(a); val ub = UTF8String.fromString(b)
      assert(JaroWinklerUtil.jaroWinkler(ua, ub) ==
        JaroWinklerUtil.jaroWinkler(ub, ua))
    }
    // boost applies only above 0.7 jaro
    val lo = JaroWinklerUtil.jaro(UTF8String.fromString("axxxxxxx"),
      UTF8String.fromString("ayyyyyyy"))
    assert(lo < 0.7 && JaroWinklerUtil.jaroWinkler(
      UTF8String.fromString("axxxxxxx"),
      UTF8String.fromString("ayyyyyyy")) == lo)
  }
}
