package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling-exponent fit behind BENCH_SCALING.json: exact slopes on
  * synthetic power laws, robustness to NaN/zero samples.
  */
class ScalingFitSpec extends AnyFunSuite {

  private def powerLaw(c: Double, e: Double): Seq[(Double, Double)] =
    Seq(0.1, 0.3, 1.0).map(sf => sf -> c * math.pow(sf, e))

  test("recovers exact exponents on power-law timings") {
    for (e <- Seq(0.0, 0.5, 1.0, 1.7, 2.0)) {
      val got = ScalingBench.fitExponent(powerLaw(3.7, e))
      assert(math.abs(got - e) < 1e-9, s"e=$e got=$got")
    }
  }

  test("drops NaN / non-positive points; NaN under two valid points") {
    val withNaN = Seq(0.1 -> 1.0, 0.3 -> Double.NaN, 1.0 -> 10.0)
    assert(math.abs(ScalingBench.fitExponent(withNaN) - 1.0) < 1e-9)
    val withZero = Seq(0.1 -> 0.0, 0.3 -> 3.0, 1.0 -> 10.0)
    assert(ScalingBench.fitExponent(withZero) ==
      ScalingBench.fitExponent(Seq(0.3 -> 3.0, 1.0 -> 10.0)))
    assert(ScalingBench.fitExponent(Seq(0.1 -> Double.NaN, 1.0 -> 2.0)).isNaN)
    assert(ScalingBench.fitExponent(Nil).isNaN)
  }

  test("the 1.2 flag threshold separates linear from quadratic") {
    assert(ScalingBench.fitExponent(powerLaw(1.0, 1.0)) <= 1.2)
    assert(ScalingBench.fitExponent(powerLaw(1.0, 2.0)) > 1.2)
    // a constant-overhead + linear mix stays under the flag
    val mixed = Seq(0.1, 0.3, 1.0).map(sf => sf -> (0.2 + 0.5 * sf))
    assert(ScalingBench.fitExponent(mixed) < 1.2)
  }
}
