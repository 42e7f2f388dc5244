package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The geometric-mechanism CDF thresholds must be the exact scaled
  * two-sided-geometric CDF: strictly increasing, symmetric about 0
  * (CDF(k) = 1 − CDF(−k−1) up to floor slack), with P(0) = 1/3. */
class PrivacySpec extends AnyFunSuite {
  private val scale = BigInt(2).pow(48)
  private val ts = Privacy.GeomCdfE48.toMap

  test("thresholds strictly increase and stay inside [0, 2^48)") {
    val vs = Privacy.GeomCdfE48.map(_._2)
    assert(vs == vs.sorted && vs.distinct == vs)
    assert(vs.head > 0 && vs.last < scale)
  }

  test("closed-form anchor points") {
    assert(ts(-1) == scale / 3) // CDF(-1) = 1/3
    assert(ts(0) == scale * 2 / 3) // CDF(0) = 2/3 → P(0) = 1/3
    // mass halves per step outward: CDF(-k-1) = CDF(-k)/2
    for (k <- -15 to -1) assert(ts(k - 1) == ts(k) / 2)
  }

  test("two-sided symmetry: CDF(k) + CDF(-k-1) = 1 (floor slack ≤ 1)") {
    for (k <- 0 to 14) {
      val slack = scale - (ts(k) + ts(-k - 1))
      assert(slack >= 0 && slack <= 1, s"k=$k slack=$slack")
    }
  }
}
