package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() on sf0.001 returns rows, and
  * every declared oracle key has a matching query. */
class EntrySpec extends AnyFunSuite {
  test("entry returns rows") {
    assert(SparkEntry.entry(SparkSpec.spark).count() > 0)
  }
  test("every oracle key has a query; queries without oracle are known") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    assert((q diff o) == Set("q22_approx"),
      s"rows-only queries: ${q diff o}")
  }
}
