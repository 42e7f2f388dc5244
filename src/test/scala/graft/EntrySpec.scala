package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() on sf0.001 returns rows, and
  * every declared oracle key has a matching query. */
class EntrySpec extends AnyFunSuite {
  test("entry returns rows") {
    assert(SparkEntry.entry(SparkSpec.spark).count() > 0)
  }
  test("every query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o diff q}")
    assert((q diff o).isEmpty, s"rows-only queries: ${q diff o}")
  }
}
