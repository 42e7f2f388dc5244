package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver tails ~2000 chars of Bench stdout and parses the JSON
  * line out of it — so the line must stay bounded at any query count
  * (VERDICT r8 #7: 150 queries would overflow the old map-always
  * encoding). */
class BenchLineSpec extends AnyFunSuite {

  private def fakeQueries(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => s"q${i}_some_long_operator_name" -> (i * 0.123))

  test("stdout line keeps the per-query map while it fits") {
    val line = Bench.stdoutLine(1.5, fakeQueries(20), "BENCH_FULL.json",
      "/root/testdata/sf0.1")
    assert(line.contains("\"queries\":{"))
    assert(line.contains("\"q5\":")) // short names
    assert(line.length <= 1500)
  }

  test("stdout line is bounded under 1500 chars at 150 and 300 queries") {
    for (n <- Seq(150, 300)) {
      val line = Bench.stdoutLine(123.456, fakeQueries(n),
        "BENCH_FULL.json", "/root/testdata/sf0.1")
      assert(line.length < 1500, s"n=$n line=${line.length} chars")
      assert(line.contains("\"metric\":\"total\""))
      assert(line.contains("\"bench_full\":\"BENCH_FULL.json\"") ||
        line.contains("\"queries\":{"))
    }
  }

  test("fallback line points at the full-detail artifact") {
    val line = Bench.stdoutLine(9.0, fakeQueries(300), "BENCH_FULL.json", "sf")
    assert(line.contains("\"n_queries\":300"))
    assert(line.contains("\"bench_full\":\"BENCH_FULL.json\""))
  }

  test("short names never collide across the bench entry set") {
    val names = (SparkEntry.queries.keySet ++
      SparkEntry.benchExtras.keySet).toSeq
    val shorts = names.map(Bench.shortName)
    assert(shorts.distinct.size === shorts.size,
      "duplicate short key in the stdout JSON map: " +
        shorts.groupBy(identity).filter(_._2.size > 1).keys.mkString(","))
  }

  test("fallback line still carries a parseable top-10-slowest map") {
    val line = Bench.stdoutLine(9.0, fakeQueries(300), "BENCH_FULL.json", "sf")
    assert(line.contains("\"queries\":{"))
    // fakeQueries times grow with i, so the 10 slowest are q291..q300
    assert(line.contains("\"q300\":"))
    assert(line.contains("\"q291\":"))
    assert(!line.contains("\"q290\":"))
    assert(!line.contains("\"q1\":"))
  }
}
