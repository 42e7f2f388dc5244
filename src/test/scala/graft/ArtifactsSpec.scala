package graft

import org.scalatest.funsuite.AnyFunSuite

/** Committed scale/verify artifacts must cover the live query set —
  * the round-6 and round-8 findings were both "new query landed with
  * green tests but artifact-blind" (absent from VERIFY_sf01 /
  * BENCH_sf1 / BENCH_sf10). This gate makes that a CI failure in the
  * SAME commit that adds the query, mirroring the AUDIT.md staleness
  * gate that already works.
  */
class ArtifactsSpec extends AnyFunSuite {

  /** Depth-1 keys of the `"field": {...}` object in a JSON artifact
    * (values may themselves be flat objects — VERIFY_sf01's results
    * are `{rows, match}` — so the scan is brace-depth-aware; a full
    * JSON parser is not needed to read a key set, and none of these
    * generated artifacts put braces or quotes inside strings). */
  private def jsonObjectKeys(path: String, field: String): Set[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val txt = try src.mkString finally src.close()
    val start = txt.indexOf("\"" + field + "\":")
    assert(start >= 0, s"$path has no \"$field\" object")
    val open = txt.indexOf('{', start)
    var depth = 0
    var i = open
    val body = new StringBuilder
    var done = false
    while (!done && i < txt.length) {
      val c = txt.charAt(i)
      if (c == '{') depth += 1 else if (c == '}') depth -= 1
      if (depth == 1 && c != '{') body.append(c)
      if (depth == 0) done = true
      i += 1
    }
    "\"([A-Za-z0-9_]+)\":".r.findAllMatchIn(body.toString())
      .map(_.group(1)).toSet
  }

  private val postQ51: Set[String] = SparkEntry.queries.keySet.filter { n =>
    val m = "^q(\\d+)_".r.findFirstMatchIn(n)
    m.exists(_.group(1).toInt >= 52)
  }

  test("VERIFY_sf01.json covers every post-q51 query (sf0.1 oracle " +
      "re-confirmation is not allowed to lag the query set)") {
    val have = jsonObjectKeys("VERIFY_sf01.json", "results")
    val missing = postQ51 -- have
    assert(missing.isEmpty,
      s"VERIFY_sf01.json stale — missing ${missing.toSeq.sorted.mkString(",")}; " +
        "re-run Verify at sf0.1 for the post-q51 set and refresh the artifact")
  }

  test("BENCH_FULL/BENCH_sf1/BENCH_sf10 cover every query incl. bench extras") {
    val want = SparkEntry.queries.keySet ++ SparkEntry.benchExtras.keySet
    for (f <- Seq("BENCH_FULL.json", "BENCH_sf1.json", "BENCH_sf10.json")) {
      val have = jsonObjectKeys(f, "queries")
      val missing = want -- have
      assert(missing.isEmpty,
        s"$f stale — missing ${missing.toSeq.sorted.mkString(",")}; " +
          "re-run graft.Bench at that scale and commit the refreshed artifact")
    }
  }
}
