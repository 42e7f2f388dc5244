package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q160's FastSS deletion-neighborhood blocking on a hand vocabulary
  * where every candidate class is present: substitution, deletion,
  * insertion (all distance 1, must appear), a distance-2 pair that
  * shares NO deletion key (must never become a candidate), and a
  * distance-2 pair that DOES share a key (must be cut by the
  * levenshtein confirm, not the blocker). */
class NearKeySpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  private def fixtureDir(names: Seq[(Long, String)]): String = {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("nearkey-fix")
    names.toDF("c_custkey", "c_name").write.mode("overwrite")
      .parquet(dir.resolve("customer.parquet").toString)
    dir.toString
  }

  test("distance-1 pairs of every edit class are found, distance-2 " +
      "candidates are confirmed away") {
    val dir = fixtureDir(Seq(
      1L -> "alpha",
      2L -> "alphx", // substitution of the last char: distance 1
      3L -> "alpa", // deletion of the 'h': distance 1
      4L -> "alphaa", // insertion of an 'a': distance 1
      5L -> "beta", // far from everything
      6L -> "abcd", // shares deletion key "bcd" with bcda...
      7L -> "bcda")) // ...but levenshtein = 2: confirm must cut it
    val pairs = NearKey.q160NearkeyPairs(s, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (1L, 4L)),
      s"got $pairs")
  }

  test("name columns ride along and ordering is by the key pair") {
    val dir = fixtureDir(Seq(1L -> "aaa", 2L -> "aab", 3L -> "aac"))
    val rows = NearKey.q160NearkeyPairs(s, dir).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(rows.head.getString(1) == "aaa" &&
      rows.head.getString(3) == "aab")
  }
}
