package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q160's FastSS deletion-neighborhood audit on hand vocabularies
  * where every candidate class is present: substitution, deletion,
  * insertion (all distance 1, must appear), a distance-2 pair whose
  * only shared deletion key is at two DIFFERENT positions (must never
  * be a candidate under position-aware joining), and duplicated names
  * (distance-0 groups with the C(n,2) id-pair count). */
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
      "shift coincidences never become candidates") {
    val dir = fixtureDir(Seq(
      1L -> "alpha",
      2L -> "alphx", // substitution of the last char: distance 1
      3L -> "alpa", // deletion of the 'h': distance 1
      4L -> "alphaa", // insertion of an 'a': distance 1
      5L -> "beta", // far from everything
      6L -> "abcd", // shares del key "bcd" with bcda, but at a
      7L -> "bcda")) // DIFFERENT position — distance 2, no candidate
    val pairs = NearKey.q160NearkeyPairs(s, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("alpa", "alpha"), ("alpha", "alphaa"),
      ("alpha", "alphx")), s"got $pairs")
  }

  test("duplicated names report distance-0 groups with C(n,2) id " +
      "pairs, and group sizes multiply into cross-name pair counts") {
    val dir = fixtureDir(Seq(
      1L -> "same", 2L -> "same", 3L -> "same", // n = 3 group
      4L -> "samx", 5L -> "samx")) // n = 2 group, distance 1 to same
    val rows = NearKey.q160NearkeyPairs(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      ("same", "same", 3L, 3L, 3L), // C(3,2) duplicate id pairs
      ("same", "samx", 3L, 2L, 6L), // 3·2 cross pairs, one edit apart
      ("samx", "samx", 2L, 2L, 1L)), s"got ${rows.toSeq}")
  }

  test("output is name-grain and ordered by the name pair") {
    val dir = fixtureDir(Seq(1L -> "aaa", 2L -> "aab", 3L -> "aac"))
    val rows = NearKey.q160NearkeyPairs(s, dir).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("aaa", "aab"), ("aaa", "aac"),
      ("aab", "aac")))
  }
}
