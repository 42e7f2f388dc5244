package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q140 canonical selection on planted near-dup clusters: identical
  * triplet keeps its smallest id, a subset/superset pair keeps the
  * LONGER member, singletons never appear. */
class CanonicalDedupSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q140 keeps the longest member per cluster, smallest id on ties") {
    import s.implicits._
    val base = "graft spark engine query operator shuffle partition " +
      "broadcast join aggregate window sketch stream batch oracle " +
      "verify bench audit scale cluster executor driver stage task " +
      "codegen catalyst tungsten parquet"
    val other = "lorem ipsum dolor sit amet consectetur adipiscing " +
      "elit sed do eiusmod tempor incididunt ut labore et dolore " +
      "magna aliqua enim ad minim veniam quis nostrud exercitation " +
      "ullamco laboris nisi aliquip"
    val dir = java.nio.file.Files.createTempDirectory("canon-docs")
    Seq(
      (1L, base), (2L, base), (3L, base), // identical triplet
      (10L, other),
      (11L, other + " extra trailing tokens"), // same cluster, longer
      (50L, "a completely unrelated singleton document body"))
      .map { case (id, text) => (id, text, "en", "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val rows = Pipeline3.q140CanonicalDedup(s, dir.toString).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(1L, 10L), s"clusters: ${rows.keySet}")
    val trip = rows(1L)
    assert(trip.getLong(1) == 1L, "tie -> smallest doc_id")
    assert(trip.getLong(2) == 3L && trip.getLong(4) == 2L)
    val pair = rows(10L)
    assert(pair.getLong(1) == 11L, "longer member wins")
    assert(pair.getLong(2) == 2L && pair.getLong(4) == 1L)
  }
}
