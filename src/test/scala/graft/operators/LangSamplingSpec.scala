package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** q138 temperature sampling on a 36/9/4/1 language split — shares,
  * sqrt weights, allocations and boosts all hand-computed. */
class LangSamplingSpec extends AnyFunSuite {
  private lazy val s = SparkSpec.spark

  test("q138 computes sqrt-temperature weights and allocations") {
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("sampling-docs")
    val rows =
      (1 to 36).map(i => (i.toLong, s"english doc $i", "en")) ++
        (37 to 45).map(i => (i.toLong, s"deutsches dok $i", "de")) ++
        (46 to 49).map(i => (i.toLong, s"doc francais $i", "fr")) ++
        Seq((50L, "documento espanol", "es"))
    rows.map { case (id, text, lang) => (id, text, lang, "t", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val out = TextAnalysis.q138LangSampling(s, dir.toString)
      .collect().map(r => r.getString(0) -> r).toMap
    // w = floor(sqrt(n/50 * 1e12)): 848528 / 424264 / 282842 / 141421
    assert(out("en").getLong(4) == 848528L)
    assert(out("de").getLong(4) == 424264L)
    assert(out("fr").getLong(4) == 282842L)
    assert(out("es").getLong(4) == 141421L)
    // alloc = w * 50 // 1697055: 25 / 12 / 8 / 4
    assert(out("en").getLong(5) == 25L && out("de").getLong(5) == 12L)
    assert(out("fr").getLong(5) == 8L && out("es").getLong(5) == 4L)
    // the head language is downsampled, the tail language boosted
    assert(out("en").getLong(6) < 1000000L)
    assert(out("es").getLong(6) == 4000000L)
  }
}
